"""Game mutators (gravity, masses, boost, demo rules, ...).

Mirrors RocketSim src/Sim/MutatorConfig/MutatorConfig.{h,cpp}: plain data with
per-game-mode defaults. A MutatorConfig is static per arena batch — values are
baked into the jitted step as compile-time constants.
"""

import dataclasses
import enum

from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim.constants import GameMode


class DemoMode(enum.IntEnum):
    NORMAL = 0
    ON_CONTACT = 1
    DISABLED = 2


@dataclasses.dataclass(frozen=True)
class MutatorConfig:
    gravity: tuple = (0.0, 0.0, C.GRAVITY_Z)

    car_mass: float = C.CAR_MASS_BT
    car_world_friction: float = C.CARWORLD_COLLISION_FRICTION
    car_world_restitution: float = C.CARWORLD_COLLISION_RESTITUTION

    ball_mass: float = C.BALL_MASS_BT
    ball_max_speed: float = C.BALL_MAX_SPEED
    ball_drag: float = C.BALL_DRAG
    ball_world_friction: float = C.BALL_FRICTION
    ball_world_restitution: float = C.BALL_RESTITUTION

    jump_accel: float = C.JUMP_ACCEL
    jump_immediate_force: float = C.JUMP_IMMEDIATE_FORCE

    boost_accel_ground: float = C.BOOST_ACCEL_GROUND
    boost_accel_air: float = C.BOOST_ACCEL_AIR
    boost_used_per_second: float = C.BOOST_USED_PER_SECOND

    respawn_delay: float = C.DEMO_RESPAWN_TIME
    bump_cooldown_time: float = C.BUMP_COOLDOWN_TIME

    boost_pad_cooldown_big: float = C.BoostPads.COOLDOWN_BIG
    boost_pad_cooldown_small: float = C.BoostPads.COOLDOWN_SMALL

    car_spawn_boost_amount: float = C.BOOST_SPAWN_AMOUNT

    ball_hit_extra_force_scale: float = 1.0
    bump_force_scale: float = 1.0

    ball_radius: float = C.BALL_COLLISION_RADIUS_SOCCAR

    unlimited_flips: bool = False
    unlimited_double_jumps: bool = False

    demo_mode: DemoMode = DemoMode.NORMAL
    enable_team_demos: bool = False

    goal_base_threshold_y: float = C.SOCCAR_GOAL_SCORE_BASE_THRESHOLD_Y

    @staticmethod
    def for_game_mode(game_mode: GameMode) -> "MutatorConfig":
        # MutatorConfig.cpp:5-34
        kwargs = {}
        if game_mode == GameMode.HOOPS:
            kwargs["ball_radius"] = C.BALL_COLLISION_RADIUS_HOOPS
        elif game_mode == GameMode.SNOWDAY:
            kwargs.update(
                ball_radius=C.Snowday.PUCK_RADIUS,
                ball_world_friction=C.Snowday.PUCK_FRICTION,
                ball_world_restitution=C.Snowday.PUCK_RESTITUTION,
                ball_mass=C.Snowday.PUCK_MASS_BT,
            )
        if game_mode == GameMode.HEATSEEKER:
            kwargs.update(car_spawn_boost_amount=100.0, boost_used_per_second=0.0)
        return MutatorConfig(**kwargs)
