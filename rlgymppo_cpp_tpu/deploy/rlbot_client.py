"""RLBot deployment: play a trained policy in the real game.

Equivalent of the reference's RLBotClient.{h,cpp}: converts the RLBot
GameTickPacket into a GameState shim (ToGameState, RLBotClient.cpp:75-103),
repeats each action for tick_skip ticks with the 1-tick inference offset
(GetOutput, :105-146 — the next action is inferred one tick after the
current one is applied, hiding inference latency), and drives an InferUnit
deterministically.

The rlbot Python framework is an optional dependency: `RLBotBot` is a
plain class duck-typed to its BaseAgent interface, and `run_bot` raises a
clear error if rlbot isn't installed. `packet_to_game_state` accepts any
object exposing the GameTickPacket attribute layout, so it is testable
with a synthetic packet.
"""

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp

from rlgymppo_cpp_tpu.gym.gamestate import GameState
from rlgymppo_cpp_tpu.maths.rot import euler_to_rotmat
from rlgymppo_cpp_tpu.learn.infer_unit import InferUnit

BOOST_LOCATIONS_AMOUNT = 34


@dataclasses.dataclass
class RLBotParams:
    """RLBotClient.h:9-20."""
    port: int = 23234
    obs_builder: object = None
    action_parser: object = None
    checkpoint_path: str = "checkpoints"
    obs_size: int = 89
    policy_layer_sizes: Sequence[int] = (256, 256, 256)
    tick_skip: int = 8
    deterministic: bool = True


def _vec(v):
    return np.asarray([v.x, v.y, v.z], np.float32)


def _phys(phys):
    """rlbot Physics -> (pos, rot, vel, ang_vel)."""
    pos = _vec(phys.location)
    rot = euler_to_rotmat(jnp.float32(phys.rotation.yaw),
                          jnp.float32(phys.rotation.pitch),
                          jnp.float32(phys.rotation.roll))
    vel = _vec(phys.velocity)
    ang_vel = _vec(phys.angular_velocity)
    return pos, np.asarray(rot), vel, ang_vel


def packet_to_game_state(packet) -> GameState:
    """ToGameState (RLBotClient.cpp:75-103): batched [1, P] GameState from
    a GameTickPacket-shaped object. Match counters are zero (unknown in a
    live game); malformed pad counts degrade to all-active like the
    reference."""
    P = int(packet.num_cars)
    car_pos = np.zeros((1, P, 3), np.float32)
    car_rot = np.zeros((1, P, 3, 3), np.float32)
    car_vel = np.zeros((1, P, 3), np.float32)
    car_ang = np.zeros((1, P, 3), np.float32)
    boost = np.zeros((1, P), np.float32)
    on_ground = np.zeros((1, P), bool)
    demoed = np.zeros((1, P), bool)
    has_jump = np.zeros((1, P), bool)
    has_flip = np.zeros((1, P), bool)

    for i in range(P):
        car = packet.game_cars[i]
        pos, rot, vel, ang = _phys(car.physics)
        car_pos[0, i], car_rot[0, i] = pos, rot
        car_vel[0, i], car_ang[0, i] = vel, ang
        boost[0, i] = car.boost / 100.0
        on_ground[0, i] = bool(car.has_wheel_contact)
        demoed[0, i] = bool(car.is_demolished)
        has_jump[0, i] = not bool(car.jumped)
        has_flip[0, i] = not bool(car.double_jumped)

    ball_pos, _, ball_vel, ball_ang = _phys(packet.game_ball.physics)

    n_pads = int(getattr(packet, "num_boost", 0))
    pads = np.ones((1, BOOST_LOCATIONS_AMOUNT), bool)
    if n_pads == BOOST_LOCATIONS_AMOUNT:
        for i in range(BOOST_LOCATIONS_AMOUNT):
            pads[0, i] = bool(packet.game_boosts[i].is_active)

    zero_i = np.zeros((1, P), np.int32)
    return GameState(
        ball_pos=jnp.asarray(ball_pos)[None],
        ball_vel=jnp.asarray(ball_vel)[None],
        ball_ang_vel=jnp.asarray(ball_ang)[None],
        car_pos=jnp.asarray(car_pos), car_rot=jnp.asarray(car_rot),
        car_vel=jnp.asarray(car_vel), car_ang_vel=jnp.asarray(car_ang),
        boost_fraction=jnp.asarray(boost),
        is_on_ground=jnp.asarray(on_ground),
        is_demoed=jnp.asarray(demoed),
        has_jump=jnp.asarray(has_jump), has_flip=jnp.asarray(has_flip),
        ball_touched_step=jnp.zeros((1, P), bool),
        ball_touched_tick=jnp.zeros((1, P), bool),
        match_goals=zero_i, match_saves=zero_i, match_assists=zero_i,
        match_shots=zero_i, match_shot_passes=zero_i, match_bumps=zero_i,
        match_demos=zero_i, boost_pickups=zero_i,
        pads_active=jnp.asarray(pads),
        pad_timers=jnp.zeros((1, BOOST_LOCATIONS_AMOUNT), jnp.float32),
        score_line=jnp.zeros((1, 2), jnp.int32),
        last_touch_idx=jnp.full((1,), -1, jnp.int32),
    )


class RLBotBot:
    """Duck-typed rlbot BaseAgent (RLBotBot, RLBotClient.cpp:17-146)."""

    def __init__(self, name, team, index, params: RLBotParams):
        self.name = name
        self.team = team
        self.index = index
        self.params = params
        self.infer_unit = None
        self.ticks = -1
        self.prev_time = 0.0
        self.update_action = True
        self.action = np.zeros(8, np.float32)
        self.controls = np.zeros(8, np.float32)
        self.prev_action = np.zeros(8, np.float32)

    def initialize_agent(self, teams):
        import os
        from rlgymppo_cpp_tpu.utils import checkpoint as ckpt
        path = self.params.checkpoint_path
        if ckpt.find_newest_checkpoint(path) or (
                path and os.path.exists(
                    os.path.join(path, "TRAIN_STATE.npz"))):
            self.infer_unit = InferUnit.from_checkpoint(
                path, self.params.obs_builder,
                self.params.action_parser, self.params.obs_size,
                teams=teams)
        else:
            # no trained checkpoint: random-init policy (mock/smoke runs)
            import jax
            print(f"RLBotBot: WARNING no checkpoint at {path!r}; using a "
                  "randomly initialized policy")
            self.infer_unit = InferUnit(
                self.params.obs_builder, self.params.action_parser,
                self.params.obs_size, teams,
                layer_sizes=self.params.policy_layer_sizes)
            self.infer_unit.policy_params = self.infer_unit.policy.init(
                jax.random.PRNGKey(0))

    def get_output(self, packet):
        """GetOutput (RLBotClient.cpp:105-146): tick-skip action repeat
        with a 1-tick inference offset. Returns the 8-float action row
        (throttle, steer, pitch, yaw, roll, jump, boost, handbrake)."""
        cur_time = packet.game_info.seconds_elapsed
        ticks_elapsed = round((cur_time - self.prev_time) * 120)
        self.prev_time = cur_time
        self.ticks += ticks_elapsed

        gs = packet_to_game_state(packet)
        if self.infer_unit is None:
            teams = [int(packet.game_cars[i].team)
                     for i in range(packet.num_cars)]
            self.initialize_agent(teams)

        if self.update_action:
            self.update_action = False
            P = int(packet.num_cars)
            prev = jnp.broadcast_to(jnp.asarray(self.prev_action),
                                    (1, P, 8))
            _, vec = self.infer_unit.infer_policy_single(
                gs, self.index, prev,
                deterministic=self.params.deterministic)
            self.action = np.asarray(vec)[0]

        if self.ticks >= self.params.tick_skip or self.ticks == -1:
            self.prev_action = self.controls
            self.controls = self.action
            self.ticks = 0
            self.update_action = True

        return self.controls


def run_bot(params: RLBotParams):
    """RLBotClient::Run (RLBotClient.cpp:148-157): serve actions on a
    localhost socket for any game-side client. For a full rlbot-framework
    match launch use `python -m rlgymppo_cpp_tpu.deploy launch` (the
    bundled deploy/rlbot/ harness mirrors the reference's rlbot/)."""
    from rlgymppo_cpp_tpu.deploy.bot_server import BotServer
    server = BotServer(params)
    print(f"RLBot bot server on 127.0.0.1:{params.port}")
    server.serve_forever()
