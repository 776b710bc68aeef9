"""Structure-of-arrays simulation state.

The reference holds one heap-allocated object graph per arena
(Arena -> Car -> btVehicleRL -> bullet bodies). Here an entire *batch* of
arenas is one pytree of arrays: every CarState field from the reference
(RocketSim src/Sim/Car/Car.h:17-115) becomes an array with leading axes
`[..., P]` (env batch, then player slot), ball/pad state likewise. The whole
batch steps in lockstep inside jitted code — no objects, no mutexes.

All shapes are static; resets and demos are masked writes.
"""

import jax.numpy as jnp
from flax import struct

from rlgymppo_cpp_tpu.sim import constants as C


def _f(shape, fill=0.0):
    return jnp.full(shape, fill, dtype=jnp.float32)


def _b(shape, fill=False):
    return jnp.full(shape, fill, dtype=jnp.bool_)


def _i(shape, fill=0):
    return jnp.full(shape, fill, dtype=jnp.int32)


def _v3(shape, fill=(0.0, 0.0, 0.0)):
    # no .copy(): jax arrays are immutable anyway, and Mosaic (Pallas TPU)
    # has no lowering for the copy primitive
    return jnp.broadcast_to(jnp.asarray(fill, dtype=jnp.float32), (*shape, 3))


def _eye3(shape):
    return jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (*shape, 3, 3))


@struct.dataclass
class CarControls:
    """Driver inputs (RocketSim src/Sim/CarControls.h)."""
    throttle: jnp.ndarray
    steer: jnp.ndarray
    pitch: jnp.ndarray
    yaw: jnp.ndarray
    roll: jnp.ndarray
    jump: jnp.ndarray       # bool
    boost: jnp.ndarray      # bool
    handbrake: jnp.ndarray  # bool

    @staticmethod
    def zeros(shape):
        return CarControls(
            throttle=_f(shape), steer=_f(shape), pitch=_f(shape),
            yaw=_f(shape), roll=_f(shape),
            jump=_b(shape), boost=_b(shape), handbrake=_b(shape),
        )

    def clamped(self):
        """ClampFix of analog inputs to [-1, 1] (CarControls.h)."""
        return self.replace(
            throttle=jnp.clip(self.throttle, -1, 1),
            steer=jnp.clip(self.steer, -1, 1),
            pitch=jnp.clip(self.pitch, -1, 1),
            yaw=jnp.clip(self.yaw, -1, 1),
            roll=jnp.clip(self.roll, -1, 1),
        )


@struct.dataclass
class BallHitInfo:
    """Last ball touch per car (RocketSim src/Sim/BallHitInfo/BallHitInfo.h)."""
    is_valid: jnp.ndarray             # bool
    relative_pos_on_ball: jnp.ndarray  # [..., 3]
    ball_pos: jnp.ndarray              # [..., 3]
    extra_hit_vel: jnp.ndarray         # [..., 3]
    tick_count_when_hit: jnp.ndarray          # int32
    tick_count_when_extra_impulse_applied: jnp.ndarray  # int32

    @staticmethod
    def zeros(shape):
        return BallHitInfo(
            is_valid=_b(shape),
            relative_pos_on_ball=_v3(shape),
            ball_pos=_v3(shape),
            extra_hit_vel=_v3(shape),
            tick_count_when_hit=_i(shape, -1 << 30),
            tick_count_when_extra_impulse_applied=_i(shape, -1 << 30),
        )


@struct.dataclass
class CarState:
    """All per-car dynamic state (CarState fields, Car.h:17-115)."""
    pos: jnp.ndarray       # [..., 3]
    rot: jnp.ndarray       # [..., 3, 3] columns = forward/right/up
    vel: jnp.ndarray       # [..., 3]
    ang_vel: jnp.ndarray   # [..., 3]

    is_on_ground: jnp.ndarray          # bool
    wheels_with_contact: jnp.ndarray   # [..., 4] bool
    has_jumped: jnp.ndarray            # bool
    has_double_jumped: jnp.ndarray     # bool
    has_flipped: jnp.ndarray           # bool
    flip_rel_torque: jnp.ndarray       # [..., 3]
    jump_time: jnp.ndarray
    flip_time: jnp.ndarray
    is_flipping: jnp.ndarray           # bool
    is_jumping: jnp.ndarray            # bool
    air_time: jnp.ndarray
    air_time_since_jump: jnp.ndarray
    boost: jnp.ndarray
    time_spent_boosting: jnp.ndarray
    is_supersonic: jnp.ndarray         # bool
    supersonic_time: jnp.ndarray
    handbrake_val: jnp.ndarray
    is_auto_flipping: jnp.ndarray      # bool
    auto_flip_timer: jnp.ndarray
    auto_flip_torque_scale: jnp.ndarray

    has_world_contact: jnp.ndarray     # bool
    world_contact_normal: jnp.ndarray  # [..., 3]

    car_contact_other_idx: jnp.ndarray      # int32 player slot, -1 = none
    car_contact_cooldown_timer: jnp.ndarray

    is_demoed: jnp.ndarray             # bool
    demo_respawn_timer: jnp.ndarray

    ball_hit_info: BallHitInfo
    last_controls: CarControls

    @staticmethod
    def zeros(shape, boost=C.BOOST_SPAWN_AMOUNT):
        pos = _v3(shape, (0.0, 0.0, C.CAR_SPAWN_REST_Z))
        return CarState(
            pos=pos, rot=_eye3(shape), vel=_v3(shape), ang_vel=_v3(shape),
            is_on_ground=_b(shape, True),
            wheels_with_contact=_b((*shape, 4)),
            has_jumped=_b(shape), has_double_jumped=_b(shape),
            has_flipped=_b(shape), flip_rel_torque=_v3(shape),
            jump_time=_f(shape), flip_time=_f(shape),
            is_flipping=_b(shape), is_jumping=_b(shape),
            air_time=_f(shape), air_time_since_jump=_f(shape),
            boost=_f(shape, boost), time_spent_boosting=_f(shape),
            is_supersonic=_b(shape), supersonic_time=_f(shape),
            handbrake_val=_f(shape),
            is_auto_flipping=_b(shape), auto_flip_timer=_f(shape),
            auto_flip_torque_scale=_f(shape),
            has_world_contact=_b(shape), world_contact_normal=_v3(shape),
            car_contact_other_idx=_i(shape, -1),
            car_contact_cooldown_timer=_f(shape),
            is_demoed=_b(shape), demo_respawn_timer=_f(shape),
            ball_hit_info=BallHitInfo.zeros(shape),
            last_controls=CarControls.zeros(shape),
        )

    @property
    def forward(self):
        return self.rot[..., :, 0]

    @property
    def right(self):
        return self.rot[..., :, 1]

    @property
    def up(self):
        return self.rot[..., :, 2]


@struct.dataclass
class HeatseekerInfo:
    """Ball homing state (BallState::HeatseekerInfo, Ball.h)."""
    y_target_dir: jnp.ndarray      # 0 = no target, +-1 = goal side
    cur_target_speed: jnp.ndarray
    time_since_hit: jnp.ndarray

    @staticmethod
    def zeros(shape):
        return HeatseekerInfo(
            y_target_dir=_f(shape),
            cur_target_speed=_f(shape, C.Heatseeker.INITIAL_TARGET_SPEED),
            time_since_hit=_f(shape),
        )


@struct.dataclass
class BallState:
    pos: jnp.ndarray       # [..., 3]
    rot: jnp.ndarray       # [..., 3, 3]
    vel: jnp.ndarray
    ang_vel: jnp.ndarray
    hs_info: HeatseekerInfo

    @staticmethod
    def zeros(shape, rest_z=C.BALL_REST_Z):
        return BallState(
            pos=_v3(shape, (0.0, 0.0, rest_z)),
            rot=_eye3(shape),
            vel=_v3(shape), ang_vel=_v3(shape),
            hs_info=HeatseekerInfo.zeros(shape),
        )


@struct.dataclass
class PadState:
    """Boost pad state over the fixed pad table (BoostPad.h)."""
    cooldown: jnp.ndarray         # [..., NPADS]
    is_active: jnp.ndarray        # [..., NPADS] bool
    cur_locked_car: jnp.ndarray   # [..., NPADS] int32 slot, -1 = none
    prev_locked_car: jnp.ndarray  # [..., NPADS] int32 slot, -1 = none

    @staticmethod
    def zeros(shape, num_pads):
        s = (*shape, num_pads)
        return PadState(
            cooldown=_f(s), is_active=_b(s, True),
            cur_locked_car=_i(s, -1), prev_locked_car=_i(s, -1),
        )


@struct.dataclass
class WheelsState:
    """Per-car wheel control values carried across ticks (btWheelInfoRL).

    The reference computes these in Car::_UpdateWheels each tick but consumes
    them in the *next* tick's friction-impulse calculation
    (updateVehicleFirst runs before _UpdateWheels; btVehicleRL.cpp:218-235,
    Car.cpp:89-109), so they are real simulation state.
    """
    steer_angle: jnp.ndarray      # [...] front-wheel steer (back is 0)
    engine_force: jnp.ndarray     # [...] same for all 4 wheels
    brake: jnp.ndarray            # [...]
    lat_friction: jnp.ndarray     # [..., 4]
    long_friction: jnp.ndarray    # [..., 4]

    @staticmethod
    def zeros(shape):
        return WheelsState(
            steer_angle=_f(shape),
            engine_force=_f(shape),
            brake=_f(shape),
            lat_friction=_f((*shape, 4)),
            long_friction=_f((*shape, 4)),
        )


@struct.dataclass
class ArenaState:
    """Complete dynamic state of a batch of arenas."""
    ball: BallState
    cars: CarState          # fields have a trailing player axis P
    wheels: WheelsState     # fields have a trailing player axis P
    pads: PadState
    tick_count: jnp.ndarray  # [...] int32

    @property
    def batch_shape(self):
        return self.tick_count.shape

    @property
    def num_players(self):
        return self.cars.boost.shape[-1]

    @staticmethod
    def zeros(batch_shape, num_players, num_pads,
              boost=C.BOOST_SPAWN_AMOUNT, ball_rest_z=C.BALL_REST_Z):
        return ArenaState(
            ball=BallState.zeros(batch_shape, rest_z=ball_rest_z),
            cars=CarState.zeros((*batch_shape, num_players), boost=boost),
            wheels=WheelsState.zeros((*batch_shape, num_players)),
            pads=PadState.zeros(batch_shape, num_pads),
            tick_count=_i(batch_shape),
        )
