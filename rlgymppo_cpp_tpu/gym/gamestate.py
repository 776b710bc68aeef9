"""Batched GameState: the per-step snapshot obs/reward/terminal code reads.

Mirrors RLGymSim_CPP's GameState/PlayerData/PhysObj
(src/RLGymSim_CPP/Utils/Gamestates/*) as one struct of arrays with leading
env batch axes; player fields carry a trailing P axis. "Inverted" views
(180-degree rotation for orange-team canonicalization, PhysObj.cpp:19-33)
are computed on demand via `invert_*`.
"""

import jax.numpy as jnp
import numpy as np
from flax import struct

from rlgymppo_cpp_tpu.sim import constants as C

_INV = np.array([-1.0, -1.0, 1.0], dtype=np.float32)


def invert_vec(v):
    return v * jnp.asarray(_INV)


def invert_rot(m):
    """Each column (forward/right/up) scaled by (-1,-1,1)."""
    return m * jnp.asarray(_INV)[..., :, None]


def mirror_x_vec(v):
    return v * jnp.asarray([-1.0, 1.0, 1.0])


@struct.dataclass
class GameState:
    """Snapshot after the action-delay tick (Gym.cpp:84-87)."""
    # Ball physics (world frame)
    ball_pos: jnp.ndarray       # [N, 3]
    ball_vel: jnp.ndarray
    ball_ang_vel: jnp.ndarray

    # Per-player physics
    car_pos: jnp.ndarray        # [N, P, 3]
    car_rot: jnp.ndarray        # [N, P, 3, 3]
    car_vel: jnp.ndarray
    car_ang_vel: jnp.ndarray

    # Per-player flags/stats (PlayerData.h)
    boost_fraction: jnp.ndarray   # [N, P]
    is_on_ground: jnp.ndarray
    is_demoed: jnp.ndarray
    has_jump: jnp.ndarray
    has_flip: jnp.ndarray
    ball_touched_step: jnp.ndarray  # touched during any tick of the step
    ball_touched_tick: jnp.ndarray  # touching on the final snapshot tick

    # Match counters (PlayerData.h:16-24)
    match_goals: jnp.ndarray
    match_saves: jnp.ndarray
    match_assists: jnp.ndarray
    match_shots: jnp.ndarray
    match_shot_passes: jnp.ndarray
    match_bumps: jnp.ndarray
    match_demos: jnp.ndarray
    boost_pickups: jnp.ndarray

    # Boost pads in canonical obs order (GameState.h)
    pads_active: jnp.ndarray    # [N, 34] bool
    pad_timers: jnp.ndarray     # [N, 34]

    score_line: jnp.ndarray     # [N, 2] goals per team
    last_touch_idx: jnp.ndarray  # [N] player slot of last toucher, -1 none


def make_game_state(arena, state, tick_skip, counters, score_line,
                    last_touch_idx, pad_index_map):
    """Build the snapshot from an ArenaState (GameState::UpdateFromArena,
    GameState.cpp:52-104). `counters` is a dict of per-player accumulators
    maintained by the Gym across a match."""
    cars = state.cars
    bhi = cars.ball_hit_info
    tick = state.tick_count[..., None]
    touched_step = bhi.is_valid & (bhi.tick_count_when_hit
                                   >= tick - tick_skip)
    touched_tick = bhi.is_valid & (bhi.tick_count_when_hit == tick - 1)

    has_jump = ~cars.has_jumped
    has_flip = (~cars.has_double_jumped & ~cars.has_flipped
                & (cars.air_time_since_jump < C.DOUBLEJUMP_MAX_DELAY))

    if arena.num_pads:
        # -1 slots = canonical positions with no arena pad (non-soccar
        # pad tables): permanently inactive, timer 0
        valid = pad_index_map >= 0
        idx = jnp.maximum(pad_index_map, 0)
        pads_active = state.pads.is_active[..., idx] & valid
        pad_timers = state.pads.cooldown[..., idx] * valid
    else:
        shape = (*state.batch_shape, 34)
        pads_active = jnp.ones(shape, bool)
        pad_timers = jnp.zeros(shape, jnp.float32)

    # last toucher: prefer the most recent tickCountWhenHit
    last_hit = jnp.where(bhi.is_valid, bhi.tick_count_when_hit, -1 << 30)
    best = jnp.argmax(last_hit, axis=-1)
    any_valid = jnp.any(bhi.is_valid, axis=-1)
    new_last_touch = jnp.where(any_valid, best.astype(jnp.int32),
                               last_touch_idx)

    return GameState(
        ball_pos=state.ball.pos, ball_vel=state.ball.vel,
        ball_ang_vel=state.ball.ang_vel,
        car_pos=cars.pos, car_rot=cars.rot, car_vel=cars.vel,
        car_ang_vel=cars.ang_vel,
        boost_fraction=cars.boost / 100.0,
        is_on_ground=cars.is_on_ground,
        is_demoed=cars.is_demoed,
        has_jump=has_jump, has_flip=has_flip,
        ball_touched_step=touched_step, ball_touched_tick=touched_tick,
        match_goals=counters["goals"], match_saves=counters["saves"],
        match_assists=counters["assists"], match_shots=counters["shots"],
        match_shot_passes=counters["shot_passes"],
        match_bumps=counters["bumps"], match_demos=counters["demos"],
        boost_pickups=counters["pickups"],
        pads_active=pads_active, pad_timers=pad_timers,
        score_line=score_line, last_touch_idx=new_last_touch,
    )
