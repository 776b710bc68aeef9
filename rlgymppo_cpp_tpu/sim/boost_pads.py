"""Boost pads as fixed-table vectorized tests.

The reference keeps one BoostPad object per pad with a spatial hash so each
car tests 9 cells (BoostPadGrid.cpp:5-25); on TPU every car tests every pad
densely — [P, 34] comparisons are cheaper than any gather. Semantics follow
BoostPad.cpp:37-105: a car first locks a pad via a cylinder test around the
pad origin, then stays locked via a (larger) AABB test while it remains the
previous locked car.
"""

import numpy as np
import jax.numpy as jnp

from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim.constants import GameMode
from rlgymppo_cpp_tpu.sim.state import PadState


def pad_table(game_mode: GameMode):
    """Static pad arrays: positions [NPADS, 3], is_big [NPADS].

    Big pads first then small, matching arena construction order
    (Arena.cpp:540-551).
    """
    bp = C.BoostPads
    if game_mode == GameMode.HOOPS:
        big, small = bp.LOCS_BIG_HOOPS, bp.LOCS_SMALL_HOOPS
    else:
        big, small = bp.LOCS_BIG_SOCCAR, bp.LOCS_SMALL_SOCCAR
    pos = np.concatenate([big, small], axis=0)
    is_big = np.concatenate([
        np.ones(len(big), dtype=bool), np.zeros(len(small), dtype=bool)])
    return jnp.asarray(pos), jnp.asarray(is_big)


def pads_pre_tick(pads: PadState, dt):
    """BoostPad::_PreTickUpdate (BoostPad.cpp:51-60)."""
    cooldown = jnp.maximum(pads.cooldown - dt, 0.0)
    return pads.replace(
        cooldown=cooldown,
        is_active=cooldown == 0.0,
        cur_locked_car=jnp.full_like(pads.cur_locked_car, -1),
    )


def pads_check_collide(pads: PadState, cars, active, pad_pos, pad_is_big,
                       half_extents, offset):
    """BoostPad::_CheckCollide for all cars x pads (BoostPad.cpp:62-86).

    `half_extents`/`offset` describe the (margin-inflated) hitbox for the
    AABB re-lock test. Returns pads with cur_locked_car set.
    """
    # [.., P, NPADS] geometry
    car_pos = cars.pos[..., :, None, :]
    pp = pad_pos  # [NPADS, 3]

    # Cylinder test around the pad origin
    cyl_rad = jnp.where(pad_is_big, C.BoostPads.CYL_RAD_BIG,
                        C.BoostPads.CYL_RAD_SMALL)
    d2 = jnp.sum((car_pos[..., :2] - pp[..., :2]) ** 2, axis=-1)
    dz = jnp.abs(car_pos[..., 2] - pp[..., 2])
    cyl_hit = (d2 < cyl_rad ** 2) & (dz < C.BoostPads.CYL_HEIGHT)

    # AABB test for the previously locked car: pad box vs car AABB
    box_rad = jnp.where(pad_is_big, C.BoostPads.BOX_RAD_BIG,
                        C.BoostPads.BOX_RAD_SMALL)
    box_min = pp + jnp.stack([-box_rad, -box_rad, jnp.zeros_like(box_rad)],
                             axis=-1)
    box_max = pp + jnp.stack([box_rad, box_rad,
                              jnp.full_like(box_rad, C.BoostPads.BOX_HEIGHT)],
                             axis=-1)
    # Car world AABB from the rotated hitbox: center + |R| @ half
    center = cars.pos + jnp.einsum("...ij,j->...i", cars.rot,
                                   jnp.asarray(offset, jnp.float32))
    world_half = jnp.einsum("...ij,j->...i", jnp.abs(cars.rot),
                            jnp.asarray(half_extents, jnp.float32))
    car_min = (center - world_half)[..., :, None, :]
    car_max = (center + world_half)[..., :, None, :]
    aabb_hit = jnp.all((box_max > car_min) & (box_min < car_max), axis=-1)

    P = cars.boost.shape[-1]
    idx = jnp.arange(P, dtype=jnp.int32)
    was_locked = pads.prev_locked_car[..., None, :] == idx[:, None]  # [.., P, NPADS]
    colliding = jnp.where(was_locked, aabb_hit, cyl_hit) & active[..., None]

    # Last colliding car wins, like the reference's iteration order
    locked = jnp.max(jnp.where(colliding, idx[:, None], -1), axis=-2)
    return pads.replace(cur_locked_car=locked.astype(jnp.int32))


def pads_post_tick(pads: PadState, car_boost, mut, pad_is_big):
    """BoostPad::_PostTickUpdate (BoostPad.cpp:88-105).

    Returns (pads', car_boost', pickup_events [.., P, NPADS]).
    """
    locked = pads.cur_locked_car >= 0
    grant = locked & pads.is_active
    amount = jnp.where(pad_is_big, C.BoostPads.BOOST_AMOUNT_BIG,
                       C.BoostPads.BOOST_AMOUNT_SMALL)

    P = car_boost.shape[-1]
    idx = jnp.arange(P, dtype=jnp.int32)
    pickup = grant[..., None, :] & (pads.cur_locked_car[..., None, :]
                                    == idx[:, None])  # [.., P, NPADS]
    boost_add = jnp.sum(jnp.where(pickup, amount, 0.0), axis=-1)
    car_boost = jnp.minimum(car_boost + boost_add, C.BOOST_MAX)

    cooldown = jnp.where(
        grant,
        jnp.where(pad_is_big, mut.boost_pad_cooldown_big,
                  mut.boost_pad_cooldown_small),
        pads.cooldown)
    return pads.replace(
        cooldown=cooldown,
        is_active=pads.is_active & ~grant,
        prev_locked_car=pads.cur_locked_car,
    ), car_boost, pickup
