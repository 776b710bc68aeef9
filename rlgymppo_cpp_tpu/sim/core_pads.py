"""Boost pads on the env-last component core (port of sim/boost_pads.py,
BoostPad.cpp:37-105). Pad-major arrays: [NPADS, N] per-pad state,
[NPADS, P, N] pad-vs-car tests."""

import numpy as np
import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths.v3 import V3
from rlgymppo_cpp_tpu.sim import constants as C


def make_core_pad_cfg(pad_pos, pad_is_big):
    """Static pad constants shaped [NPADS, 1, 1] for broadcasting."""
    pp = np.asarray(pad_pos)
    big = np.asarray(pad_is_big)
    cyl_rad = np.where(big, C.BoostPads.CYL_RAD_BIG, C.BoostPads.CYL_RAD_SMALL)
    box_rad = np.where(big, C.BoostPads.BOX_RAD_BIG, C.BoostPads.BOX_RAD_SMALL)
    amount = np.where(big, C.BoostPads.BOOST_AMOUNT_BIG,
                      C.BoostPads.BOOST_AMOUNT_SMALL)
    r = lambda a: jnp.asarray(a, jnp.float32).reshape(-1, 1, 1)
    return {
        "px": r(pp[:, 0]), "py": r(pp[:, 1]), "pz": r(pp[:, 2]),
        "cyl_rad_sq": r(cyl_rad ** 2),
        "box_rad": r(box_rad),
        "amount1": jnp.asarray(amount, jnp.float32).reshape(-1, 1),
        "is_big1": jnp.asarray(big).reshape(-1, 1),
    }


def pads_pre_tick(pads, dt):
    """BoostPad::_PreTickUpdate (BoostPad.cpp:51-60)."""
    cooldown = jnp.maximum(pads.cooldown - dt, 0.0)
    return pads.replace(
        cooldown=cooldown,
        is_active=cooldown == 0.0,
        cur_locked_car=jnp.full_like(pads.cur_locked_car, -1),
    )


def pads_check_collide(pads, cars, active, pcfg, half_extents, offset):
    """BoostPad::_CheckCollide (BoostPad.cpp:62-86); [NPADS, P, N] tests."""
    cx, cy, cz = cars.pos.x, cars.pos.y, cars.pos.z   # [P, N] -> bcast

    d2 = (cx - pcfg["px"]) ** 2 + (cy - pcfg["py"]) ** 2
    dz = jnp.abs(cz - pcfg["pz"])
    cyl_hit = (d2 < pcfg["cyl_rad_sq"]) & (dz < C.BoostPads.CYL_HEIGHT)

    # Car world AABB: center + |R| @ half
    rot = cars.rot
    off = V3.of(*[jnp.asarray(o, jnp.float32) for o in np.asarray(offset)])
    center = cars.pos + rot.mv(off)
    hx, hy, hz = [float(h) for h in np.asarray(half_extents)]
    wx = jnp.abs(rot.f.x) * hx + jnp.abs(rot.r.x) * hy + jnp.abs(rot.u.x) * hz
    wy = jnp.abs(rot.f.y) * hx + jnp.abs(rot.r.y) * hy + jnp.abs(rot.u.y) * hz
    wz = jnp.abs(rot.f.z) * hx + jnp.abs(rot.r.z) * hy + jnp.abs(rot.u.z) * hz

    box_rad = pcfg["box_rad"]
    aabb_hit = (
        (pcfg["px"] + box_rad > center.x - wx)
        & (pcfg["px"] - box_rad < center.x + wx)
        & (pcfg["py"] + box_rad > center.y - wy)
        & (pcfg["py"] - box_rad < center.y + wy)
        & (pcfg["pz"] + C.BoostPads.BOX_HEIGHT > center.z - wz)
        & (pcfg["pz"] < center.z + wz))

    P = cars.pos.x.shape[0]
    idx = jnp.arange(P, dtype=jnp.int32)[:, None]      # [P, 1]
    was_locked = pads.prev_locked_car[:, None, :] == idx  # [NPADS, P, N]
    colliding = jnp.where(was_locked, aabb_hit, cyl_hit) & active

    locked = jnp.max(jnp.where(colliding, idx, -1), axis=1)  # [NPADS, N]
    return pads.replace(cur_locked_car=locked.astype(jnp.int32))


def pads_post_tick(pads, car_boost, mut, pcfg):
    """BoostPad::_PostTickUpdate (BoostPad.cpp:88-105).
    Returns (pads', car_boost' [P, N], pickups [P, N] int32)."""
    locked = pads.cur_locked_car >= 0
    grant = locked & pads.is_active                    # [NPADS, N]

    P = car_boost.shape[0]
    idx = jnp.arange(P, dtype=jnp.int32)[:, None]
    pickup = grant[:, None, :] & (pads.cur_locked_car[:, None, :] == idx)
    boost_add = jnp.sum(
        jnp.where(pickup, pcfg["amount1"][:, :, None], 0.0), axis=0)
    car_boost = jnp.minimum(car_boost + boost_add, C.BOOST_MAX)
    pickups = jnp.sum(pickup.astype(jnp.int32), axis=0)

    cooldown = jnp.where(
        grant,
        jnp.where(pcfg["is_big1"], mut.boost_pad_cooldown_big,
                  mut.boost_pad_cooldown_small),
        pads.cooldown)
    return pads.replace(
        cooldown=cooldown,
        is_active=pads.is_active & ~grant,
        prev_locked_car=pads.cur_locked_car,
    ), car_boost, pickups
