"""Env-last core mirror of the public simulation state.

Public state (sim/state.py) keeps the reference-friendly [batch, P, ...]
AoS layout that tests, gym code, and state setters use. The physics core
runs on this mirror instead: same field names, but scalars are [P, N],
vectors are V3 of [P, N], rotations are M3, wheels carry a LEADING 4-axis
([4, P, N]) and pads a leading pad axis — so the big env axis N always sits
on the TPU's 128-wide lane dimension (see maths/v3.py for the rationale).

Conversion is schema-driven and happens once per Arena.step (8 ticks), not
per tick; its cost is the logical state size (~KBs/env), negligible next to
the tick math.
"""

import jax
import jax.numpy as jnp
from flax import struct

from rlgymppo_cpp_tpu.maths.v3 import (
    V3, M3, to_core, from_core, v3_to_core, v3_from_core, m3_to_core,
    m3_from_core,
)
from rlgymppo_cpp_tpu.sim import state as S

# Field schemas: s = scalar array (all non-batch axes reversed),
# v = V3, m = M3, or a nested (cls, schema) pair.
CONTROLS_SCHEMA = {k: "s" for k in (
    "throttle", "steer", "pitch", "yaw", "roll", "jump", "boost",
    "handbrake")}
BHI_SCHEMA = {
    "is_valid": "s", "relative_pos_on_ball": "v", "ball_pos": "v",
    "extra_hit_vel": "v", "tick_count_when_hit": "s",
    "tick_count_when_extra_impulse_applied": "s",
}
CAR_SCHEMA = {
    "pos": "v", "rot": "m", "vel": "v", "ang_vel": "v",
    "is_on_ground": "s", "wheels_with_contact": "s",
    "has_jumped": "s", "has_double_jumped": "s", "has_flipped": "s",
    "flip_rel_torque": "v", "jump_time": "s", "flip_time": "s",
    "is_flipping": "s", "is_jumping": "s",
    "air_time": "s", "air_time_since_jump": "s",
    "boost": "s", "time_spent_boosting": "s",
    "is_supersonic": "s", "supersonic_time": "s", "handbrake_val": "s",
    "is_auto_flipping": "s", "auto_flip_timer": "s",
    "auto_flip_torque_scale": "s",
    "has_world_contact": "s", "world_contact_normal": "v",
    "car_contact_other_idx": "s", "car_contact_cooldown_timer": "s",
    "is_demoed": "s", "demo_respawn_timer": "s",
    "ball_hit_info": BHI_SCHEMA, "last_controls": CONTROLS_SCHEMA,
}
HS_SCHEMA = {"y_target_dir": "s", "cur_target_speed": "s",
             "time_since_hit": "s"}
BALL_SCHEMA = {"pos": "v", "rot": "m", "vel": "v", "ang_vel": "v",
               "hs_info": HS_SCHEMA}
PAD_SCHEMA = {"cooldown": "s", "is_active": "s", "cur_locked_car": "s",
              "prev_locked_car": "s"}
WHEELS_SCHEMA = {"steer_angle": "s", "engine_force": "s", "brake": "s",
                 "lat_friction": "s", "long_friction": "s"}


class CoreView(dict):
    """Attribute-style dict holding a struct's core-layout fields."""

    __getattr__ = dict.__getitem__

    def replace(self, **kw):
        out = CoreView(self)
        out.update(kw)
        return out


def _coreview_flatten(d):
    keys = sorted(d.keys())
    return [d[k] for k in keys], tuple(keys)


def _coreview_unflatten(keys, vals):
    return CoreView(zip(keys, vals))


jax.tree_util.register_pytree_node(
    CoreView, _coreview_flatten, _coreview_unflatten)


def struct_to_core(obj, schema, batch_ndim):
    out = CoreView()
    for name, kind in schema.items():
        val = getattr(obj, name)
        if isinstance(kind, dict):
            out[name] = struct_to_core(val, kind, batch_ndim)
        elif kind == "v":
            out[name] = v3_to_core(val, batch_ndim)
        elif kind == "m":
            out[name] = m3_to_core(val, batch_ndim)
        else:
            out[name] = to_core(val, batch_ndim)
    return out


def struct_from_core(cls, core, schema, batch_shape):
    kw = {}
    for name, kind in schema.items():
        val = core[name]
        if isinstance(kind, dict):
            kw[name] = _nested_from_core(name, val, kind, batch_shape)
        elif kind == "v":
            kw[name] = v3_from_core(val, batch_shape)
        elif kind == "m":
            kw[name] = m3_from_core(val, batch_shape)
        else:
            kw[name] = from_core(val, batch_shape)
    return cls(**kw)


_NESTED_CLS = {
    "ball_hit_info": (S.BallHitInfo, BHI_SCHEMA),
    "last_controls": (S.CarControls, CONTROLS_SCHEMA),
    "hs_info": (S.HeatseekerInfo, HS_SCHEMA),
}


def _nested_from_core(name, core, schema, batch_shape):
    cls, sch = _NESTED_CLS[name]
    return struct_from_core(cls, core, sch, batch_shape)


def controls_to_core(controls: S.CarControls, batch_ndim=1):
    return struct_to_core(controls, CONTROLS_SCHEMA, batch_ndim)


def arena_state_to_core(state: S.ArenaState):
    """ArenaState [B..., ...] -> dict of core views (+ batch bookkeeping)."""
    bn = len(state.batch_shape)
    return CoreView(
        ball=struct_to_core(state.ball, BALL_SCHEMA, bn),
        cars=struct_to_core(state.cars, CAR_SCHEMA, bn),
        wheels=struct_to_core(state.wheels, WHEELS_SCHEMA, bn),
        pads=struct_to_core(state.pads, PAD_SCHEMA, bn),
        tick_count=to_core(state.tick_count, bn),
    )


def arena_state_from_core(core, batch_shape) -> S.ArenaState:
    return S.ArenaState(
        ball=struct_from_core(S.BallState, core.ball, BALL_SCHEMA,
                              batch_shape),
        cars=struct_from_core(S.CarState, core.cars, CAR_SCHEMA,
                              batch_shape),
        wheels=struct_from_core(S.WheelsState, core.wheels, WHEELS_SCHEMA,
                                batch_shape),
        pads=struct_from_core(S.PadState, core.pads, PAD_SCHEMA,
                              batch_shape),
        tick_count=from_core(core.tick_count, batch_shape),
    )
