"""Rigid-body impulse math on the env-last component core (V3/M3).

Same formulas as sim/rigidbody.py (bullet's btContactConstraint /
btSequentialImpulseConstraintSolver as modified by RocketSim), re-expressed
component-wise so every op is a fully-lane-packed [aux..., P, N] VPU op.
Inverse inertia is applied functionally (R diag R^T v) instead of
materializing [3, 3] world tensors.
"""

import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths.v3 import V3, M3, vwhere, rodrigues

ERP = 0.2
ERP2 = 0.8
RESTITUTION_VELOCITY_THRESHOLD = 0.2 * 50.0


def box_inv_inertia_diag(mass, half_extents):
    hx, hy, hz = [float(h) for h in half_extents]
    lx, ly, lz = 2 * hx, 2 * hy, 2 * hz
    ix = mass / 12.0 * (ly * ly + lz * lz)
    iy = mass / 12.0 * (lx * lx + lz * lz)
    iz = mass / 12.0 * (lx * lx + ly * ly)
    return (1.0 / ix, 1.0 / iy, 1.0 / iz)


def sphere_inv_inertia_scalar(mass, radius):
    return 1.0 / (0.4 * mass * radius * radius)


def make_box_ii(rot: M3, diag):
    """Returns fn(V3)->V3 applying the world inverse inertia of a box with
    local diag `diag` rotated by `rot` (R diag R^T v)."""
    dx, dy, dz = diag

    def apply(v: V3) -> V3:
        loc = rot.tmv(v)
        return rot.mv(V3(loc.x * dx, loc.y * dy, loc.z * dz))

    return apply


def make_sphere_ii(scalar):
    def apply(v: V3) -> V3:
        return v * scalar
    return apply


def velocity_at_point(vel: V3, ang_vel: V3, rel_pos: V3) -> V3:
    return vel + ang_vel.cross(rel_pos)


def impulse_denominator(inv_mass, ii_apply, rel_pos: V3, normal: V3):
    r_cross_n = rel_pos.cross(normal)
    ang = ii_apply(r_cross_n)
    return inv_mass + ang.cross(rel_pos).dot(normal)


def contact_impulse_static(vel, ang_vel, inv_mass, ii_apply, rel_pos,
                           normal, penetration, restitution, friction, dt,
                           use_position_bias=True):
    """One contact vs the static world. Returns (dvel V3, dang V3, jn)."""
    v_contact = velocity_at_point(vel, ang_vel, rel_pos)
    vn = v_contact.dot(normal)

    bounce = jnp.where(-vn > RESTITUTION_VELOCITY_THRESHOLD,
                       restitution * -vn, 0.0)
    if use_position_bias:
        bias = ERP2 * jnp.maximum(penetration, 0.0) / dt
    else:
        bias = jnp.zeros_like(vn)

    denom_n = impulse_denominator(inv_mass, ii_apply, rel_pos, normal)
    jn = jnp.maximum((-vn + jnp.maximum(bounce, bias)) / denom_n, 0.0)

    dvel = normal * (jn * inv_mass)
    dang = ii_apply(rel_pos.cross(normal * jn))

    vt = v_contact - normal * vn
    vt_len = jnp.sqrt(jnp.maximum(vt.norm_sq(), 1e-12))
    t_dir = vt / vt_len
    denom_t = impulse_denominator(inv_mass, ii_apply, rel_pos, t_dir)
    jt = jnp.minimum(vt_len / denom_t, friction * jn)
    dvel = dvel - t_dir * (jt * inv_mass)
    dang = dang - ii_apply(rel_pos.cross(t_dir * jt))
    return dvel, dang, jn


def contact_impulse_pair(vel_a, ang_a, inv_mass_a, ii_a, rel_a,
                         vel_b, ang_b, inv_mass_b, ii_b, rel_b,
                         normal, penetration, restitution, friction, dt,
                         use_position_bias=False):
    """Two dynamic bodies; normal points B -> A.
    Returns (dvel_a, dang_a, dvel_b, dang_b, jn).

    No Baumgarte bias by default: the reference's solver config routes
    ALL penetration recovery through split impulse (positional,
    Arena.cpp:485-488) — velocity bias here made car-ball hits ~40%% too
    hot and car bumps explosive (caught by the golden traces)."""
    va = velocity_at_point(vel_a, ang_a, rel_a)
    vb = velocity_at_point(vel_b, ang_b, rel_b)
    v_rel = va - vb
    vn = v_rel.dot(normal)

    bounce = jnp.where(-vn > RESTITUTION_VELOCITY_THRESHOLD,
                       restitution * -vn, 0.0)
    if use_position_bias:
        bias = ERP2 * jnp.maximum(penetration, 0.0) / dt
    else:
        bias = jnp.zeros_like(vn)

    denom = (impulse_denominator(inv_mass_a, ii_a, rel_a, normal)
             + impulse_denominator(inv_mass_b, ii_b, rel_b, normal))
    jn = jnp.maximum((-vn + jnp.maximum(bounce, bias)) / denom, 0.0)
    imp = normal * jn

    vt = v_rel - normal * vn
    vt_len = jnp.sqrt(jnp.maximum(vt.norm_sq(), 1e-12))
    t_dir = vt / vt_len
    denom_t = (impulse_denominator(inv_mass_a, ii_a, rel_a, t_dir)
               + impulse_denominator(inv_mass_b, ii_b, rel_b, t_dir))
    jt = jnp.minimum(vt_len / denom_t, friction * jn)
    imp = imp - t_dir * jt

    dvel_a = imp * inv_mass_a
    dang_a = ii_a(rel_a.cross(imp))
    dvel_b = -imp * inv_mass_b
    dang_b = ii_b(rel_b.cross(-imp))
    return dvel_a, dang_a, dvel_b, dang_b, jn


def resolve_single_collision_impulse(vel, ang_vel, inv_mass, ii_apply,
                                     rel_pos, normal, distance, dt):
    v_contact = velocity_at_point(vel, ang_vel, rel_pos)
    rel_vel = v_contact.dot(normal)
    positional_error = ERP * -distance / dt
    velocity_error = -rel_vel
    denom = impulse_denominator(inv_mass, ii_apply, rel_pos, normal)
    return jnp.maximum((positional_error + velocity_error) / denom, 0.0)


def resolve_single_bilateral_impulse(vel, ang_vel, inv_mass, ii_apply,
                                     rel_pos, normal):
    v_contact = velocity_at_point(vel, ang_vel, rel_pos)
    rel_vel = v_contact.dot(normal)
    denom = impulse_denominator(inv_mass, ii_apply, rel_pos, normal)
    return -0.2 * rel_vel / denom


def integrate_rotation(rot: M3, ang_vel: V3, dt) -> M3:
    """Exponential-map rotation update + Gram-Schmidt (rigidbody.py
    integrate_rotation, component form: each column rotated by Rodrigues)."""
    w = ang_vel * dt
    angle = jnp.sqrt(jnp.maximum(w.norm_sq(), 1e-20))
    axis = w / angle

    f = rodrigues(axis, angle, rot.f)
    r = rodrigues(axis, angle, rot.r)

    f = f * (1.0 / jnp.sqrt(jnp.maximum(f.norm_sq(), 1e-12)))
    r = r - f * r.dot(f)
    r = r * (1.0 / jnp.sqrt(jnp.maximum(r.norm_sq(), 1e-12)))
    u = f.cross(r)
    return M3(f, r, u)
