"""Rigid-body impulse math shared by all contact types.

Replicates the handful of bullet solver formulas the reference relies on
(libsrc/bullet3-3.24/BulletDynamics/ConstraintSolver/btContactConstraint.cpp
and btSequentialImpulseConstraintSolver.cpp as modified by RocketSim), in UU
units and batched form. All functions broadcast over leading axes.

Conventions: `inv_inertia_world` is the world-space inverse inertia tensor
[..., 3, 3]; impulses change velocity immediately; forces accumulate and are
integrated with gravity.
"""

import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths.vec import dot, cross

# bullet solver defaults, in UU where unit-bearing (1 bt = 50 uu)
ERP = 0.2                     # btContactSolverInfo::m_erp
ERP2 = 0.8                    # set by Arena.cpp:487 for RL-era bullet
RESTITUTION_VELOCITY_THRESHOLD = 0.2 * 50.0  # bullet default 0.2 bt/s


def box_inv_inertia_local(mass, half_extents):
    """Inverse inertia diag of a solid box (btBoxShape::calculateLocalInertia);
    `half_extents` should already include bullet's collision margin."""
    hx, hy, hz = half_extents
    lx, ly, lz = 2 * hx, 2 * hy, 2 * hz
    ix = mass / 12.0 * (ly * ly + lz * lz)
    iy = mass / 12.0 * (lx * lx + lz * lz)
    iz = mass / 12.0 * (lx * lx + ly * ly)
    return jnp.asarray([1.0 / ix, 1.0 / iy, 1.0 / iz], dtype=jnp.float32)


def sphere_inv_inertia_scalar(mass, radius):
    """btSphereShape::calculateLocalInertia: I = 0.4 m r^2 on all axes."""
    return 1.0 / (0.4 * mass * radius * radius)


def inv_inertia_world(rot, inv_inertia_diag):
    """World inverse inertia R * diag * R^T for [..., 3, 3] rotations."""
    return jnp.einsum("...ij,j,...kj->...ik", rot, inv_inertia_diag, rot)


def velocity_at_point(vel, ang_vel, rel_pos):
    """btRigidBody::getVelocityInLocalPoint: v + w x r."""
    return vel + cross(ang_vel, rel_pos)


def impulse_denominator(inv_mass, inv_inertia_w, rel_pos, normal):
    """btRigidBody::computeImpulseDenominator: effective inverse mass of a
    unit impulse along `normal` applied at `rel_pos` from the center."""
    r_cross_n = cross(rel_pos, normal)
    ang = jnp.einsum("...ij,...j->...i", inv_inertia_w, r_cross_n)
    return inv_mass + dot(cross(ang, rel_pos), normal)


def apply_impulse(vel, ang_vel, inv_mass, inv_inertia_w, impulse, rel_pos):
    """btRigidBody::applyImpulse. Returns (vel', ang_vel')."""
    vel = vel + impulse * inv_mass
    ang_vel = ang_vel + jnp.einsum(
        "...ij,...j->...i", inv_inertia_w, cross(rel_pos, impulse)
    )
    return vel, ang_vel


def contact_impulse_static(vel, ang_vel, inv_mass, inv_inertia_w,
                           rel_pos, normal, penetration,
                           restitution, friction, dt,
                           use_position_bias=True):
    """One bullet contact constraint vs the static world, solved to
    convergence for a single contact (bullet iterates; one contact converges
    in one iteration).

    penetration > 0 means overlapping; bias pushes out with erp2.
    Returns (dvel, dang_vel, normal_impulse_magnitude).
    """
    v_contact = velocity_at_point(vel, ang_vel, rel_pos)
    vn = dot(v_contact, normal)

    # Restitution curve: only above the velocity threshold
    bounce = jnp.where(
        -vn > RESTITUTION_VELOCITY_THRESHOLD, restitution * -vn, 0.0
    )

    if use_position_bias:
        bias = ERP2 * jnp.maximum(penetration, 0.0) / dt
    else:
        bias = jnp.zeros_like(vn)

    denom_n = impulse_denominator(inv_mass, inv_inertia_w, rel_pos, normal)
    jn = jnp.maximum((-vn + jnp.maximum(bounce, bias)) / denom_n, 0.0)

    dvel = normal * (jn * inv_mass)[..., None]
    dang = jnp.einsum(
        "...ij,...j->...i", inv_inertia_w, cross(rel_pos, normal * jn[..., None])
    )

    # Friction along the tangential relative velocity direction
    vt = v_contact - vn[..., None] * normal
    vt_len = jnp.sqrt(jnp.maximum(dot(vt, vt), 1e-12))
    t_dir = vt / vt_len[..., None]
    denom_t = impulse_denominator(inv_mass, inv_inertia_w, rel_pos, t_dir)
    jt_needed = vt_len / denom_t
    jt = jnp.minimum(jt_needed, friction * jn)
    dvel = dvel - t_dir * (jt * inv_mass)[..., None]
    dang = dang - jnp.einsum(
        "...ij,...j->...i", inv_inertia_w, cross(rel_pos, t_dir * jt[..., None])
    )
    return dvel, dang, jn


def contact_impulse_pair(vel_a, ang_a, inv_mass_a, inv_inertia_a, rel_a,
                         vel_b, ang_b, inv_mass_b, inv_inertia_b, rel_b,
                         normal, penetration, restitution, friction, dt):
    """Contact between two dynamic bodies; normal points from B toward A.

    Returns (dvel_a, dang_a, dvel_b, dang_b, jn).
    """
    va = velocity_at_point(vel_a, ang_a, rel_a)
    vb = velocity_at_point(vel_b, ang_b, rel_b)
    vn = dot(va - vb, normal)

    bounce = jnp.where(
        -vn > RESTITUTION_VELOCITY_THRESHOLD, restitution * -vn, 0.0
    )
    bias = ERP2 * jnp.maximum(penetration, 0.0) / dt

    denom = (
        impulse_denominator(inv_mass_a, inv_inertia_a, rel_a, normal)
        + impulse_denominator(inv_mass_b, inv_inertia_b, rel_b, normal)
    )
    jn = jnp.maximum((-vn + jnp.maximum(bounce, bias)) / denom, 0.0)
    imp = normal * jn[..., None]

    # Tangential friction
    v_rel = va - vb
    vt = v_rel - vn[..., None] * normal
    vt_len = jnp.sqrt(jnp.maximum(dot(vt, vt), 1e-12))
    t_dir = vt / vt_len[..., None]
    denom_t = (
        impulse_denominator(inv_mass_a, inv_inertia_a, rel_a, t_dir)
        + impulse_denominator(inv_mass_b, inv_inertia_b, rel_b, t_dir)
    )
    jt = jnp.minimum(vt_len / denom_t, friction * jn)
    imp = imp - t_dir * jt[..., None]

    dvel_a, dang_a = apply_impulse(
        jnp.zeros_like(vel_a), jnp.zeros_like(ang_a),
        inv_mass_a, inv_inertia_a, imp, rel_a)
    dvel_b, dang_b = apply_impulse(
        jnp.zeros_like(vel_b), jnp.zeros_like(ang_b),
        inv_mass_b, inv_inertia_b, -imp, rel_b)
    return dvel_a, dang_a, dvel_b, dang_b, jn


def resolve_single_collision_impulse(vel, ang_vel, inv_mass, inv_inertia_w,
                                     rel_pos, normal, distance, dt):
    """bullet resolveSingleCollision with applyImpulses=false
    (btContactConstraint.cpp): returns the scalar impulse used for the
    suspension ray pushback (btVehicleRL.cpp:184-200).

    `distance` is negative when penetrating.
    """
    v_contact = velocity_at_point(vel, ang_vel, rel_pos)
    rel_vel = dot(v_contact, normal)
    positional_error = ERP * -distance / dt
    velocity_error = -rel_vel
    denom = impulse_denominator(inv_mass, inv_inertia_w, rel_pos, normal)
    return jnp.maximum((positional_error + velocity_error) / denom, 0.0)


def resolve_single_bilateral_impulse(vel, ang_vel, inv_mass, inv_inertia_w,
                                     rel_pos, normal):
    """bullet resolveSingleBilateral against a static body: the wheel lateral
    friction impulse magnitude (btVehicleRL.cpp:337-344).
    """
    v_contact = velocity_at_point(vel, ang_vel, rel_pos)
    rel_vel = dot(v_contact, normal)
    denom = impulse_denominator(inv_mass, inv_inertia_w, rel_pos, normal)
    contact_damping = 0.2
    return -contact_damping * rel_vel / denom


def integrate_rotation(rot, ang_vel, dt):
    """btTransformUtil::integrateTransform: exponential-map rotation update,
    then re-orthonormalize (bullet does this periodically; we do it every
    tick for float32 stability)."""
    w = ang_vel * dt
    angle = jnp.sqrt(jnp.maximum(dot(w, w), 1e-20))
    axis = w / angle[..., None]
    c, s = jnp.cos(angle), jnp.sin(angle)
    # Rodrigues rotation matrix
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(kx)
    k_mat = jnp.stack([
        jnp.stack([zero, -kz, ky], axis=-1),
        jnp.stack([kz, zero, -kx], axis=-1),
        jnp.stack([-ky, kx, zero], axis=-1),
    ], axis=-2)
    eye = jnp.eye(3, dtype=rot.dtype)
    rot_delta = (
        eye
        + s[..., None, None] * k_mat
        + (1 - c)[..., None, None] * jnp.einsum("...ij,...jk->...ik", k_mat, k_mat)
    )
    new_rot = jnp.einsum("...ij,...jk->...ik", rot_delta, rot)

    # Gram-Schmidt re-orthonormalization on the columns
    f = new_rot[..., :, 0]
    r = new_rot[..., :, 1]
    f = f / jnp.sqrt(jnp.maximum(dot(f, f), 1e-12))[..., None]
    r = r - f * dot(r, f)[..., None]
    r = r / jnp.sqrt(jnp.maximum(dot(r, r), 1e-12))[..., None]
    u = cross(f, r)
    return jnp.stack([f, r, u], axis=-1)
