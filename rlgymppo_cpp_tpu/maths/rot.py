"""Rotation utilities.

Rotation matrices are `[..., 3, 3]` arrays in bullet's row-major world layout:
column 0 = forward, column 1 = right (+Y left-handed RL convention),
column 2 = up, i.e. `world = M @ local`.

Euler angles follow RocketSim's `Angle` (yaw, pitch, roll in radians, YPR
application order; RocketSim src/Math/MathTypes/MathTypes.cpp:62-116).
All functions broadcast over leading batch axes.
"""

import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths.vec import EPS, normalized, cross


def rotmat_identity(batch_shape=()):
    return jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (*batch_shape, 3, 3))


def rotmat_forward(m):
    return m[..., :, 0]


def rotmat_right(m):
    return m[..., :, 1]


def rotmat_up(m):
    return m[..., :, 2]


def rotmat_from_columns(forward, right, up):
    return jnp.stack([forward, right, up], axis=-1)


def euler_to_rotmat(yaw, pitch, roll):
    """YPR euler -> rotation matrix.

    Matches RocketSim Angle::ToRotMat (MathTypes.cpp:73-78), which applies
    bullet setEulerYPR(yaw, -pitch, -roll) = Rz(yaw)·Ry(-pitch)·Rx(-roll).
    """
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)

    forward = jnp.stack([cp * cy, cp * sy, sp], axis=-1)
    right = jnp.stack(
        [sp * sr * cy - cr * sy, sp * sr * sy + cr * cy, -cp * sr], axis=-1
    )
    up = jnp.stack(
        [-sp * cr * cy - sr * sy, -sp * cr * sy + sr * cy, cp * cr], axis=-1
    )
    return rotmat_from_columns(forward, right, up)


def rotmat_to_euler(m):
    """Rotation matrix -> (yaw, pitch, roll), inverse of euler_to_rotmat.

    Matches Angle::FromRotMat (MathTypes.cpp:62-71): bullet getEulerYPR with
    pitch and roll negated back.
    """
    f = rotmat_forward(m)
    yaw = jnp.arctan2(f[..., 1], f[..., 0])
    pitch = jnp.arcsin(jnp.clip(f[..., 2], -1.0, 1.0))
    roll = jnp.arctan2(-m[..., 2, 1], m[..., 2, 2])
    return yaw, pitch, roll


def angle_from_vec(forward):
    """Yaw/pitch of a direction vector (Angle::FromVec, MathTypes.cpp:80-100).
    Returns (yaw, pitch); roll is always 0."""
    x, y, z = forward[..., 0], forward[..., 1], forward[..., 2]
    nonzero_2d = (jnp.abs(x) > EPS) | (jnp.abs(y) > EPS)
    yaw = jnp.where(nonzero_2d, jnp.arctan2(y, x), 0.0)
    dist2d = jnp.sqrt(x * x + y * y)
    pitch_2d = jnp.arctan2(z, dist2d)
    pitch_axis = jnp.where(z > EPS, jnp.pi / 2, jnp.where(z < -EPS, -jnp.pi / 2, 0.0))
    pitch = jnp.where(nonzero_2d, pitch_2d, pitch_axis)
    return yaw, pitch


def forward_vec_from_angle(yaw, pitch):
    """Forward unit vector of a yaw/pitch (Angle::GetForwardVec)."""
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack([cp * cy, cp * sy, sp], axis=-1)


def wrap_normalize(val, minmax):
    """Wrap `val` into [-minmax, minmax] (Math::WrapNormalizeFloat,
    RocketSim src/Math/Math.cpp:66-73)."""
    result = jnp.fmod(val, minmax * 2)
    result = jnp.where(result > minmax, result - minmax * 2, result)
    result = jnp.where(result < -minmax, result + minmax * 2, result)
    return result


def round_angle_ue3(yaw, pitch):
    """Aggressive UE3 rotator rounding of yaw+pitch (Math::RoundAngleUE3,
    RocketSim src/Math/Math.cpp:75-91). Returns values in [0, 2*pi)."""
    to_ints = jnp.float32((1 << 15) / jnp.pi)
    back_to_radians = (1.0 / to_ints) * 4.0
    mask = 0x4000 - 1

    r_yaw = (yaw * to_ints).astype(jnp.int32) >> 2 & mask
    r_pitch = (pitch * to_ints).astype(jnp.int32) >> 2 & mask
    return r_yaw.astype(jnp.float32) * back_to_radians, \
        r_pitch.astype(jnp.float32) * back_to_radians


def look_at_rotmat(forward_dir, up_dir):
    """RotMat::LookAt (MathTypes.h:189-197): up need not be orthogonal."""
    f = normalized(forward_dir)
    tr = cross(up_dir, f)
    u = normalized(cross(f, tr))
    r = normalized(cross(u, f))
    return rotmat_from_columns(f, r, u)
