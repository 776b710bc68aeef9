"""Batched 3-vector helpers.

Vectors are plain jnp arrays whose last axis has size 3; every function
broadcasts over arbitrary leading batch axes. This replaces the reference's
SIMD `Vec` struct (RocketSim src/Math/MathTypes/MathTypes.h:7-155) with the
TPU-natural formulation: the batch axes carry the parallelism, not SIMD lanes.
"""

import jax.numpy as jnp

EPS = 1.1920929e-07  # FLT_EPSILON, matching the reference's float32 math


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def norm_sq(v):
    return jnp.sum(v * v, axis=-1)


def norm(v):
    return jnp.sqrt(norm_sq(v))


def norm_sq2d(v):
    return v[..., 0] * v[..., 0] + v[..., 1] * v[..., 1]


def norm2d(v):
    return jnp.sqrt(norm_sq2d(v))


def normalized(v):
    """Safe normalize: zero vector stays zero (RocketSim Vec::Normalized)."""
    length = norm(v)
    safe = jnp.where(length > EPS * EPS, length, 1.0)
    return jnp.where((length > EPS * EPS)[..., None], v / safe[..., None], 0.0)


# bullet's safeNormalized treats near-zero vectors the same way
safe_normalized = normalized


def clamp_norm(v, max_norm):
    """Rescale `v` to length<=max_norm (vel/angvel clamping in the reference,
    e.g. Car.cpp:177-190, Ball.cpp:121-135)."""
    n_sq = norm_sq(v)
    max_sq = max_norm * max_norm
    # normalized() * max_norm, but branchless
    scale = jnp.where(n_sq > max_sq, max_norm / jnp.sqrt(jnp.maximum(n_sq, 1e-30)), 1.0)
    return v * scale[..., None]
