"""Welford running mean/variance for return standardization.

Functional port of WelfordRunningStat
(src/public/RLGymPPO_CPP/Util/WelfordRunningStat.h:36-83); state is a small
pytree so it lives in checkpoints and crosses jit boundaries freely.
"""

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class WelfordState:
    mean: jnp.ndarray       # [shape] float64-ish accumulators kept f32
    m2: jnp.ndarray         # running variance accumulator
    count: jnp.ndarray      # scalar int


def welford_init(shape=1):
    return WelfordState(
        mean=jnp.zeros((shape,), jnp.float32),
        m2=jnp.zeros((shape,), jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


def welford_update_batch(state: WelfordState, samples):
    """Sequentially fold a [N] (or [N, shape]) batch of samples; matches the
    reference's per-sample Update loop via Chan's parallel combination."""
    samples = samples.reshape(samples.shape[0], -1).astype(jnp.float32)
    n_b = samples.shape[0]
    mean_b = jnp.mean(samples, axis=0)
    m2_b = jnp.sum((samples - mean_b) ** 2, axis=0)

    n_a = state.count.astype(jnp.float32)
    n = n_a + n_b
    delta = mean_b - state.mean
    mean = state.mean + delta * (n_b / jnp.maximum(n, 1.0))
    m2 = state.m2 + m2_b + delta * delta * (n_a * n_b / jnp.maximum(n, 1.0))
    return WelfordState(mean=mean, m2=m2, count=state.count + n_b)


def welford_mean(state: WelfordState):
    return jnp.where(state.count < 2, 0.0, state.mean)


def welford_std(state: WelfordState):
    """std with the reference's guards: 1 when count<2 or variance==0."""
    var = state.m2 / jnp.maximum(state.count.astype(jnp.float32) - 1.0, 1.0)
    var = jnp.where(var == 0.0, 1.0, var)
    return jnp.where(state.count < 2, jnp.ones_like(var), jnp.sqrt(var))
