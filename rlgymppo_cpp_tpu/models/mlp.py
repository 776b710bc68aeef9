"""Minimal MLP as explicit param pytrees.

Equivalent architecture to the reference's torch Sequential stacks
(DiscretePolicy.cpp:7-29, ValueEstimator.cpp:6-28): Linear+ReLU per hidden
layer and a final Linear. Params are plain dicts so checkpointing, sharding
annotations, and cross-ecosystem conversion stay trivial. Matmuls hit the
MXU; `compute_dtype=bfloat16` gives the bf16 fast path the reference gets
from autocast/half-precision models (PPOLearnerConfig.h:19-22).

Init matches torch.nn.Linear defaults (kaiming-uniform with a=sqrt(5), bias
U(-1/sqrt(fan_in), 1/sqrt(fan_in))) so learning-curve comparisons against
rlgym-ppo start from the same distribution family.
"""

import math

import jax
import jax.numpy as jnp


def _linear_init(key, fan_in, fan_out):
    k_w, k_b = jax.random.split(key)
    # torch kaiming_uniform(a=sqrt(5)): gain=sqrt(2/6), bound=gain*sqrt(3/fan_in)
    bound_w = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(k_w, (fan_in, fan_out), jnp.float32,
                           -bound_w, bound_w)
    bound_b = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(k_b, (fan_out,), jnp.float32, -bound_b, bound_b)
    return {"w": w, "b": b}


def mlp_init(key, sizes):
    """sizes = [in, h1, ..., out] -> list of {'w','b'} layer dicts."""
    layers = []
    for i in range(len(sizes) - 1):
        key, sub = jax.random.split(key)
        layers.append(_linear_init(sub, sizes[i], sizes[i + 1]))
    return layers


def mlp_apply(params, x, compute_dtype=None):
    """Forward: Linear+ReLU x (n-1), then Linear. Accumulates in f32.

    bf16 params imply bf16 compute: the bf16_inference path hands this a
    bfloat16 param copy (train_step.py); without this rule the f32
    activations would PROMOTE the dot back to f32 (jnp mixed-precision
    promotion) and the cast would buy nothing."""
    if compute_dtype is None and params and \
            params[0]["w"].dtype == jnp.bfloat16:
        compute_dtype = jnp.bfloat16
    orig_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    for i, layer in enumerate(params):
        w, b = layer["w"], layer["b"]
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
            b = b.astype(compute_dtype)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) \
            + b.astype(jnp.float32)
        if i < len(params) - 1:
            x = jax.nn.relu(x)
            if compute_dtype is not None:
                x = x.astype(compute_dtype)
    return x.astype(jnp.float32) if compute_dtype is not None else x


def param_sizes(params):
    """Flat parameter count per tensor (for checkpoint shape verification,
    mirroring PPOLearner.cpp:391-409)."""
    return [int(p.size) for layer in params for p in (layer["w"], layer["b"])]
