"""Fused MLP policy forward as a single Pallas TPU kernel.

The rollout scan's second hot spot (after physics) is the policy forward
(reference: `Policy Infer Time`, ThreadAgentManager.cpp:103-106). XLA
compiles the plain jnp path as one fusion per matmul, writing each
activation back to HBM between layers. For the 3x256 policy the weights
(~0.9 MB f32 / ~0.45 MB bf16) fit comfortably in VMEM, so the whole
network — input layer, hidden layers, logit layer, temperature softmax,
min-prob clip (DiscretePolicy.cpp:44-50) — runs as ONE kernel per batch
tile: activations never leave VMEM, weights are fetched once and stay
resident across the batch grid (constant index_map -> the pipeline skips
re-copies), and HBM traffic drops to obs-in + probs-out.

Inference-only (rollout + InferUnit + skill eval): the learn path keeps the
differentiable jnp formulation in models/mlp.py. Numerics match that path
to float tolerance; tests run the same kernel in interpret mode on CPU.

Feature dims are zero-padded to the 128-lane boundary; padded action
columns are masked to -inf before the softmax so they carry zero
probability (they are sliced off before clipping, so the min-prob clamp
only ever applies to real actions, matching DiscretePolicy.h:19).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(n_layers, temperature, valid_out, out_pad, compute_dtype,
            scratch_weights, *refs):
    """refs = x_ref, w0, b0, w1, b1, ..., out_ref
              (+ scratch: w/b VMEM copies, dma_sems)."""
    x_ref = refs[0]
    nwb = 2 * n_layers
    hbm_refs = refs[1:1 + nwb]
    out_ref = refs[1 + nwb]
    if scratch_weights:
        # Constant-index-map input blocks are refetched from HBM every
        # grid step (measured on v5e — ~0.9 MB of weights per tile adds
        # up across a big batch grid), so params are DMA'd ONCE into
        # VMEM scratch at step 0 and stay for the whole grid.
        layer_refs = refs[2 + nwb:2 + 2 * nwb]
        sems = refs[2 + 2 * nwb]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for j in range(nwb):
                pltpu.make_async_copy(hbm_refs[j], layer_refs[j],
                                      sems.at[j]).start()
            for j in range(nwb):
                pltpu.make_async_copy(hbm_refs[j], layer_refs[j],
                                      sems.at[j]).wait()
    else:
        layer_refs = hbm_refs

    x = x_ref[:]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    for i in range(n_layers):
        w = layer_refs[2 * i][:]
        b = layer_refs[2 * i + 1][:]
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) \
            + b.astype(jnp.float32)
        if i < n_layers - 1:
            x = jnp.maximum(x, 0.0)
            if compute_dtype is not None:
                x = x.astype(compute_dtype)

    # Temperature softmax with padded action columns masked out
    # (DiscretePolicy.cpp:44-50). x is f32 [TILE_B, out_pad].
    logits = x / temperature
    if valid_out != out_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < valid_out, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    out_ref[:] = e / jnp.sum(e, axis=-1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("temperature", "min_prob", "compute_dtype",
                     "tile_b", "interpret"))
def fused_mlp_probs(params, obs, temperature=1.0, min_prob=1e-11,
                    compute_dtype=None, tile_b=512, interpret=False):
    """Policy action probabilities via one fused Pallas kernel.

    params: list of {'w','b'} layer dicts (models/mlp.py layout).
    obs: [B, obs_size] float32. Returns [B, action_amount] float32 probs,
    clipped to [min_prob, 1] like the jnp path.
    """
    B, O = obs.shape
    A = params[-1]["w"].shape[1]
    if compute_dtype is None and params[0]["w"].dtype == jnp.bfloat16:
        # bf16 params imply bf16 compute (same rule as mlp_apply): the
        # bf16_inference rollout hands bf16 param copies with f32 obs
        compute_dtype = jnp.bfloat16
    O_pad = _round_up(O, LANE)
    A_pad = _round_up(A, LANE)
    tile_b = min(tile_b, _round_up(B, 8))
    B_pad = _round_up(B, tile_b)

    x = obs
    if (B_pad, O_pad) != (B, O):
        x = jnp.pad(x, ((0, B_pad - B), (0, O_pad - O)))

    ops = []
    in_specs = [pl.BlockSpec((tile_b, O_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for li, layer in enumerate(params):
        w, b = layer["w"], layer["b"]
        fi, fo = w.shape
        fi_pad = O_pad if li == 0 else _round_up(fi, LANE)
        fo_pad = A_pad if li == len(params) - 1 else _round_up(fo, LANE)
        if (fi_pad, fo_pad) != (fi, fo):
            w = jnp.pad(w, ((0, fi_pad - fi), (0, fo_pad - fo)))
            b = jnp.pad(b, (0, fo_pad - fo))
        ops += [w, b.reshape(1, fo_pad)]

    # compiled TPU: weights ride a one-time DMA into VMEM scratch;
    # interpret/CPU tests keep plain VMEM blocks.
    scratch_weights = not interpret
    if scratch_weights:
        in_specs += [pl.BlockSpec(memory_space=pltpu.ANY) for _ in ops]
        scratch_shapes = [pltpu.VMEM(o.shape, o.dtype) for o in ops] \
            + [pltpu.SemaphoreType.DMA((len(ops),))]
    else:
        for o in ops:
            in_specs.append(pl.BlockSpec(
                o.shape, lambda i, nd=len(o.shape): (0,) * nd,
                memory_space=pltpu.VMEM))
        scratch_shapes = []

    flops = 2 * B_pad * sum(w.size for w in ops[::2])
    probs = pl.pallas_call(
        functools.partial(_kernel, len(params), float(temperature), A,
                          A_pad, compute_dtype, scratch_weights),
        grid=(B_pad // tile_b,),
        out_shape=jax.ShapeDtypeStruct((B_pad, A_pad), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_b, A_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=B_pad * A_pad,
            bytes_accessed=4 * (B_pad * O_pad + B_pad * A_pad)
            + 4 * sum(o.size for o in ops)),
        # big batch tiles blow the default 16 MB scoped-VMEM budget; the
        # v5e has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *ops)

    return jnp.clip(probs[:B, :A], min_prob, 1.0)
