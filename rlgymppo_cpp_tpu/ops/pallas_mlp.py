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

# float32 has 24 mantissa bits; top 24 of a uint32 -> uniform on (0, 1)
_U24 = float(2.0 ** -24)
_U25 = float(2.0 ** -25)


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

    x = _mlp_logits(n_layers, compute_dtype, layer_refs, x_ref[:])

    # Temperature softmax with padded action columns masked out
    # (DiscretePolicy.cpp:44-50). x is f32 [TILE_B, out_pad].
    logits = x / temperature
    if valid_out != out_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < valid_out, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    out_ref[:] = e / jnp.sum(e, axis=-1, keepdims=True)


def _prep(params, obs, compute_dtype, tile_b, interpret):
    """Shared wrapper plumbing: pad obs/weights to 128-lane boundaries,
    build the input specs and the VMEM-scratch weight setup."""
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
    return (x, ops, in_specs, scratch_shapes, scratch_weights,
            compute_dtype, B, O, A, B_pad, O_pad, A_pad, tile_b)


def _mlp_logits(n_layers, compute_dtype, layer_refs, x):
    """Shared kernel body: padded-obs tile -> raw logits [tile, A_pad]."""
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
    return x


def _sample_kernel(n_layers, temperature, min_prob, valid_out, out_pad,
                   compute_dtype, scratch_weights, deterministic,
                   ext_noise, *refs):
    """refs = seed(SMEM), x_ref, [gumbel_ref,] w0, b0, ...,
              act_ref, logp_ref (+ scratch weight copies and DMA sems).
    ext_noise: interpret/CPU mode — the TPU PRNG primitives have no
    interpreter lowering, so the Gumbel noise arrives as an input."""
    seed_ref = refs[0]
    x_ref = refs[1]
    refs = refs[2:]
    g_ref = None
    if ext_noise:
        g_ref, refs = refs[0], refs[1:]
    nwb = 2 * n_layers
    hbm_refs = refs[:nwb]
    act_ref, logp_ref = refs[nwb], refs[nwb + 1]
    refs = refs[nwb + 2:]
    if scratch_weights:
        layer_refs = refs[:nwb]
        sems = refs[nwb]

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

    logits = _mlp_logits(n_layers, compute_dtype, layer_refs, x_ref[:])
    logits = logits / temperature
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col < valid_out
    logits = jnp.where(valid, logits, -jnp.inf)

    # log_softmax with the DiscretePolicy min-prob clamp: identical to
    # log(clip(softmax(logits), min_prob, 1)) on the valid columns
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
    lp = jnp.maximum(logits - lse, jnp.log(jnp.float32(min_prob)))
    lp = jnp.where(valid, lp, -jnp.inf)

    if deterministic:
        y = lp
    elif ext_noise:
        y = jnp.where(valid, lp + g_ref[:], -jnp.inf)
    else:
        # Gumbel-max sampling: argmax(lp + g), g ~ Gumbel(0,1), is an
        # exact draw from softmax(lp) — same distribution as
        # jax.random.categorical, different (hardware PRNG) stream.
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits(logits.shape),
                             jnp.uint32)
        # top 24 bits -> (0, 1) uniform; the shift clears the sign bit so
        # the int32 reinterpretation is value-preserving (Mosaic has no
        # direct uint32 -> f32 cast)
        u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) \
            * _U24 + _U25
        g = -jnp.log(-jnp.log(u))
        y = jnp.where(valid, lp + g, -jnp.inf)

    mx = jnp.max(y, axis=-1, keepdims=True)
    # lowest tied index, matching jnp.argmax tie-breaking
    idx = jnp.min(jnp.where(y == mx, col, out_pad), axis=-1,
                  keepdims=True)
    act_ref[:] = idx
    if deterministic:
        # DiscretePolicy.cpp:51-62: argmax actions carry zero log prob
        logp_ref[:] = jnp.zeros_like(lp[:, :1])
    else:
        logp_ref[:] = jnp.sum(jnp.where(col == idx, lp, 0.0), axis=-1,
                              keepdims=True)


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
    (x, ops, in_specs, scratch_shapes, scratch_weights, compute_dtype,
     B, O, A, B_pad, O_pad, A_pad, tile_b) = _prep(
        params, obs, compute_dtype, tile_b, interpret)

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


@functools.partial(
    jax.jit,
    static_argnames=("deterministic", "temperature", "min_prob",
                     "compute_dtype", "tile_b", "interpret"))
def fused_mlp_sample(params, obs, key, deterministic=False,
                     temperature=1.0, min_prob=1e-11, compute_dtype=None,
                     tile_b=512, interpret=False):
    """Policy forward + action selection in ONE kernel: MLP -> temperature
    log-softmax -> min-prob clamp -> Gumbel-max sample (or argmax) ->
    per-row log-prob. Returns (actions int32 [B], log_probs f32 [B]).

    The probs kernel (fused_mlp_probs) still round-trips an [B, A_pad]
    f32 probability matrix through HBM and leaves sampling to
    jax.random.categorical — whose threefry bit generation costs more
    than the matmuls at rollout batch sizes. Here the probabilities
    never leave VMEM and the Gumbel draw uses the TPU's hardware PRNG
    (pltpu.prng_random_bits), so HBM traffic per forward drops to
    obs-in + two [B] vectors out. Sampling is an exact categorical draw
    (Gumbel-max over the clamped log-probs — the same distribution
    DiscretePolicy.get_action samples, DiscretePolicy.cpp:51-62) but on
    a DIFFERENT pseudorandom stream than jax.random.categorical: seeds
    derive from `key`, so runs stay reproducible, while trajectories
    diverge from the jnp path's draw-for-draw (statistically equivalent;
    tests/test_pallas_mlp.py pins distribution + log-prob parity).
    """
    (x, ops, in_specs, scratch_shapes, scratch_weights, compute_dtype,
     B, O, A, B_pad, O_pad, A_pad, tile_b) = _prep(
        params, obs, compute_dtype, tile_b, interpret)

    # one int32 seed per call straight from the caller's key bits (a
    # split key's words are already uniform — no need to pay a threefry
    # draw per rollout step); per-tile decorrelation adds program_id
    # inside the kernel
    kd = jax.random.key_data(key).ravel()
    seed = jax.lax.bitcast_convert_type(kd[0] ^ kd[-1],
                                        jnp.int32).reshape(1)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs

    # interpret/CPU: the TPU PRNG primitives have no interpreter
    # lowering, so tests feed jax.random Gumbel noise through an input
    # (same math from the noise on; the hardware-PRNG branch is pinned
    # on-chip by scripts/probe_sample_kernel.py)
    ext_noise = bool(interpret) and not deterministic
    extra = ()
    if ext_noise:
        g = jax.random.gumbel(key, (B_pad, A_pad), jnp.float32)
        in_specs.insert(2, pl.BlockSpec((tile_b, A_pad), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM))
        extra = (g,)

    flops = 2 * B_pad * sum(w.size for w in ops[::2])
    actions, log_probs = pl.pallas_call(
        functools.partial(_sample_kernel, len(params), float(temperature),
                          float(min_prob), A, A_pad, compute_dtype,
                          scratch_weights, bool(deterministic), ext_noise),
        grid=(B_pad // tile_b,),
        out_shape=(jax.ShapeDtypeStruct((B_pad, 1), jnp.int32),
                   jax.ShapeDtypeStruct((B_pad, 1), jnp.float32)),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=3 * B_pad * A_pad,
            bytes_accessed=4 * (B_pad * O_pad + 2 * B_pad)
            + 4 * sum(o.size for o in ops)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed, x, *extra, *ops)

    return actions[:B, 0], log_probs[:B, 0]
