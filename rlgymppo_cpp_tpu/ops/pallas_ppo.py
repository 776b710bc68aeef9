"""Fused PPO batch gradient (policy + critic, forward AND backward) as one
Pallas TPU kernel.

The PPO update is HBM-bound, not FLOP-bound: XLA's autodiff of the
minibatch loss materializes every layer activation to HBM on the forward
pass and reads it back on the backward pass (~10 GB per 524k-row batch for
3x256 nets — measured 34 ms/batch on a v5e while the analytic fwd+bwd FLOP
floor is ~5 ms; scripts/update_profile.py). This kernel runs BOTH networks'
forward, the clipped-surrogate + entropy + value-MSE loss gradients, and
the full backward in one pass over batch tiles: activations live and die
in VMEM, weight gradients accumulate in VMEM output blocks written back
once, and HBM traffic drops to obs-in + five 1D row streams + params-in +
grads-out, leaving the MXU as the limit.

Measured pipeline facts this design encodes (stream probes, v5e):
  - XLA lane-pads 2D f32 arrays to 128 in HBM, so a narrow [B, k] aux
    array streams as many bytes as [B, 128] — the four per-row scalars
    therefore ride as ONE [4, B] array (each stream contiguous along
    lanes, ~8 MB total instead of 4 x 268 MB) and reshape to [tile, 1]
    in-kernel, which lowers to a free relayout.
  - Constant-index-map input blocks are REFETCHED from HBM every grid
    step (~+2.4 ms for 3 MB of weights over a 256-step grid), so weights
    and biases enter in ANY memory space and are DMA'd ONCE into VMEM
    scratch at step 0.
  - Constant-index-map OUTPUT blocks are genuinely resident (no per-step
    writeback), so the weight-grad accumulators are plain outputs.
  - obs is consumed at its natural [B, obs_size]; padding to 128 lanes
    outside the kernel only adds a 268 MB copy (the HBM layout is already
    lane-padded).

Semantics are identical to PPOLearner._train_batch's jnp gradient path
(ppo_learner.py:97-131 — itself the re-design of the reference's torch
autograd step, PPOLearner.cpp:103-299): same clipped-ratio branch
selection, same entropy bonus, same temperature/min-prob softmax
(DiscretePolicy.cpp:44-75), same SB3 diagnostics. The one knowing
difference: the min-prob clamp (1e-11) is treated as gradient-transparent;
torch/jax stop gradients through clamped probabilities, but a probability
only clamps when it underflows 1e-11, where its gradient contribution is
itself ~1e-11 — the parity test pins the match on realistic data.

The gradient means over the batch equal the jnp path's
minibatch-accumulated means exactly (gradient accumulation with
ratio_scale = mbs/batch telescopes to one whole-batch mean), so the kernel
replaces the whole minibatch scan regardless of mini_batch_size.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# metrics layout ([1, 8] f32 SMEM, sums over valid rows)
M_ENTROPY, M_KL, M_RATIO, M_VLOSS, M_CLIPFRAC = 0, 1, 2, 3, 4


def _mlp_fwd(x, wb):
    """Forward keeping inputs and pre-activations; wb = [w0,b0,w1,b1,...]
    (arrays, already loaded from refs). Returns (acts, pre)."""
    acts, pre = [], []
    n = len(wb) // 2
    for i in range(n):
        acts.append(x)
        z = jnp.dot(x, wb[2 * i], preferred_element_type=jnp.float32) \
            + wb[2 * i + 1]
        pre.append(z)
        x = jnp.maximum(z, 0.0) if i < n - 1 else z
    return acts, pre


def _mlp_bwd(dz_last, acts, pre, wb, dwb_refs, step):
    """Backward from the last layer's dz; accumulates dW/db into the
    output refs (initialized at grid step 0, written back once at the
    end — constant-index output blocks stay resident in VMEM)."""
    n = len(wb) // 2
    dz = dz_last
    for i in range(n - 1, -1, -1):
        dw = jax.lax.dot_general(
            acts[i], dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db = jnp.sum(dz, axis=0, keepdims=True)

        @pl.when(step == 0)
        def _(i=i, dw=dw, db=db):
            dwb_refs[2 * i][...] = dw
            dwb_refs[2 * i + 1][...] = db

        @pl.when(step != 0)
        def _(i=i, dw=dw, db=db):
            dwb_refs[2 * i][...] += dw
            dwb_refs[2 * i + 1][...] += db

        if i > 0:
            dx = jax.lax.dot_general(
                dz, wb[2 * i], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dz = dx * (pre[i - 1] > 0.0).astype(jnp.float32)


def _kernel(np_layers, nv_layers, n_rows, tile_b, clip_range,
            ent_coef, inv_temp, min_prob, scratch_weights, *refs):
    """refs = obs, act_f, old_lp, adv, tgt, [policy w/b]*, [critic w/b]*,
              [policy dw/db]*, [critic dw/db]*, metrics,
              (scratch: [policy w/b]*, [critic w/b]*, dma_sems)."""
    i = pl.program_id(0)
    obs = refs[0][:]
    aux = refs[1]    # [4, tile_b]: act, old_lp, adv, tgt row streams
    act_idx = aux[0, :].reshape(tile_b, 1).astype(jnp.int32)
    old_lp = aux[1, :].reshape(tile_b, 1)
    adv = aux[2, :].reshape(tile_b, 1)
    tgt = aux[3, :].reshape(tile_b, 1)
    nwb = 2 * (np_layers + nv_layers)
    k = 2
    wb_hbm = refs[k:k + nwb]; k += nwb
    dwb = refs[k:k + nwb]; k += nwb
    metrics_ref = refs[k]; k += 1
    if scratch_weights:
        wb_vmem = refs[k:k + nwb]; k += nwb
        sems = refs[k]

        # one-time DMA of all params into VMEM; stays for the whole grid
        @pl.when(i == 0)
        def _():
            for j in range(nwb):
                pltpu.make_async_copy(wb_hbm[j], wb_vmem[j],
                                      sems.at[j]).start()
            for j in range(nwb):
                pltpu.make_async_copy(wb_hbm[j], wb_vmem[j],
                                      sems.at[j]).wait()
        wb = [r[:] for r in wb_vmem]
    else:
        wb = [r[:] for r in wb_hbm]
    p_wb, v_wb = wb[:2 * np_layers], wb[2 * np_layers:]
    p_dwb, v_dwb = dwb[:2 * np_layers], dwb[2 * np_layers:]

    # padded rows past the real batch contribute nothing
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_b, 1), 0) + i * tile_b
    valid = (row < n_rows).astype(jnp.float32)
    scale = 1.0 / n_rows

    # ---- policy forward + softmax (DiscretePolicy.cpp:44-75) ----
    p_acts, p_pre = _mlp_fwd(obs, p_wb)
    logits = p_pre[-1] * inv_temp                        # [M, A]
    zmax = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - zmax)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    p = jnp.clip(p, min_prob, 1.0)
    lp = jnp.log(p)

    entropy = -jnp.sum(p * lp, axis=-1, keepdims=True)   # [M, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    onehot = (col == act_idx).astype(jnp.float32)
    act_lp = jnp.sum(lp * onehot, axis=-1, keepdims=True)

    # ---- clipped surrogate pieces (PPOLearner.cpp / ppo_learner.py) ----
    log_ratio = act_lp - old_lp
    ratio = jnp.exp(log_ratio)
    r_clip = jnp.clip(ratio, 1.0 - clip_range, 1.0 + clip_range)
    unclipped = (ratio > 1.0 - clip_range) & (ratio < 1.0 + clip_range)
    # min(r*A, rc*A) passes gradient iff the unclipped arg is selected
    # (inside the clip range both args coincide — same gradient either way)
    active = unclipped | (ratio * adv < r_clip * adv)
    g_lp = -scale * adv * ratio * active.astype(jnp.float32) * valid

    # d/dlogits: surrogate through (onehot - p), entropy bonus through
    # -p*(lp + H); everything carries the 1/T of logits = z/T
    ent_g = ent_coef * scale * valid
    dz_p = (g_lp * (onehot - p) + ent_g * p * (lp + entropy)) * inv_temp
    _mlp_bwd(dz_p, p_acts, p_pre, p_wb, p_dwb, i)

    # ---- critic forward/backward (value MSE); last layer is [.., 1] ----
    v_acts, v_pre = _mlp_fwd(obs, v_wb)
    verr = v_pre[-1] - tgt                               # [M, 1]
    dz_v = 2.0 * scale * verr * valid
    _mlp_bwd(dz_v, v_acts, v_pre, v_wb, v_dwb, i)

    # ---- SB3 diagnostics, summed over valid rows (SMEM scalars) ----
    kl = (ratio - 1.0) - log_ratio
    clipf = (jnp.abs(ratio - 1.0) > clip_range).astype(jnp.float32)
    msums = [jnp.sum(entropy * valid), jnp.sum(kl * valid),
             jnp.sum(ratio * valid), jnp.sum(verr * verr * valid),
             jnp.sum(clipf * valid)]

    @pl.when(i == 0)
    def _():
        for j, s in enumerate(msums):
            metrics_ref[0, j] = s

    @pl.when(i != 0)
    def _():
        for j, s in enumerate(msums):
            metrics_ref[0, j] += s


def _flatten_params(params):
    """[{'w','b'}] -> flat [w, b(1,fo), ...] with original dims."""
    flat = []
    for layer in params:
        flat += [layer["w"], layer["b"].reshape(1, -1)]
    return flat


@functools.partial(
    jax.jit,
    static_argnames=("clip_range", "ent_coef", "temperature", "min_prob",
                     "tile_b", "interpret"))
def fused_ppo_grads(policy_params, value_params, batch, clip_range,
                    ent_coef, temperature=1.0, min_prob=1e-11,
                    tile_b=2048, interpret=False):
    """One whole-batch PPO gradient in a single fused kernel.

    batch: dict with states [B, O] f32, actions [B] int, log_probs [B],
    advantages [B], values (targets) [B]. Returns
    ((policy_grads, value_grads), metrics) exactly like differentiating
    ppo_learner.minibatch_loss over the full batch: grads are MEANS over
    B; metrics are the 5 SB3 diagnostics means.
    """
    obs = batch["states"]
    B, O = obs.shape
    tile_b = min(tile_b, max(((B + 7) // 8) * 8, 8))
    B_pad = (B + tile_b - 1) // tile_b * tile_b

    # per-row scalars as one [4, B] array: each stream is contiguous and
    # the array is NOT lane-padded per row the way a [B, 4] would be
    aux = jnp.stack([batch["actions"].astype(jnp.float32),
                     batch["log_probs"], batch["advantages"],
                     batch["values"]], axis=0)
    if B_pad != B:
        obs = jnp.pad(obs, ((0, B_pad - B), (0, 0)))
        aux = jnp.pad(aux, ((0, 0), (0, B_pad - B)))

    p_flat = _flatten_params(policy_params)
    v_flat = _flatten_params(value_params)
    wb = p_flat + v_flat
    np_l, nv_l = len(policy_params), len(value_params)
    grid = (B_pad // tile_b,)

    # compiled TPU: params ride a one-time DMA into VMEM scratch (constant
    # index-map INPUT blocks are refetched every grid step — measured).
    # interpret/CPU: plain VMEM inputs; refetch cost is irrelevant there.
    scratch_weights = not interpret
    weight_space = pltpu.ANY if scratch_weights else pltpu.VMEM

    in_specs = [pl.BlockSpec((tile_b, O), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, tile_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(memory_space=weight_space) if scratch_weights
                 else pl.BlockSpec(o.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
                 for o in wb]
    out_shape = ([jax.ShapeDtypeStruct(o.shape, jnp.float32) for o in wb]
                 + [jax.ShapeDtypeStruct((1, 8), jnp.float32)])
    out_specs = ([pl.BlockSpec(o.shape,
                               lambda i, nd=len(o.shape): (0,) * nd,
                               memory_space=pltpu.VMEM) for o in wb]
                 + [pl.BlockSpec((1, 8), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)])
    scratch_shapes = []
    if scratch_weights:
        scratch_shapes = [pltpu.VMEM(o.shape, jnp.float32) for o in wb] \
            + [pltpu.SemaphoreType.DMA((len(wb),))]

    flops = 3 * 2 * B_pad * sum(o.size for o in wb[::2])
    outs = pl.pallas_call(
        functools.partial(
            _kernel, np_l, nv_l, B, tile_b, float(clip_range),
            float(ent_coef), 1.0 / float(temperature), float(min_prob),
            scratch_weights),
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=2 * B_pad * policy_params[-1]["w"].shape[1],
            bytes_accessed=4 * B_pad * (O + 4)
            + 8 * 4 * sum(o.size for o in wb)),
        # two nets' live activations for a big tile exceed the default
        # 16 MB scoped-VMEM budget; the v5e has 128 MB — use it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(obs, aux, *wb)

    def unflatten(flat):
        return [{"w": flat[2 * i], "b": flat[2 * i + 1][0]}
                for i in range(len(flat) // 2)]

    p_grads = unflatten(outs[:2 * np_l])
    v_grads = unflatten(outs[2 * np_l:2 * (np_l + nv_l)])
    msums = outs[-1][0]
    inv_b = 1.0 / B
    metrics = {
        "entropy": msums[M_ENTROPY] * inv_b,
        "kl": msums[M_KL] * inv_b,
        "ratio": msums[M_RATIO] * inv_b,
        "value_loss": msums[M_VLOSS] * inv_b,
        "clip_fraction": msums[M_CLIPFRAC] * inv_b,
    }
    return (p_grads, v_grads), metrics
