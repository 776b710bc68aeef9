"""Fully-fused training step: rollout scan + GAE + PPO inside ONE jit.

The Learner's eager path mirrors the reference's host orchestration —
collect, AddNewExperience, Learn — with a host sync between phases. This
module is the TPU fast path with no host round trips at all: one compiled
program collects a [T, N, P] window, runs the critic over it, computes GAE
with the Welford return-std, and consumes the fresh window as the PPO batch
(epochs x minibatch scans). It is the natural single-program expression of
the reference's collect/learn pipeline (Learner.cpp:436-606) when the
experience window equals the batch — the reference's own default economics
(examplemain.cpp:115-124 collects exactly one batch per iteration).

`Learner.learn` routes through this whenever the config matches that shape
(see Learner._fused_eligible); the multi-chip dryrun and bench.py drive it
too: with env state sharded over the mesh's `env` axis and params
replicated (or TP-sharded), XLA turns the minibatch gradient means into
psums over ICI automatically.
"""

import functools

import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.learn.rollout import RolloutCollector
from rlgymppo_cpp_tpu.learn.ppo_learner import _params_vector_norm_diff
from rlgymppo_cpp_tpu.ops.gae import compute_gae
from rlgymppo_cpp_tpu.ops.pallas_shuffle import block_gather, block_shuffle
from rlgymppo_cpp_tpu.ops.welford import welford_std, welford_update_batch


def make_train_step(gym, ppo, cfg, horizon, deterministic=False,
                    step_metrics_fn=None, paranoid=False, buffer_mult=1):
    """Build the fused step.

    Returns a jitted fn:
      (train_state, gym_state, obs, return_stats, buffer, key)
        -> (train_state', gym_state', obs', return_stats', buffer', metrics)

    `horizon` is the number of env-steps collected per call; the PPO batch
    is the whole window (T * N * P rows). metrics is a dict of device
    scalars: PPO stats (entropy/kl/ratio/value_loss/clip_fraction/
    policy_update_mag/value_update_mag), GAE stats (avg_return/
    avg_advantage/avg_val_target), and the collector metrics.

    `buffer_mult` = exp_buffer_size / batch_size (examplemain.cpp:119 uses
    3). With K = buffer_mult > 1 the program carries the K most recent
    batches as an on-device RING buffer (`buffer` holds K*batch rows plus
    a `slot` pointer): each call overwrites the oldest slot with the fresh
    batch in place (the buffer arg is DONATED — callers must not reuse the
    buffer they passed in), then runs K optimizer steps over a random
    block-partition of the whole window (one step per `batch_size` rows,
    gradients accumulated over minibatches within a batch) — exactly the
    reference's GetAllBatchesShuffled loop (PPOLearner.cpp:103-299 +
    ExperienceBuffer.cpp). Ring order never leaks into the math because
    the partition is uniform over blocks regardless of slot rotation.
    With K == 1 `buffer` is an empty dict and a single step consumes the
    fresh window.
    """
    collector = RolloutCollector(gym, ppo.policy, deterministic=deterministic,
                                 step_metrics_fn=step_metrics_fn,
                                 paranoid=paranoid)
    N, P, O = gym.num_envs, gym.num_players, gym.obs_size
    total = horizon * N * P
    ppo_cfg = ppo.config
    if ppo_cfg.batch_size != total:
        raise ValueError(
            f"fused train step needs ppo.batch_size == T*N*P ({total}), "
            f"got {ppo_cfg.batch_size}")

    K = int(buffer_mult)

    @functools.partial(jax.jit, donate_argnums=(4,))
    def train_step(train_state, gym_state, obs, return_stats, buffer, key):
        k_col, k_shuf = jax.random.split(key)
        rollout_params = train_state["policy"]
        if ppo_cfg.bf16_inference:
            # halfPrecModels analog (PPOLearner.cpp:41-53): the rollout
            # infers with a bf16 param copy; learn stays f32
            rollout_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), rollout_params)
        gym_state, last_obs, traj, col_metrics = collector.collect(
            rollout_params, gym_state, obs, k_col, horizon)

        T = horizon
        B = N * P
        obs_seq = jnp.concatenate(
            [traj["obs"].reshape(T, B, O), last_obs.reshape(1, B, O)], axis=0)
        # Plain jnp on purpose: XLA fuses a forward-only MLP chain well
        # (2.7 ms for the [T+1, B] window on a v5e vs 3.7 ms for a fused
        # Pallas forward — measured; the Pallas win is specific to
        # fwd+bwd, where autodiff materializes activations to HBM).
        values = ppo.value_net.forward(train_state["value"], obs_seq)

        rewards = traj["rewards"].reshape(T, B).astype(jnp.float32)
        dones = jnp.broadcast_to(
            traj["dones"][:, :, None], (T, N, P)).reshape(T, B)
        truncateds = jnp.broadcast_to(
            traj["truncateds"][:, :, None], (T, N, P)).reshape(T, B)

        ret_std = jnp.where(
            cfg.standardize_returns, welford_std(return_stats)[0], 1.0)
        advantages, value_targets, returns = compute_gae(
            rewards, dones.astype(jnp.float32),
            truncateds.astype(jnp.float32), values,
            cfg.gae_gamma, cfg.gae_lambda, ret_std, cfg.reward_clip_range)

        n_inc = min(cfg.max_returns_per_stats_inc, T)
        return_stats = welford_update_batch(
            return_stats, returns[:n_inc].reshape(-1)[:, None])

        batch = {
            "states": obs_seq[:-1].reshape(total, O),
            "actions": traj["actions"].reshape(total).astype(jnp.int32),
            "log_probs": traj["log_probs"].reshape(total),
            "values": value_targets.reshape(total),
            "advantages": advantages.reshape(total),
        }

        policy_before = train_state["policy"]
        critic_before = train_state["value"]

        if K > 1:
            # Ring write: fresh batch overwrites the oldest slot in place
            # (the buffer is donated, so this is a 1-batch write, not a
            # K-batch concat+slide — which cost ~60 ms/iter at reference
            # shape on a v5e before this layout).
            slot = buffer["slot"]
            start = slot * total
            window = {
                f: jax.lax.dynamic_update_slice_in_dim(
                    buffer[f], batch[f], start, axis=0)
                for f in batch}
            new_buffer = dict(window, slot=(slot + 1) % K)
        else:
            window = batch
            new_buffer = buffer

        # One optimizer step per batch (PPOLearner.cpp:286-288). A row
        # shuffle cannot change a single accumulated whole-window update
        # (K == 1 and mini_batch == batch); with K > 1 batches the shuffle
        # decides which rows share an optimizer step, so it is always on
        # (GetAllBatchesShuffled, ExperienceBuffer.cpp). Since each
        # optimizer step sums its batch's gradients, only the random
        # partition into batches matters — the shuffle samples it at block
        # granularity (see PPOLearnerConfig.shuffle_block_rows), and each
        # optimizer batch gathers its own blocks directly (never
        # materializing a shuffled copy of the whole window).
        shuffle = K > 1 or ppo_cfg.mini_batch_size not in (
            0, ppo_cfg.batch_size)
        R = max(int(getattr(ppo_cfg, "shuffle_block_rows", 1)), 1)
        if total % R != 0:
            R = 1
        n_blocks = (K * total) // R

        def epoch_body(carry, _):
            ts, k = carry
            if shuffle:
                k, sub = jax.random.split(k)
                perm = jax.random.permutation(sub, n_blocks)

            if K > 1:
                parts = perm.reshape(K, total // R)

                def batch_body(ts, idx):
                    b = {f: block_gather(window[f], idx, R)
                         for f in window}
                    ts, m = ppo._train_batch(ts, b)
                    return ts, m

                ts, m = jax.lax.scan(batch_body, ts, parts)
                m = jax.tree.map(lambda x: jnp.mean(x, axis=0), m)
            else:
                if shuffle:
                    keys = sorted(window.keys())
                    w = dict(zip(keys, block_shuffle(
                        [window[f] for f in keys], perm, R)))
                else:
                    w = window
                ts, m = ppo._train_batch(ts, w)
            return (ts, k), m

        (train_state, _), ms = jax.lax.scan(
            epoch_body, (train_state, k_shuf), None, length=ppo_cfg.epochs)
        metrics = jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

        metrics["policy_update_mag"] = _params_vector_norm_diff(
            policy_before, train_state["policy"])
        metrics["value_update_mag"] = _params_vector_norm_diff(
            critic_before, train_state["value"])
        metrics["avg_return"] = jnp.mean(jnp.abs(returns)) / ret_std
        metrics["avg_advantage"] = jnp.mean(jnp.abs(advantages))
        metrics["avg_val_target"] = jnp.mean(jnp.abs(value_targets))
        metrics.update(col_metrics)
        return (train_state, gym_state, last_obs, return_stats, new_buffer,
                metrics)

    return train_step


def init_fused_buffer(buffer_mult, batch_rows, obs_size):
    """Zero-filled K-slot ring buffer (+ `slot` write pointer). Callers
    warm it up with real experience (Learner runs the eager path for the
    first K-1 iterations, matching the reference's partially-filled
    ExperienceBuffer) before switching to the fused step; the fused step
    itself writes the fresh batch into `slot` before training."""
    rows = buffer_mult * batch_rows
    return {
        "states": jnp.zeros((rows, obs_size), jnp.float32),
        "actions": jnp.zeros((rows,), jnp.int32),
        "log_probs": jnp.zeros((rows,), jnp.float32),
        "values": jnp.zeros((rows,), jnp.float32),
        "advantages": jnp.zeros((rows,), jnp.float32),
        "slot": jnp.int32(0),
    }
