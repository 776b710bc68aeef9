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

import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.learn.rollout import RolloutCollector
from rlgymppo_cpp_tpu.learn.ppo_learner import _params_vector_norm_diff
from rlgymppo_cpp_tpu.ops.gae import compute_gae
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
    3). With K = buffer_mult > 1 the program carries the K-1 previous
    batches as an on-device experience buffer: each call shuffles the full
    K-batch window and runs K optimizer steps (one per batch of
    `batch_size`, gradients accumulated over minibatches within a batch),
    exactly the reference's GetAllBatchesShuffled loop
    (PPOLearner.cpp:103-299 + ExperienceBuffer.cpp). With K == 1 `buffer`
    is an empty dict and a single step consumes the fresh window.
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

    @jax.jit
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
            # window = K-1 buffered batches (oldest first) + fresh batch
            window = jax.tree.map(
                lambda old, new: jnp.concatenate([old, new], axis=0),
                buffer, batch)
            new_buffer = jax.tree.map(lambda x: x[total:], window)
        else:
            window = batch
            new_buffer = buffer

        # One optimizer step per batch (PPOLearner.cpp:286-288). A row
        # shuffle cannot change a single accumulated whole-window update
        # (K == 1 and mini_batch == batch); with K > 1 batches the shuffle
        # decides which rows share an optimizer step, so it is always on
        # (GetAllBatchesShuffled, ExperienceBuffer.cpp).
        shuffle = K > 1 or ppo_cfg.mini_batch_size not in (
            0, ppo_cfg.batch_size)

        def epoch_body(carry, _):
            ts, k = carry
            if shuffle:
                k, sub = jax.random.split(k)
                perm = jax.random.permutation(sub, K * total)
                w = jax.tree.map(lambda x: x[perm], window)
            else:
                w = window

            if K > 1:
                batches = jax.tree.map(
                    lambda x: x.reshape(K, total, *x.shape[1:]), w)

                def batch_body(ts, b):
                    ts, m = ppo._train_batch(ts, b)
                    return ts, m

                ts, m = jax.lax.scan(batch_body, ts, batches)
                m = jax.tree.map(lambda x: jnp.mean(x, axis=0), m)
            else:
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
    """Zero-filled on-device buffer for the K-1 carried batches. Callers
    warm it up with real experience (Learner runs the eager path for the
    first K-1 iterations, matching the reference's partially-filled
    ExperienceBuffer) before switching to the fused step."""
    rows = (buffer_mult - 1) * batch_rows
    return {
        "states": jnp.zeros((rows, obs_size), jnp.float32),
        "actions": jnp.zeros((rows,), jnp.int32),
        "log_probs": jnp.zeros((rows,), jnp.float32),
        "values": jnp.zeros((rows,), jnp.float32),
        "advantages": jnp.zeros((rows,), jnp.float32),
    }
