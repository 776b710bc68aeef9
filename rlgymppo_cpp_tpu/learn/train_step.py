"""Fully-fused training step: rollout scan + GAE + PPO inside ONE jit.

The Learner's iteration loop (learner.py) mirrors the reference's host
orchestration — collect, AddNewExperience, Learn — with a host sync between
phases. This module is the TPU fast path with no host round trips at all:
one compiled program collects a [T, N, P] window, runs the critic over it,
computes GAE with the Welford return-std, and consumes the fresh window as
the PPO batch (epochs x shuffled minibatches). This is the natural
single-program expression of the reference's collect/learn pipeline
(Learner.cpp:436-606) when the experience window equals the batch, and it
is what the multi-chip dryrun and the benchmark drive: with env state
sharded over the mesh's `env` axis and params replicated (or TP-sharded),
XLA turns the minibatch gradient means into psums over ICI automatically.
"""

import functools

import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.learn.rollout import RolloutCollector
from rlgymppo_cpp_tpu.ops.gae import compute_gae
from rlgymppo_cpp_tpu.ops.welford import welford_std, welford_update_batch


def make_train_step(gym, ppo, cfg, horizon):
    """Build the fused step.

    Returns a jitted fn:
      (train_state, gym_state, obs, return_stats, key)
        -> (train_state', gym_state', obs', return_stats', metrics)

    `horizon` is the number of env-steps collected per call; the PPO batch
    is the whole window (T * N * P rows).
    """
    collector = RolloutCollector(gym, ppo.policy)
    N, P, O = gym.num_envs, gym.num_players, gym.obs_size
    total = horizon * N * P
    ppo_cfg = ppo.config
    if ppo_cfg.batch_size != total:
        raise ValueError(
            f"fused train step needs ppo.batch_size == T*N*P ({total}), "
            f"got {ppo_cfg.batch_size}")

    @jax.jit
    def train_step(train_state, gym_state, obs, return_stats, key):
        k_col, k_shuf = jax.random.split(key)
        gym_state, last_obs, traj, col_metrics = collector.collect(
            train_state["policy"], gym_state, obs, k_col, horizon)

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

        metrics_acc = None
        for _ in range(ppo_cfg.epochs):
            k_shuf, sub = jax.random.split(k_shuf)
            perm = jax.random.permutation(sub, total)
            shuffled = jax.tree.map(lambda x: x[perm], batch)
            train_state, m = ppo._train_batch(train_state, shuffled)
            metrics_acc = m if metrics_acc is None else jax.tree.map(
                jnp.add, metrics_acc, m)
        metrics = jax.tree.map(lambda x: x / ppo_cfg.epochs, metrics_acc)
        metrics.update(col_metrics)
        return train_state, gym_state, last_obs, return_stats, metrics

    return train_step
