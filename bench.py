"""Headline benchmark: END-TO-END training steps/second (+ collection-only).

The reference's published numbers (/root/reference/README.md:7-8) are
~70,000 collected steps/sec and an honest per-iteration "Overall
Steps/Second" (Learner.cpp:541-570) that includes GAE + PPO consumption.
This benchmark measures both for the TPU build:

  - overall:    the fused train step (rollout scan + GAE + PPO in ONE
                compiled program — learn/train_step.py, the path
                Learner.learn takes at reference-default config shape),
  - collection: the rollout scan alone (physics + obs + reward + policy
                forward), the analog of the reference's collection sps.

PPO config mirrors examplemain.cpp:115-124 economics: one whole-window
batch per iteration, 1 epoch, 3x256 nets. Steps are player-steps
(ThreadAgent.cpp:158).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}
where the headline value is the overall (end-to-end) number.
"""

import json
import os
import time

# Persistent XLA compilation cache: the fused train step takes ~60-90s to
# compile cold on a v5e chip; cached reruns start timing almost immediately.
# Per-user location: a fixed shared /tmp path breaks on multi-user hosts
# (permissions) and /tmp can be evicted or tampered with.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "rlgymppo_tpu", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax

BASELINE_SPS = 70_000.0   # reference README.md:8 (collection ~= overall
                          # steady-state with collection-during-learn)


def main():
    from rlgymppo_cpp_tpu.gym import Gym
    from rlgymppo_cpp_tpu.learn.config import LearnerConfig, PPOLearnerConfig
    from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
    from rlgymppo_cpp_tpu.learn.rollout import RolloutCollector
    from rlgymppo_cpp_tpu.learn.train_step import make_train_step
    from rlgymppo_cpp_tpu.ops.welford import welford_init
    from __graft_entry__ import _make_match

    platform = jax.devices()[0].platform
    num_envs = 8192 if platform == "tpu" else 64
    horizon = 32

    match = _make_match(team_size=1, spawn_opponents=True)
    gym = Gym(match, num_envs=num_envs, tick_skip=8)
    P = gym.num_players
    batch = horizon * num_envs * P

    cfg = LearnerConfig(num_envs=num_envs)
    cfg.ppo = PPOLearnerConfig(batch_size=batch, epochs=1,
                               mini_batch_size=0)
    ppo = PPOLearner(gym.obs_size, gym.action_amount, cfg.ppo)
    train_state = ppo.init(jax.random.PRNGKey(0))
    return_stats = welford_init(1)

    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    gym_state, obs = gym.reset(sub)

    # ---- overall: fused train step at reference economics ----
    # examplemain.cpp:119 keeps a 3-batch experience window and runs one
    # optimizer step per shuffled batch; the fused program carries the
    # window on device (train_step.py buffer_mult). The 70k baseline was
    # measured under these economics, so the headline is too.
    from rlgymppo_cpp_tpu.learn.train_step import init_fused_buffer
    K = 3
    cfg.exp_buffer_size = K * batch
    step = make_train_step(gym, ppo, cfg, horizon, buffer_mult=K)
    buffer = init_fused_buffer(K, batch, gym.obs_size)
    for _ in range(K):   # compile + fill the window with real experience
        key, sub = jax.random.split(key)
        out = step(train_state, gym_state, obs, return_stats, buffer, sub)
        jax.block_until_ready(out[-1]["entropy"])
        train_state, gym_state, obs, return_stats, buffer, _ = out

    iters = 5 if platform == "tpu" else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        (train_state, gym_state, obs, return_stats, buffer,
         metrics) = step(
            train_state, gym_state, obs, return_stats, buffer, sub)
    jax.block_until_ready(metrics["entropy"])
    overall_sps = iters * batch / (time.perf_counter() - t0)

    # ---- collection only ----
    collector = RolloutCollector(gym, ppo.policy)
    params = train_state["policy"]
    key, sub = jax.random.split(key)
    gym_state, obs, traj, _ = collector.collect(
        params, gym_state, obs, sub, horizon)   # compile
    jax.block_until_ready(traj["rewards"])
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        gym_state, obs, traj, _ = collector.collect(
            params, gym_state, obs, sub, horizon)
    jax.block_until_ready(traj["rewards"])
    collect_sps = iters * batch / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "overall_steps_per_sec",
        "value": round(overall_sps, 1),
        "unit": "player-steps/s",
        "vs_baseline": round(overall_sps / BASELINE_SPS, 3),
        "collection_steps_per_sec": round(collect_sps, 1),
        "collection_vs_baseline": round(collect_sps / BASELINE_SPS, 3),
    }))


if __name__ == "__main__":
    main()
