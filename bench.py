"""Headline benchmark: collection steps/second.

Mirrors the reference's headline number — ~70,000 collected steps/sec
(player-steps, policy inference included) on an i5-11400 + RTX 3060 Ti
(/root/reference/README.md:7-8; steps counted per player,
ThreadAgent.cpp:158). Here the same quantity is measured for the jitted
rollout scan (physics + obs + reward + policy forward fused in one program)
on whatever device JAX gives us.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_SPS = 70_000.0   # reference README.md:8


def main():
    from rlgymppo_cpp_tpu.gym import Gym
    from rlgymppo_cpp_tpu.learn.rollout import RolloutCollector
    from rlgymppo_cpp_tpu.models.discrete_policy import DiscretePolicy
    from __graft_entry__ import _make_match

    platform = jax.devices()[0].platform
    num_envs = 8192 if platform == "tpu" else 64
    horizon = 32

    match = _make_match(team_size=1, spawn_opponents=True)
    gym = Gym(match, num_envs=num_envs, tick_skip=8)
    policy = DiscretePolicy(gym.obs_size, gym.action_amount,
                            layer_sizes=(256, 256, 256))
    params = policy.init(jax.random.PRNGKey(0))
    collector = RolloutCollector(gym, policy)

    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    gym_state, obs = gym.reset(sub)

    # Warmup / compile
    key, sub = jax.random.split(key)
    gym_state, obs, traj, _ = collector.collect(
        params, gym_state, obs, sub, horizon)
    jax.block_until_ready(traj["rewards"])

    iters = 5 if platform == "tpu" else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        gym_state, obs, traj, _ = collector.collect(
            params, gym_state, obs, sub, horizon)
    jax.block_until_ready(traj["rewards"])
    dt = time.perf_counter() - t0

    player_steps = iters * horizon * num_envs * gym.num_players
    sps = player_steps / dt
    print(json.dumps({
        "metric": "collection_steps_per_sec",
        "value": round(sps, 1),
        "unit": "player-steps/s",
        "vs_baseline": round(sps / BASELINE_SPS, 3),
    }))


if __name__ == "__main__":
    main()
