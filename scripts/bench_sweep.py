"""Collection-throughput sweep over env counts (perf tuning tool)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/rlgymppo_tpu_jax_cache_dev")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from __graft_entry__ import _make_match  # noqa: E402
from rlgymppo_cpp_tpu.gym import Gym  # noqa: E402
from rlgymppo_cpp_tpu.models.discrete_policy import DiscretePolicy  # noqa
from rlgymppo_cpp_tpu.learn.rollout import RolloutCollector  # noqa: E402


def bench_envs(num_envs, horizon=32, iters=3, team_size=1,
               spawn_opponents=True):
    match = _make_match(team_size=team_size,
                        spawn_opponents=spawn_opponents)
    gym = Gym(match, num_envs=num_envs, tick_skip=8)
    policy = DiscretePolicy(gym.obs_size, gym.action_amount,
                            (256, 256, 256))
    params = policy.init(jax.random.PRNGKey(0))
    col = RolloutCollector(gym, policy)
    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    gs, obs = gym.reset(sub)
    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    gs, obs, traj, _ = col.collect(params, gs, obs, sub, horizon)
    jax.block_until_ready(traj["rewards"])
    compile_t = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        gs, obs, traj, _ = col.collect(params, gs, obs, sub, horizon)
    jax.block_until_ready(traj["rewards"])
    dt = time.perf_counter() - t0
    sps = iters * horizon * num_envs * gym.num_players / dt
    print(f"envs={num_envs:6d} players={gym.num_players}  "
          f"sps={sps:12,.0f}  (compile {compile_t:.1f}s)", flush=True)
    return sps


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1:]] or [4096, 8192, 16384, 32768]
    for n in sizes:
        bench_envs(n)
