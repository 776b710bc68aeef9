"""Isolate the SDF mesh world's cost: gathers vs vector math vs structure.

The r3 'dist-only march' change removed ~28% of the gather rows per
env-tick and moved throughput by <1% (331k -> 330k player-steps/s), so
row count is NOT the linear cost driver the design assumed. This probe
times collect/tick variants that surgically remove one suspected cost at
a time:

  baseline      the real mesh world (MeshGeom)
  plane         the analytic plane world (lower bound: zero mesh cost)
  ray0          RAY_STEPS=0 (no marching gathers; physics wrong, timing
                valid) - isolates the serial march-gather chain
  nogather      every packed-row gather replaced by row 0 (uniform index;
                same vector math, no random access) - isolates gather
                latency/issue cost from the trilinear math
  nodirs        normals from the trilinear gradient only (no scattered
                dirs gather in _sample)

Usage: python scripts/mesh_profile.py [--envs 2048] [--steps 16]
Prints one JSON line per variant.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "rlgymppo_tpu", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp


def time_collect(gym, ppo, horizon, iters):
    from rlgymppo_cpp_tpu.learn.rollout import RolloutCollector

    train_state = ppo.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    gym_state, obs = gym.reset(sub)
    collector = RolloutCollector(gym, ppo.policy)
    params = train_state["policy"]
    state = {"g": gym_state, "o": obs, "k": key}

    def run():
        state["k"], sub = jax.random.split(state["k"])
        state["g"], state["o"], traj, _ = collector.collect(
            params, state["g"], state["o"], sub, horizon)
        return traj["rewards"]

    run()  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = run()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=2048)
    ap.add_argument("--horizon", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--variants", default="baseline,plane,ray0,nogather,"
                                          "nodirs")
    args = ap.parse_args()

    from rlgymppo_cpp_tpu.gym import Gym
    from rlgymppo_cpp_tpu.learn.config import PPOLearnerConfig
    from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
    from rlgymppo_cpp_tpu.sim.soccar_mesh import make_soccar_mesh_geom
    from rlgymppo_cpp_tpu.sim import mesh_geom as mg
    from __graft_entry__ import _make_match

    match = _make_match(team_size=1, spawn_opponents=True)
    horizon, iters = args.horizon, args.iters

    def make(geom=None):
        gym = Gym(match, num_envs=args.envs, tick_skip=8, geom=geom)
        batch = horizon * args.envs * gym.num_players
        ppo = PPOLearner(gym.obs_size, gym.action_amount,
                         PPOLearnerConfig(batch_size=batch, epochs=1,
                                          mini_batch_size=0))
        return gym, ppo, batch

    results = {}
    variants = args.variants.split(",")

    for name in variants:
        geom = None
        saved = {}
        if name == "plane":
            gym, ppo, batch = make(None)
        else:
            if name == "ray0":
                saved["RAY_STEPS"] = mg.MeshGeom.RAY_STEPS
                mg.MeshGeom.RAY_STEPS = 0
            elif name == "nogather":
                saved["take"] = jnp.take

                def fake_take(arr, idx, axis=0, **kw):
                    if (axis == 0 and arr.ndim == 2
                            and arr.shape[-1] in (8, 32)):
                        # uniform index: same bytes-per-lane shape, no
                        # random access
                        return jnp.broadcast_to(
                            arr[0], idx.shape + (arr.shape[-1],))
                    return saved["take"](arr, idx, axis=axis, **kw)

                mg.jnp = type(jnp)("jnp_patched")
                mg.jnp.__dict__.update(jnp.__dict__)
                mg.jnp.take = fake_take
            elif name == "nodirs":
                saved["_field_eval"] = mg.MeshGeom._field_eval

                def grad_only(self, packed, dirs, flat_idx, ni, t):
                    d, _n = saved["_field_eval"](
                        self, packed, dirs, flat_idx, ni, t)
                    # recompute normal from gradient only (dirs unused ->
                    # XLA dead-codes the scattered gather)
                    c = jnp.take(packed, flat_idx, axis=0)
                    wx1, wy1, wz1 = t[..., 0], t[..., 1], t[..., 2]
                    wx0, wy0, wz0 = 1 - wx1, 1 - wy1, 1 - wz1
                    c0, c1, c2, c3 = (c[..., 0], c[..., 1], c[..., 2],
                                      c[..., 3])
                    c4, c5, c6, c7 = (c[..., 4], c[..., 5], c[..., 6],
                                      c[..., 7])
                    gx = ((c4 - c0) * wy0 * wz0 + (c5 - c1) * wy0 * wz1
                          + (c6 - c2) * wy1 * wz0 + (c7 - c3) * wy1 * wz1)
                    gy = ((c2 - c0) * wx0 * wz0 + (c3 - c1) * wx0 * wz1
                          + (c6 - c4) * wx1 * wz0 + (c7 - c5) * wx1 * wz1)
                    gz = ((c1 - c0) * wx0 * wy0 + (c3 - c2) * wx0 * wy1
                          + (c5 - c4) * wx1 * wy0 + (c7 - c6) * wx1 * wy1)
                    g = jnp.stack([gx, gy, gz], axis=-1) / self.cell
                    gn = jnp.linalg.norm(g, axis=-1, keepdims=True)
                    n = jnp.where(gn > 1e-6, g / jnp.maximum(gn, 1e-6),
                                  jnp.asarray([0.0, 0.0, 1.0]))
                    return d, n

                mg.MeshGeom._field_eval = grad_only
            gym, ppo, batch = make(make_soccar_mesh_geom())

        try:
            dt = time_collect(gym, ppo, horizon, iters)
            sps = batch / dt
            results[name] = round(sps, 1)
            print(json.dumps({"variant": name, "sps": round(sps, 1),
                              "dt": round(dt, 4)}), flush=True)
        finally:
            if "RAY_STEPS" in saved:
                mg.MeshGeom.RAY_STEPS = saved["RAY_STEPS"]
            if "take" in saved:
                mg.jnp = jnp
            if "_field_eval" in saved:
                mg.MeshGeom._field_eval = saved["_field_eval"]

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
