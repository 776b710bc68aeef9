"""Headline benchmark: END-TO-END training steps/second (+ phase breakdown).

The reference's published numbers (/root/reference/README.md:7-8) are
~70,000 collected steps/sec and an honest per-iteration "Overall
Steps/Second" (Learner.cpp:541-570) that includes GAE + PPO consumption.
This benchmark measures both for the TPU build:

  - overall:    the fused train step (rollout scan + GAE + PPO in ONE
                compiled program — learn/train_step.py, the path
                Learner.learn takes at reference-default config shape),
  - collection: the rollout scan alone (physics + obs + reward + policy
                forward), the analog of the reference's collection sps,
  - phases:     separately-jitted device timings (tick scan, policy
                forward scan, derived obs+reward and GAE+update) plus an
                analytic-FLOP MFU estimate for the MLP phases — the
                reference's timing-breakdown discipline
                (Learner.cpp:541-570, PPOLearner.cpp:137-157).

PPO config mirrors examplemain.cpp:115-124 economics: 3-batch experience
window, one optimizer step per shuffled batch, 1 epoch, 3x256 nets. Steps
are player-steps (ThreadAgent.cpp:158).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}
where the headline value is the overall (end-to-end) number. Every run
also appends its result to bench_history.jsonl so regressions are caught
at commit time (the r1->r2 4.46M->4.24M collection drop went unexplained
for a round because nothing tracked history).

--mesh benchmarks the SDF triangle-mesh world's collection rate instead
(north star: >=1M player-steps/s, BASELINE.md).
"""

import argparse
import json
import os
import subprocess
import time

# Persistent XLA compilation cache: the fused train step takes ~60-90s to
# compile cold on a v5e chip; cached reruns start timing almost immediately.
# Per-user location: a fixed shared /tmp path breaks on multi-user hosts
# (permissions) and /tmp can be evicted or tampered with.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "rlgymppo_tpu", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp

BASELINE_SPS = 70_000.0   # reference README.md:8 (collection ~= overall
                          # steady-state with collection-during-learn)
MESH_NORTH_STAR = 1_000_000.0

# TPU v5e (v5 lite): 197 TFLOP/s bf16 MXU peak. MFU below is vs this peak
# for the MLP matmuls only (f32 paths run lower; the estimate is a floor).
V5E_BF16_PEAK = 197e12


def _mlp_flops_per_row(sizes, n_out):
    """Forward mul-add FLOPs for one row through an MLP."""
    dims = list(sizes) + [n_out]
    f = 0
    for a, b in zip(dims[:-1], dims[1:]):
        f += 2 * a * b
    return f


def _sync(x):
    """Real device sync: reduce to a scalar on device and fetch it.
    block_until_ready is NOT a reliable barrier on tunneled TPU runtimes
    (small programs vanish into the dispatch queue and 'complete'
    instantly), and fetching a big array costs seconds over the tunnel —
    so reduce first, then pull 4 bytes."""
    float(jnp.sum(x))


def _time(fn, iters, trials=1):
    """Best-of-`trials` mean over `iters` chained runs. The tunnel/host
    adds multi-ms jitter; the best trial is the closest estimate of
    device throughput (BENCH_r03 recorded a 2.1x-slow outlier run)."""
    _sync(fn())   # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _append_history(record):
    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        record["git"] = rev.stdout.strip() or None
    except Exception:
        record["git"] = None
    record["time"] = int(time.time())
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_history.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def bench_mesh():
    """SDF mesh-world collection rate (VERDICT r2 task #3)."""
    from rlgymppo_cpp_tpu.gym import Gym
    from rlgymppo_cpp_tpu.learn.config import PPOLearnerConfig
    from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
    from rlgymppo_cpp_tpu.learn.rollout import RolloutCollector
    from rlgymppo_cpp_tpu.sim.soccar_mesh import make_soccar_mesh_geom
    from __graft_entry__ import _make_match

    platform = jax.devices()[0].platform
    # 8192 envs, not 2048: the mesh world is gather-bound and the chip is
    # latency-bound below ~4k envs (scripts/mesh_profile.py: plane world
    # 386k sps @ 2048 vs 1.9M @ 8192 in the same process)
    num_envs = 8192 if platform == "tpu" else 16
    horizon = 32

    match = _make_match(team_size=1, spawn_opponents=True)
    gym = Gym(match, num_envs=num_envs, tick_skip=8,
              geom=make_soccar_mesh_geom())
    P = gym.num_players
    batch = horizon * num_envs * P

    ppo = PPOLearner(gym.obs_size, gym.action_amount,
                     PPOLearnerConfig(batch_size=batch, epochs=1,
                                      mini_batch_size=0))
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

    iters = 5 if platform == "tpu" else 1
    dt = _time(run, iters, trials=3)
    sps = batch / dt
    out = {
        "metric": "mesh_collection_steps_per_sec",
        "value": round(sps, 1),
        "unit": "player-steps/s",
        "vs_baseline": round(sps / MESH_NORTH_STAR, 3),
        "num_envs": num_envs,
    }
    _append_history(out)
    print(json.dumps(out))


def main():
    from rlgymppo_cpp_tpu.gym import Gym
    from rlgymppo_cpp_tpu.learn.config import LearnerConfig, PPOLearnerConfig
    from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
    from rlgymppo_cpp_tpu.learn.rollout import RolloutCollector
    from rlgymppo_cpp_tpu.learn.train_step import (
        make_train_step, init_fused_buffer,
    )
    from rlgymppo_cpp_tpu.ops.welford import welford_init
    from rlgymppo_cpp_tpu.sim.state import CarControls
    from __graft_entry__ import _make_match

    platform = jax.devices()[0].platform
    num_envs = 8192 if platform == "tpu" else 64
    horizon = 32

    match = _make_match(team_size=1, spawn_opponents=True)
    gym = Gym(match, num_envs=num_envs, tick_skip=8)
    P = gym.num_players
    batch = horizon * num_envs * P
    iters = 5 if platform == "tpu" else 2

    cfg = LearnerConfig(num_envs=num_envs)
    # bf16_inference: rollout infers with a bf16 param copy (the
    # halfPrecModels analog) — curve-parity checked at the round-2 shape
    # (docs_learning_check_bf16_r5.jsonl); learn stays f32
    cfg.ppo = PPOLearnerConfig(batch_size=batch, epochs=1,
                               mini_batch_size=0, bf16_inference=True)
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
    K = 3
    cfg.exp_buffer_size = K * batch
    step = make_train_step(gym, ppo, cfg, horizon, buffer_mult=K)
    buffer = init_fused_buffer(K, batch, gym.obs_size)
    fstate = {"ts": train_state, "g": gym_state, "o": obs,
              "rs": return_stats, "b": buffer, "k": key}

    def run_overall():
        fstate["k"], sub = jax.random.split(fstate["k"])
        (fstate["ts"], fstate["g"], fstate["o"], fstate["rs"],
         fstate["b"], metrics) = step(
            fstate["ts"], fstate["g"], fstate["o"], fstate["rs"],
            fstate["b"], sub)
        return metrics["entropy"]

    for _ in range(K):   # compile + fill the window with real experience
        _sync(run_overall())
    overall_dt = _time(run_overall, iters, trials=3)
    overall_sps = batch / overall_dt
    train_state, gym_state, obs = fstate["ts"], fstate["g"], fstate["o"]
    key = fstate["k"]

    # ---- collection only ----
    collector = RolloutCollector(gym, ppo.policy)
    # same bf16 param copy the fused step's rollout uses
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          train_state["policy"])
    cstate = {"g": gym_state, "o": obs, "k": key}

    def run_collect():
        cstate["k"], sub = jax.random.split(cstate["k"])
        cstate["g"], cstate["o"], traj, _ = collector.collect(
            params, cstate["g"], cstate["o"], sub, horizon)
        return traj["rewards"]

    collect_dt = _time(run_collect, iters, trials=3)
    collect_sps = batch / collect_dt

    # ---- per-call dispatch floor ----
    # Every dispatched program on the tunneled runtime costs ~1-5 ms of
    # wall overhead that does NOT overlap across chained calls (measured:
    # a trivial-body scan costs the same total whether it runs 8 or 512
    # iterations). End-to-end numbers above amortize it over a whole
    # training iteration; the small phase probes below would otherwise be
    # dominated by it, so each direct phase measurement subtracts this
    # floor to report device WORK, and the floor itself is reported.
    tiny = jnp.ones((1024, 128), jnp.float32)

    @jax.jit
    def _noop_scan(x):
        def b(c, _):
            return (c[0] + 1.0,), ()
        (x,), _ = jax.lax.scan(b, (x,), None, length=8)
        return x

    floor = _time(lambda: _noop_scan(tiny), iters, trials=3)

    # ---- phase: raw physics tick scan (horizon steps x tick_skip ticks,
    # composed exactly like gym.step: ONE layout conversion per env step,
    # the ticks themselves scanned in core layout — arena.py step()) ----
    arena = gym.arena
    phases = {"dispatch_floor": round(floor, 4)}
    controls = CarControls.zeros((num_envs, gym.num_players))

    @jax.jit
    def tick_scan(state, k):
        def body(carry, _):
            s, k = carry
            k, sub = jax.random.split(k)
            s, _ev = arena.step(s, controls, sub, gym.tick_skip)
            return (s, k), ()
        (s, _), _ = jax.lax.scan(body, (state, k), None, length=horizon)
        return s.ball.pos

    st0 = cstate["g"].arena
    tick_dt = max(_time(lambda: tick_scan(st0, jax.random.PRNGKey(3)),
                        iters, trials=2) - floor, 1e-9)
    phases["tick"] = round(tick_dt, 4)

    # ---- phase: policy forward scan ----
    # 4x the horizon, scaled back: the probe is small enough that the
    # per-call floor would otherwise bias it ~2x (BENCH_r04's 9.7%
    # policy MFU was this artifact)
    H_PHASE = horizon * 4
    flat_obs = jnp.zeros((num_envs * P, gym.obs_size), jnp.float32)

    @jax.jit
    def policy_scan(o, k):
        def body(carry, _):
            o, k = carry
            k, sub = jax.random.split(k)
            a, _lp = ppo.policy.get_action(params, o, sub)
            # feed a hair of the output back so the scan can't be
            # collapsed by loop-invariant code motion
            o = o + a[:, None].astype(jnp.float32) * 1e-9
            return (o, k), ()
        (o, _), _ = jax.lax.scan(body, (o, k), None, length=H_PHASE)
        return o

    policy_dt = max(
        (_time(lambda: policy_scan(flat_obs, jax.random.PRNGKey(4)),
               iters, trials=2) - floor) / 4, 1e-9)
    phases["policy_forward"] = round(policy_dt, 4)

    # derived phases (fusion means sums need not match exactly; the
    # collection/overall calls each carry ONE dispatch floor)
    if "tick" in phases:
        phases["obs_reward_derived"] = round(
            max(collect_dt - floor - tick_dt - policy_dt, 0.0), 4)
    phases["gae_update_derived"] = round(
        max(overall_dt - collect_dt, 0.0), 4)
    phases["collection"] = round(collect_dt, 4)
    phases["overall"] = round(overall_dt, 4)

    # ---- analytic-FLOP MFU for the MLP phases ----
    p_cfg = cfg.ppo
    f_policy = _mlp_flops_per_row((gym.obs_size,) + tuple(
        p_cfg.policy_layer_sizes or (256, 256, 256)), gym.action_amount)
    f_critic = _mlp_flops_per_row((gym.obs_size,) + tuple(
        p_cfg.critic_layer_sizes or (256, 256, 256)), 1)
    rollout_flops = f_policy * batch                      # one fwd per step
    # learn: fwd+bwd (~3x fwd) both nets over K batches + GAE value fwd
    learn_flops = 3 * (f_policy + f_critic) * K * batch + f_critic * K * batch
    mfu_policy = rollout_flops / policy_dt / V5E_BF16_PEAK \
        if platform == "tpu" else None
    learn_dt = phases["gae_update_derived"] or None
    mfu_learn = (learn_flops / learn_dt / V5E_BF16_PEAK
                 if platform == "tpu" and learn_dt else None)

    out = {
        "metric": "overall_steps_per_sec",
        "value": round(overall_sps, 1),
        "unit": "player-steps/s",
        "vs_baseline": round(overall_sps / BASELINE_SPS, 3),
        "collection_steps_per_sec": round(collect_sps, 1),
        "collection_vs_baseline": round(collect_sps / BASELINE_SPS, 3),
        "phases": phases,
        "bf16_inference": True,
        "mfu": {"policy_forward": round(mfu_policy, 4) if mfu_policy
                else None,
                "gae_update": round(mfu_learn, 4) if mfu_learn else None,
                "peak_ref": "v5e bf16 197 TFLOP/s, analytic MLP FLOPs"},
    }
    _append_history(out)
    print(json.dumps(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", action="store_true",
                    help="benchmark the SDF triangle-mesh world's "
                         "collection rate (north star >=1M sps)")
    args = ap.parse_args()
    if args.mesh:
        bench_mesh()
    else:
        main()
