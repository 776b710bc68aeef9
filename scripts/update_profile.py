"""Profile the fused train step's update-phase pieces on the real chip.

The r3 headline dropped to 1.73M sps under faithful 3-batch-window
economics. This script (a) times each candidate cost separately and (b)
rebuilds the fused step with one piece stubbed out at a time, so the
breakdown is measured, not derived.

Timing discipline for the tunneled TPU runtime: block_until_ready does
NOT reliably wait (small ops vanish into the dispatch queue; big chained
programs backpressure). Every timing here chains executions and syncs by
fetching a device SCALAR with float().

Run: python scripts/update_profile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "rlgymppo_tpu", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.gym import Gym
from rlgymppo_cpp_tpu.learn.config import LearnerConfig, PPOLearnerConfig
from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
from rlgymppo_cpp_tpu.learn import train_step as ts_mod
from rlgymppo_cpp_tpu.learn.train_step import make_train_step, init_fused_buffer
from rlgymppo_cpp_tpu.ops.gae import compute_gae
from rlgymppo_cpp_tpu.ops.welford import welford_init
from rlgymppo_cpp_tpu.ops import pallas_shuffle
from __graft_entry__ import _make_match


def sync(x):
    float(jnp.asarray(x).ravel()[0])


def timeit(name, fn, iters=5):
    sync(fn())   # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    platform = jax.devices()[0].platform
    num_envs = 8192 if platform == "tpu" else 64
    horizon = 32
    K = 3

    match = _make_match(team_size=1, spawn_opponents=True)
    gym = Gym(match, num_envs=num_envs, tick_skip=8)
    P, O = gym.num_players, gym.obs_size
    batch = horizon * num_envs * P
    total = K * batch
    print(f"platform={platform} envs={num_envs} batch={batch} "
          f"window={total}", flush=True)

    cfg = LearnerConfig(num_envs=num_envs)
    cfg.ppo = PPOLearnerConfig(batch_size=batch, epochs=1, mini_batch_size=0)
    cfg.exp_buffer_size = total
    ppo = PPOLearner(gym.obs_size, gym.action_amount, cfg.ppo)
    train_state = ppo.init(jax.random.PRNGKey(0))
    return_stats = welford_init(1)

    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    gym_state, obs = gym.reset(sub)

    def build_and_time(name, **patches):
        """Build the fused step with optional monkeypatches, time it."""
        saved = {}
        for mod, attr, repl in patches.get("patch", []):
            saved[(mod, attr)] = getattr(mod, attr)
            setattr(mod, attr, repl)
        try:
            step = make_train_step(gym, ppo, cfg, horizon, buffer_mult=K)
            buffer = init_fused_buffer(K, batch, gym.obs_size)
            state = dict(ts=train_state, g=gym_state, o=obs,
                         rs=return_stats, b=buffer, k=key)
            def once():
                state["k"], sub = jax.random.split(state["k"])
                out = step(state["ts"], state["g"], state["o"],
                           state["rs"], state["b"], sub)
                (state["ts"], state["g"], state["o"], state["rs"],
                 state["b"], m) = out
                return m["entropy"]
            for _ in range(K):   # fill window
                sync(once())
            return timeit(name, once)
        finally:
            for (mod, attr), v in saved.items():
                setattr(mod, attr, v)

    full = build_and_time("fused step FULL")

    # -- variant: shuffle replaced by identity (kills perm sort + gather)
    def ident_shuffle(fields, perm, R, interpret=False):
        return list(fields)

    def ident_gather(x, idx, R):
        return jax.lax.dynamic_slice_in_dim(x, 0, idx.shape[0] * R, 0)
    build_and_time("  - no shuffle",
                   patch=[(ts_mod, "block_shuffle", ident_shuffle),
                          (ts_mod, "block_gather", ident_gather)])

    # -- variant: optimizer work stubbed (keeps rollout+GAE+shuffle)
    real_tb = type(ppo)._train_batch
    def stub_tb(self, tstate, b):
        zero = {k: jnp.zeros(()) for k in
                ("entropy", "kl", "ratio", "value_loss", "clip_fraction")}
        # touch the batch so the shuffle isn't dead-coded
        zero["entropy"] = jnp.mean(b["advantages"]) * 1e-9
        return tstate, zero
    build_and_time("  - no train_batch (rollout+GAE+shuffle)",
                   patch=[(type(ppo), "_train_batch", stub_tb)])

    # -- pieces
    window = {
        "states": jnp.zeros((total, O), jnp.float32),
        "actions": jnp.zeros((total,), jnp.int32),
        "log_probs": jnp.zeros((total,), jnp.float32),
        "values": jnp.zeros((total,), jnp.float32),
        "advantages": jnp.zeros((total,), jnp.float32),
    }
    window = {k: jax.random.normal(jax.random.PRNGKey(5), v.shape)
              .astype(v.dtype) if v.dtype == jnp.float32 else v
              for k, v in window.items()}

    R = cfg.ppo.shuffle_block_rows
    nb = total // R
    perm = jax.random.permutation(jax.random.PRNGKey(2), nb)
    keys_sorted = sorted(window.keys())

    shuf_fn = jax.jit(lambda w, p: pallas_shuffle.block_shuffle(
        [w[f] for f in keys_sorted], p, R)[0])
    timeit("jnp block_shuffle (all fields)",
           lambda: shuf_fn(window, perm))

    gath_fn = jax.jit(lambda w, p: jax.tree.map(
        lambda x: x.reshape(nb, R, *x.shape[1:])[p]
        .reshape(total, *x.shape[1:]), w)["states"])
    timeit("jnp block gather (all fields)", lambda: gath_fn(window, perm))

    perm_fn = jax.jit(
        lambda k: jax.random.permutation(jax.random.fold_in(
            jax.random.PRNGKey(0), k[0]), nb))
    state_p = {"p": perm}
    timeit("random.permutation (blocks)",
           lambda: perm_fn(state_p["p"]))

    one_batch = jax.tree.map(lambda x: x[:batch], window)

    # Consume the UPDATED train state too — fetching only a forward-pass
    # metric lets XLA dead-code the whole backward+optimizer (this very
    # script under-reported _train_batch 7 ms vs ~28 ms real).
    def tb_full(ts, b):
        ts2, m = ppo._train_batch(ts, b)
        probe = sum(jnp.sum(l) for l in jax.tree.leaves(ts2["policy"]))
        return m["entropy"] + probe * 1e-20
    tb_fn = jax.jit(tb_full)
    tb = timeit("_train_batch fwd+bwd+opt (1 of K)",
                lambda: tb_fn(train_state, one_batch))
    print(f"{'  -> x K batches':44s} {tb*K*1e3:9.2f} ms")

    # bf16 matmul variant (autocastLearn analog)
    import dataclasses
    bf_ppo = PPOLearner(gym.obs_size, gym.action_amount,
                        dataclasses.replace(cfg.ppo, bf16_learn=True))
    tbf_fn = jax.jit(lambda ts, b: (
        lambda ts2, m: m["entropy"] + sum(
            jnp.sum(l) for l in jax.tree.leaves(ts2["policy"])) * 1e-20
    )(*bf_ppo._train_batch(ts, b)))
    tbf = timeit("_train_batch bf16_learn (1 of K)",
                 lambda: tbf_fn(train_state, one_batch))
    print(f"{'  -> x K batches (bf16)':44s} {tbf*K*1e3:9.2f} ms")

    T, B = horizon, num_envs * P
    obs_seq = jax.random.normal(jax.random.PRNGKey(6), (T + 1, B, O))
    rewards = jnp.zeros((T, B), jnp.float32)
    dones = jnp.zeros((T, B), jnp.float32)

    @jax.jit
    def gae_fn(vp, obs_seq):
        values = ppo.value_net.forward(vp, obs_seq)
        adv, tgt, ret = compute_gae(rewards, dones, dones, values,
                                    cfg.gae_gamma, cfg.gae_lambda, 1.0, 10.0)
        return adv.sum()
    timeit("GAE critic fwd + scan", lambda: gae_fn(train_state["value"],
                                                   obs_seq))

    from rlgymppo_cpp_tpu.learn.rollout import RolloutCollector
    collector = RolloutCollector(gym, ppo.policy)
    cstate = {"g": gym_state, "o": obs, "k": key}
    def run_collect():
        cstate["k"], sub = jax.random.split(cstate["k"])
        cstate["g"], cstate["o"], traj, _ = collector.collect(
            train_state["policy"], cstate["g"], cstate["o"], sub, horizon)
        return traj["rewards"]
    col = timeit("collection alone", run_collect)
    print(f"{'derived update (full - collect)':44s} "
          f"{(full-col)*1e3:9.2f} ms")
    print(f"overall sps at FULL: {batch/full:,.0f}")


if __name__ == "__main__":
    main()
