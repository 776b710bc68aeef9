"""On-chip validation + timing of fused_mlp_sample's hardware-PRNG branch.

The CPU test suite pins the sampling kernel's selection/log-prob math via
interpret mode with injected Gumbel noise (tests/test_pallas_mlp.py); the
pltpu.prng_random_bits branch only exists compiled, so this probe runs it
on the real chip:

  1. distribution: one obs row repeated N times, empirical action
     frequencies vs the probs kernel's categorical in total variation;
  2. determinism: same key -> same actions; different key -> different;
  3. log-prob consistency at the sampled actions;
  4. timing: get_action scan (fused sample kernel) vs the probs+categorical
     path, plus analytic-FLOP MFU.

Run: python scripts/probe_sample_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "rlgymppo_tpu", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.models.discrete_policy import (
    ACTION_MIN_PROB, DiscretePolicy)
from rlgymppo_cpp_tpu.ops.pallas_mlp import fused_mlp_probs, fused_mlp_sample


def sync(x):
    float(jnp.sum(x.astype(jnp.float32)))


def timeit(f, n=5):
    sync(f())
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    assert jax.devices()[0].platform == "tpu", "needs the real chip"
    B, O, A, H = 16384, 89, 90, 32
    pol = DiscretePolicy(O, A)
    params = pol.init(jax.random.PRNGKey(0))
    bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    obs = jax.random.normal(jax.random.PRNGKey(1), (B, O), jnp.float32)

    # 1. distribution (temperature 0.5 so probs are non-trivial)
    rep = jnp.tile(obs[:1], (B, 1))
    p = np.asarray(fused_mlp_probs(params, rep[:1], temperature=0.5))[0]
    act, lp = fused_mlp_sample(params, rep, jax.random.PRNGKey(5),
                               temperature=0.5)
    counts = np.bincount(np.asarray(act), minlength=A)[:A]
    tv = 0.5 * np.abs(counts / B - p).sum()
    print(f"TV(empirical, probs) @ N={B}: {tv:.4f}  (noise floor ~0.04, "
          f"uniform-bug ~0.3+)")
    assert tv < 0.1, tv

    # 2. determinism / key sensitivity
    a1, _ = fused_mlp_sample(params, rep, jax.random.PRNGKey(5),
                             temperature=0.5)
    a2, _ = fused_mlp_sample(params, rep, jax.random.PRNGKey(6),
                             temperature=0.5)
    same = np.mean(np.asarray(act) == np.asarray(a1))
    diff = np.mean(np.asarray(act) == np.asarray(a2))
    print(f"same-key replay agreement: {same:.3f} (want 1.0); "
          f"cross-key agreement: {diff:.3f} (want << 1)")
    assert same == 1.0 and diff < 0.9

    # 3. log-prob consistency on real obs
    probs = np.asarray(fused_mlp_probs(params, obs,
                                       min_prob=ACTION_MIN_PROB))
    act, lp = fused_mlp_sample(params, obs, jax.random.PRNGKey(7),
                               min_prob=ACTION_MIN_PROB)
    act, lp = np.asarray(act), np.asarray(lp)
    want = np.log(probs[np.arange(B), act])
    err = np.abs(lp - want).max()
    print(f"log-prob max |err| vs probs kernel: {err:.2e}")
    assert err < 1e-4, err

    # 4. timing: full get_action scan, sample kernel vs probs+categorical
    def scan_of(fn):
        @jax.jit
        def run(o, k):
            def body(c, _):
                o, k = c
                k, s = jax.random.split(k)
                a, _lp = fn(o, s)
                return (o + a[:, None].astype(jnp.float32) * 1e-9, k), ()
            (o, _), _ = jax.lax.scan(body, (o, k), None, length=H)
            return o
        return run

    def kern(o, s):
        return fused_mlp_sample(bf16, o, s, min_prob=ACTION_MIN_PROB)

    def old(o, s):
        probs = fused_mlp_probs(bf16, o, min_prob=ACTION_MIN_PROB)
        logits = jnp.log(probs)
        a = jax.random.categorical(s, logits, axis=-1)
        lp2 = jnp.take_along_axis(logits, a[:, None], axis=-1)[..., 0]
        return a, lp2

    FL = 2 * (O * 256 + 256 * 256 + 256 * 256 + 256 * A) * B
    for name, fn in (("sample-kernel", kern), ("probs+categorical", old)):
        t = timeit(lambda f=scan_of(fn): f(obs, jax.random.PRNGKey(9)))
        us = t / H * 1e6
        mfu = FL / (t / H) / 197e12
        print(f"{name:18s}: {us:6.0f} us/forward   MFU {mfu:.3f}")


if __name__ == "__main__":
    main()
