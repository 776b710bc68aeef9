"""Micro-bench: shuffled-window gather variants on TPU.

Measurement discipline for the tunneled TPU runtime: block_until_ready
does NOT reliably wait (small ops disappear into the dispatch queue), so
each timing chains N executions output->input and then fetches a tiny
ON-DEVICE scalar with float() — a real sync — while never pulling a big
buffer to host (that costs seconds over the tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "rlgymppo_tpu", "jax"))

import jax
import jax.numpy as jnp

TOTAL = 3 * 524_288
O = 89

_scal = jax.jit(lambda x: x.ravel()[0] + x.ravel()[-1])


def timeit(name, fn, x, iters=20, bytes_moved=None):
    y = fn(x)
    float(_scal(y))           # warm + sync
    t0 = time.perf_counter()
    z = x
    for _ in range(iters):
        z = fn(z)
    float(_scal(z))           # sync via device scalar fetch
    dt = (time.perf_counter() - t0) / iters * 1e3
    gb = (bytes_moved or TOTAL * O * 4 * 2) / 1e9
    print(f"{name:42s} {dt:8.2f} ms   {gb/dt*1e3:7.1f} GB/s")
    return dt


def main():
    x = jax.random.normal(jax.random.PRNGKey(9), (TOTAL, O), jnp.float32)
    timeit("copy (x+1)", jax.jit(lambda x: x + 1.0), x)

    for R in (1, 128, 512, 4096):
        nb = TOTAL // R
        perm = jax.random.permutation(jax.random.PRNGKey(0), nb)
        f3 = jax.jit(lambda x, nb=nb, R=R, p=perm:
                     x.reshape(nb, R, O)[p].reshape(TOTAL, O))
        timeit(f"[nb,R,O] gather      R={R:5d}", f3, x)

    # permutation generation cost (chained: key folds in the prior perm)
    for n in (12288, TOTAL):
        pf = jax.jit(lambda p, n=n: jax.random.permutation(
            jax.random.fold_in(jax.random.PRNGKey(0), p[0]), n))
        p0 = jnp.arange(n)
        y = pf(p0)
        float(_scal(y))
        t0 = time.perf_counter()
        z = p0
        for _ in range(20):
            z = pf(z)
        float(_scal(z))
        print(f"random.permutation n={n:8d}           "
              f"{(time.perf_counter()-t0)/20*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
