"""Micro-probe: which mesh-world component burns the time at 8192 envs.

mesh_profile.py's nogather variant showed gathers are only ~18% of the
mesh world's cost at 8192 envs — the vector math (or the XLA schedule
around it) dominates. This times each query type standalone at tick
shapes ([P=2, N]) and a full arena tick, so the 4ms/tick mesh overhead
can be attributed line-by-line.

Also times _row_eval on pre-gathered rows in two layouts:
  rows-minor   [P, N, 32]  (current: 32-wide minor dim on the lane axis)
  rows-major   [32, P, N]  (component-major: every row[c] slice is free)

Usage: python scripts/mesh_micro.py [--envs 8192]
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


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=8192)
    args = ap.parse_args()
    N, P = args.envs, 2

    from rlgymppo_cpp_tpu.maths.v3 import V3
    from rlgymppo_cpp_tpu.sim.soccar_mesh import make_soccar_mesh_geom
    from rlgymppo_cpp_tpu.sim.arena import Arena
    from rlgymppo_cpp_tpu.sim.state import CarControls

    geom = make_soccar_mesh_geom()
    key = jax.random.PRNGKey(0)

    def rand_pos(key):
        ks = jax.random.split(key, 3)
        return V3(jax.random.uniform(ks[0], (P, N), minval=-4000, maxval=4000),
                  jax.random.uniform(ks[1], (P, N), minval=-5000, maxval=5000),
                  jax.random.uniform(ks[2], (P, N), minval=17., maxval=1900.))

    pos = rand_pos(key)
    down = V3(jnp.zeros((P, N)), jnp.zeros((P, N)),
              jnp.full((P, N), -1.0))

    res = {}

    # a) one full-context query: ctx gather + eval (corner-style)
    @jax.jit
    def one_eval(p):
        ctx = geom.local_ctx_core(p, for_car=True)
        d, n = geom.eval_local_core(ctx, p)
        return d + n.x

    res["ctx+eval x1"] = bench(one_eval, pos)

    # b) car corner block: 2 ctx rows + 8 local evals (as in
    #    core_collisions.car_world_contacts)
    @jax.jit
    def corner_block(p):
        ctx = geom.local_ctx_core(p, for_car=True)
        acc = jnp.zeros((P, N))
        for sx in (-1.0, 1.0):
            for sy in (-1.0, 1.0):
                for sz in (-1.0, 1.0):
                    q = V3(p.x + 60 * sx, p.y + 40 * sy, p.z + 18 * sz)
                    d, n = geom.eval_local_core(ctx, q)
                    acc += d + n.z
        return acc

    res["ctx+eval x8 (corners)"] = bench(corner_block, pos)

    # c) wheel rays: 4 raycast_core
    @jax.jit
    def wheels(p):
        acc = jnp.zeros((P, N))
        for ox, oy in ((51, 30), (51, -30), (-33, 29), (-33, -29)):
            start = V3(p.x + ox, p.y + oy, p.z)
            hit, t, n = geom.raycast_core(start, down, 70.0, for_car=True)
            acc += t + n.z
        return acc

    res["raycast x4 (wheels)"] = bench(wheels, pos)

    # d) ball sample (sphere_contact_core)
    @jax.jit
    def ball(p):
        d, n = geom.sphere_contact_core(p, 93.15)
        return d + n.z

    res["ball sample x1"] = bench(ball, pos)

    # e) _row_eval math only, rows pre-gathered, [P, N, 32] layout
    rows = jax.random.normal(key, (P, N, 32))
    t3 = jax.random.uniform(key, (3, P, N))

    @jax.jit
    def row_eval_minor(rows, t3):
        d, (nx, ny, nz) = geom._row_eval(rows, t3[0], t3[1], t3[2])
        return d + nx + ny + nz

    res["_row_eval [P,N,32]"] = bench(row_eval_minor, rows, t3)

    # f) same math, component-major [32, P, N] rows
    rows_major = jnp.moveaxis(rows, -1, 0)

    class _Shim:
        pass

    @jax.jit
    def row_eval_major(rm, t3):
        class R:
            def __getitem__(self, idx):
                return rm[idx[-1]]
        d, (nx, ny, nz) = geom._row_eval(R(), t3[0], t3[1], t3[2])
        return d + nx + ny + nz

    res["_row_eval [32,P,N]"] = bench(row_eval_major, rows_major, t3)

    # g) the gather alone
    idx = jax.random.randint(key, (P, N), 0, geom._packed_full.shape[0])

    @jax.jit
    def gather_only(idx):
        return jnp.take(geom._packed_full, idx, axis=0).sum(-1)

    res["row gather x1"] = bench(gather_only, idx)

    # h) full arena ticks, mesh vs plane (8 ticks like one env step)
    for name, g in (("mesh", geom), ("plane", None)):
        arena = Arena(geom=g)
        st = arena.default_state((N,))
        st = arena.reset_to_random_kickoff(st, jax.random.PRNGKey(1))
        controls = CarControls.zeros((N, arena.num_players))

        @jax.jit
        def step8(s, k):
            s, _ = arena.step(s, controls, k, 8)
            return s

        s2 = step8(st, jax.random.PRNGKey(2))
        jax.block_until_ready(s2.ball.pos)
        dt = bench(lambda: step8(st, jax.random.PRNGKey(2)), iters=10)
        res[f"arena.step x8 ({name})"] = dt

    for k, v in res.items():
        print(json.dumps({"what": k, "ms": round(v * 1e3, 3)}))


if __name__ == "__main__":
    main()
