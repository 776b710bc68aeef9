"""Hardened stub-variant profile of the SDF mesh world's tick scan.

Replaces scripts/mesh_profile.py's collection-level variants, whose
timings predate the sync discipline (block_until_ready is not a reliable
barrier on the tunneled runtime — its plane-world number reads 9x slower
than bench.py's for the same shape). This probes the raw 256-tick scan
like scripts/tick_profile.py: chain iterations, fetch a device scalar.

Variants isolate the mesh world's cost structure:
  plane      analytic plane geom (lower bound, zero mesh cost)
  mesh FULL  the real SDF world
  uniform-gather   every packed-row gather indexes row 0 (same vector
             math + gather op shape, no random access)
  no-gather  rows replaced by a broadcast constant (no gather at all)
  dist-march-0     RAY_STEPS = 0 (no in-register march iterations)

Run: python scripts/mesh_tick_profile.py [num_envs]
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

from rlgymppo_cpp_tpu.sim.arena import Arena, GameMode
from rlgymppo_cpp_tpu.sim import mesh_geom as mg
from rlgymppo_cpp_tpu.sim.soccar_mesh import make_soccar_mesh_geom
from rlgymppo_cpp_tpu.sim.core_state import (
    arena_state_to_core, controls_to_core,
)
from rlgymppo_cpp_tpu.sim.state import CarControls


def sync(x):
    float(jnp.asarray(x).ravel()[0])


def main():
    platform = jax.devices()[0].platform
    N = int(sys.argv[1]) if len(sys.argv) > 1 else (
        8192 if platform == "tpu" else 32)
    TICKS = 256 if platform == "tpu" else 4

    def setup(geom):
        ar = Arena(GameMode.SOCCAR, teams=(0, 1), geom=geom)
        st = ar.default_state(batch_shape=(N,))
        st = ar.reset_to_random_kickoff(st, jax.random.PRNGKey(0))
        Z = lambda: jnp.zeros((N, 2))
        ctrl = CarControls(
            throttle=jnp.ones((N, 2)), steer=jnp.full((N, 2), 0.3),
            pitch=Z(), yaw=Z(), roll=Z(), jump=jnp.zeros((N, 2), bool),
            boost=jnp.ones((N, 2), bool), handbrake=jnp.zeros((N, 2), bool))
        core = arena_state_to_core(st)
        cctrl = controls_to_core(ctrl, 1)
        keys = jax.random.split(jax.random.PRNGKey(7), TICKS)
        ridx = jnp.stack([ar._tick_respawn_idx(k, N) for k in keys])
        return ar, core, cctrl, ridx

    def timeit(name, ar, core, cctrl, ridx):
        @jax.jit
        def scan(core, cctrl, ridx):
            def body(c, r):
                c, _ = ar._tick_core_inner(c, cctrl, r)
                return c, None
            core, _ = jax.lax.scan(body, core, ridx)
            return core.ball.pos.x
        sync(scan(core, cctrl, ridx))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            n = 3
            for _ in range(n):
                out = scan(core, cctrl, ridx)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / n)
        sps = N * 2 * TICKS / 8 / best   # player-steps at tick_skip 8
        print(f"{name:40s} {best*1e3:8.2f} ms ({best/TICKS*1e6:6.1f}"
              f" us/tick, ~{sps/1e3:7.0f}k sps)", flush=True)
        return best

    ar, core, cctrl, ridx = setup(None)
    timeit("plane geom", ar, core, cctrl, ridx)

    geom = make_soccar_mesh_geom()
    args = setup(geom)
    timeit("mesh FULL", *args)

    # uniform gather: same take op, index 0 (kills random access only)
    real_take = jnp.take
    orig_local = mg.MeshGeom.local_ctx_core
    orig_grid = mg.MeshGeom._grid_coords

    def local_uniform(self, pos, for_car=False):
        ctx = orig_local(self, pos, for_car)
        return ctx
    def grid_zero(self, pos):
        f, flat_idx, t = orig_grid(self, pos)
        return f, jnp.zeros_like(flat_idx), t

    class _Zeroed:
        def __enter__(self):
            self.saved = mg.MeshGeom._grid_coords
            self.saved_l = mg.MeshGeom.local_ctx_core
            def local_zero(geo, pos, for_car=False):
                fx, fy, fz = geo._coords_core(pos)
                flat = jnp.zeros(fx.shape, jnp.int32)
                ctx = {"row": jnp.take(geo._packed_full, flat, axis=0),
                       "ox": jnp.floor(fx), "oy": jnp.floor(fy),
                       "oz": jnp.floor(fz)}
                return ctx
            mg.MeshGeom._grid_coords = grid_zero
            mg.MeshGeom.local_ctx_core = local_zero
        def __exit__(self, *a):
            mg.MeshGeom._grid_coords = self.saved
            mg.MeshGeom.local_ctx_core = self.saved_l

    with _Zeroed():
        args2 = setup(geom)
        timeit("mesh, uniform index-0 gathers", *args2)

    # no gather at all: rows become a broadcast constant
    class _NoGather:
        def __enter__(self):
            self.saved = mg.MeshGeom._grid_coords
            self.saved_l = mg.MeshGeom.local_ctx_core
            def local_const(geo, pos, for_car=False):
                fx, fy, fz = geo._coords_core(pos)
                row = jnp.broadcast_to(geo._packed_full[0],
                                       fx.shape + (32,))
                return {"row": row, "ox": jnp.floor(fx),
                        "oy": jnp.floor(fy), "oz": jnp.floor(fz)}
            def grid_const(geo, pos):
                f, flat_idx, t = orig_grid(geo, pos)
                return f, flat_idx * 0, t
            mg.MeshGeom.local_ctx_core = local_const
            mg.MeshGeom._grid_coords = grid_const
        def __exit__(self, *a):
            mg.MeshGeom._grid_coords = self.saved
            mg.MeshGeom.local_ctx_core = self.saved_l

    with _NoGather():
        args3 = setup(geom)
        timeit("mesh, broadcast-row (no ctx gather)", *args3)

    # RAY_STEPS = 0
    saved_steps = mg.MeshGeom.RAY_STEPS
    mg.MeshGeom.RAY_STEPS = 0
    try:
        args4 = setup(geom)
        timeit("mesh, RAY_STEPS=0", *args4)
    finally:
        mg.MeshGeom.RAY_STEPS = saved_steps


if __name__ == "__main__":
    main()
