"""Stub-variant profile of the physics tick on the real chip.

The tick scan is now the dominant phase of the fused train step (~92 ms
of a 160 ms iteration at 8192 envs; bench.py phases). This script times
the full 256-tick scan, then re-times it with each phase of
Arena._tick_core_inner monkeypatched to a shape-preserving stub — the
delta attributes device time per phase (XLA DCE of a stubbed phase's
inputs included, which is the point: it measures what REMOVING the phase
would buy).

Timing discipline: chain iterations, sync by fetching a device scalar
(block_until_ready is not a reliable barrier on the tunneled runtime).

Run: python scripts/tick_profile.py [num_envs]
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
from rlgymppo_cpp_tpu.sim import arena as arena_mod
from rlgymppo_cpp_tpu.sim import core_car, core_ball, core_pads
from rlgymppo_cpp_tpu.sim import core_collisions as core_col
from rlgymppo_cpp_tpu.sim.core_state import (
    arena_state_to_core, controls_to_core,
)
from rlgymppo_cpp_tpu.sim.state import CarControls
from rlgymppo_cpp_tpu.maths.v3 import V3


def sync(x):
    float(jnp.asarray(x).ravel()[0])


def main():
    platform = jax.devices()[0].platform
    N = int(sys.argv[1]) if len(sys.argv) > 1 else (
        8192 if platform == "tpu" else 64)
    TICKS = 256 if platform == "tpu" else 8

    ar = Arena(GameMode.SOCCAR, teams=(0, 1))
    key = jax.random.PRNGKey(0)
    st = ar.default_state(batch_shape=(N,))
    st = ar.reset_to_random_kickoff(st, key)
    Z = lambda: jnp.zeros((N, 2))
    ctrl = CarControls(
        throttle=jnp.ones((N, 2)), steer=jnp.full((N, 2), 0.3),
        pitch=Z(), yaw=Z(), roll=Z(), jump=jnp.zeros((N, 2), bool),
        boost=jnp.ones((N, 2), bool), handbrake=jnp.zeros((N, 2), bool))
    core = arena_state_to_core(st)
    cctrl = controls_to_core(ctrl, 1)
    keys = jax.random.split(jax.random.PRNGKey(7), TICKS)
    ridx_all = jnp.stack([ar._tick_respawn_idx(k, N) for k in keys])

    def build():
        @jax.jit
        def scan(core, cctrl, ridx_all):
            def body(c, r):
                c, _ = ar._tick_core_inner(c, cctrl, r)
                return c, None
            core, _ = jax.lax.scan(body, core, ridx_all)
            return core.ball.pos.x
        return scan

    def timeit(name, patches=()):
        saved = {}
        for mod, attr, repl in patches:
            saved[(mod, attr)] = getattr(mod, attr)
            setattr(mod, attr, repl)
        try:
            fn = build()
            sync(fn(core, cctrl, ridx_all))
            t0 = time.perf_counter()
            n = 5
            for _ in range(n):
                out = fn(core, cctrl, ridx_all)
            sync(out)
            dt = (time.perf_counter() - t0) / n
            per_tick = dt / TICKS
            print(f"{name:42s} {dt*1e3:8.2f} ms  "
                  f"({per_tick*1e6:7.1f} us/tick)", flush=True)
            return dt
        finally:
            for (mod, attr), v in saved.items():
                setattr(mod, attr, v)

    full = timeit("FULL tick scan")

    # --- stubs (shape-preserving; keep a hair of input use so upstream
    # producers aren't the thing being measured) ---
    def stub_car_pre(cars, wheels, controls, geom, cfg, mut, dt,
                     respawn, geom_ctx=None):
        zero3 = V3(jnp.zeros_like(cars.boost), jnp.zeros_like(cars.boost),
                   jnp.zeros_like(cars.boost))
        active = ~cars.is_demoed
        return cars, wheels, zero3, active
    timeit("  - car_pre_tick (vehicle sim)",
           [(core_car, "car_pre_tick", stub_car_pre)])

    def stub_cw(cars, geom, mut, ii, half, off, dt, active,
                geom_ctx=None):
        z = jnp.zeros_like(cars.boost)
        z3 = V3(z, z, z)
        return z3, z3, z3, jnp.zeros_like(cars.is_demoed), z3
    timeit("  - car_world_contacts",
           [(core_col, "car_world_contacts", stub_cw)])

    real_cc = core_col.car_car_contacts
    def stub_cc(cars, mut, ii, half, off, dt, active, teams):
        out = real_cc(cars, mut, ii, half, off, dt, active, teams)
        z = jnp.zeros_like(cars.boost)
        z3 = V3(z, z, z)
        return {**out, "dvel": z3, "dang": z3, "dpos": z3}
    # full removal instead: replace with zero dict of same structure
    def stub_cc_full(cars, mut, ii, half, off, dt, active, teams):
        z = jnp.zeros_like(cars.boost)
        z3 = V3(z, z, z)
        f = jnp.zeros_like(cars.is_demoed)
        return {"dvel": z3, "dang": z3, "dpos": z3, "demo": f[None] &
                f[:, None], "bump": f[None] & f[:, None],
                "bumper_other": jnp.zeros_like(cars.car_contact_other_idx),
                "bumper_cooldown":
                    jnp.zeros_like(cars.car_contact_cooldown_timer),
                "victim_impulse": z3}
    timeit("  - car_car_contacts",
           [(core_col, "car_car_contacts", stub_cc_full)])

    real_cb = core_col.car_ball_contacts
    def stub_cb(cars, ball, mut, gm, ii, half, off, dt, active, tick):
        z = jnp.zeros_like(cars.boost)
        z3 = V3(z, z, z)
        zb = jnp.zeros_like(ball.pos.x)
        zb3 = V3(zb, zb, zb)
        hit = jnp.zeros_like(cars.is_demoed)
        return (z3, z3, zb3, zb3, zb3, zb3, hit, cars.ball_hit_info)
    def stub_cb2(cars, ball, mut, gm, ii, half, off, dt, active, tick):
        out = real_cb(cars, ball, mut, gm, ii, half, off, dt, active, tick)
        return out
    try:
        timeit("  - car_ball_contacts",
               [(core_col, "car_ball_contacts", stub_cb)])
    except Exception as e:
        print(f"  - car_ball_contacts stub failed: {str(e)[:120]}")

    def stub_bw(ball, geom, mut, dt, sleeping, gm):
        zb = jnp.zeros_like(ball.pos.x)
        zb3 = V3(zb, zb, zb)
        return zb3, zb3, zb3, jnp.zeros_like(sleeping), zb3
    timeit("  - ball_world_contact",
           [(core_ball, "ball_world_contact", stub_bw)])

    def stub_pads_check(pads, cars, active, pcfg, half, off):
        return pads
    def stub_pads_post(pads, boost, mut, pcfg):
        return pads, boost, jnp.zeros(boost.shape, jnp.int32)
    timeit("  - boost pads",
           [(core_pads, "pads_check_collide", stub_pads_check),
            (core_pads, "pads_post_tick", stub_pads_post)])

    def stub_post(cars, controls, dt):
        return cars
    timeit("  - car_post_tick", [(core_car, "car_post_tick", stub_post)])


if __name__ == "__main__":
    main()
