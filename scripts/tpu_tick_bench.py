"""Bench: pallas fused tick vs XLA tick, both inside one jitted scan."""
import jax, jax.numpy as jnp
import numpy as np, time, sys
from rlgymppo_cpp_tpu.sim.arena import Arena, GameMode
from rlgymppo_cpp_tpu.sim.core_state import arena_state_to_core, controls_to_core
from rlgymppo_cpp_tpu.sim.state import CarControls
from rlgymppo_cpp_tpu.ops import pallas_tick

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
T = int(sys.argv[2]) if len(sys.argv) > 2 else 24   # ticks per jit call
ar = Arena(GameMode.SOCCAR, teams=(0, 1))
key = jax.random.PRNGKey(0)
st = ar.default_state(batch_shape=(N,))
st = ar.reset_to_random_kickoff(st, key)
Z = lambda: jnp.zeros((N, 2))
ctrl = CarControls(throttle=jnp.ones((N, 2)), steer=jnp.full((N, 2), 0.3),
    pitch=Z(), yaw=Z(), roll=Z(), jump=jnp.zeros((N, 2), bool),
    boost=jnp.ones((N, 2), bool), handbrake=jnp.zeros((N, 2), bool))
core = arena_state_to_core(st)
cctrl = controls_to_core(ctrl, 1)
keys = jax.random.split(jax.random.PRNGKey(7), T)
ridx_all = jnp.stack([ar._tick_respawn_idx(k, N) for k in keys])  # [T,P,N]

@jax.jit
def pallas_steps(core, cctrl, ridx_all):
    core, ev = pallas_tick.fused_ticks(ar, core, cctrl, ridx_all)
    return core

@jax.jit
def xla_steps(core, cctrl, ridx_all):
    def body(c, r):
        c, ev = ar._tick_core_inner(c, cctrl, r)
        return c, None
    core, _ = jax.lax.scan(body, core, ridx_all)
    return core

for name, fn in (("pallas", pallas_steps), ("xla", xla_steps)):
    t0 = time.time()
    out = fn(core, cctrl, ridx_all)
    jax.block_until_ready(jax.tree.leaves(out))
    print(f"{name}: compile+run {time.time()-t0:.1f}s")
    reps = 20
    t0 = time.time()
    c = core
    for _ in range(reps):
        c = fn(c, cctrl, ridx_all)
    jax.block_until_ready(jax.tree.leaves(c))
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms/{T}t  {N*T/dt/1e6:.2f}M ticks/s")
