import jax, jax.numpy as jnp
import numpy as np, time, sys
from rlgymppo_cpp_tpu.sim.arena import Arena, GameMode
from rlgymppo_cpp_tpu.sim.core_state import arena_state_to_core, controls_to_core
from rlgymppo_cpp_tpu.sim.state import CarControls
from rlgymppo_cpp_tpu.ops import pallas_tick

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1
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
ridx_all = jnp.stack([ar._tick_respawn_idx(k, N) for k in keys])

t0 = time.time()
new_core, ev = pallas_tick.fused_ticks(ar, core, cctrl, ridx_all, interpret=False)
jax.block_until_ready(jax.tree.leaves(new_core))
print("compiled+ran in %.1fs" % (time.time() - t0))

@jax.jit
def ref_fn(core, cctrl, ridx_all):
    c = core
    acc = None
    for t in range(T):
        c, ev = ar._tick_core_inner(c, cctrl, ridx_all[t])
        acc = dict(ev) if acc is None else {k: (acc[k]|ev[k]) if ev[k].dtype==jnp.bool_ else acc[k]+ev[k] for k in ev}
    return c, acc
rc, rev = ref_fn(core, cctrl, ridx_all)
bad, worst = 0, 0.0
for a, b in zip(jax.tree.leaves(rc), jax.tree.leaves(new_core)):
    a, b = np.asarray(a), np.asarray(b)
    if not np.array_equal(a, b):
        bad += 1
        worst = max(worst, float(np.max(np.abs(a.astype(np.float64)-b.astype(np.float64)))))
print("TPU parity: bad leaves", bad, "worst", worst)
for k in rev:
    ok = np.array_equal(np.asarray(rev[k]), np.asarray(ev[k]))
    print(k, ok)

# timing: pallas vs plain jnp path
fused = jax.jit(lambda c, cc, r: pallas_tick.fused_ticks(ar, c, cc, r))
fused(core, cctrl, ridx_all)
reps = 50
jax.block_until_ready(jax.tree.leaves(ref_fn(core, cctrl, ridx_all)[0]))
t0 = time.time()
c = core
for _ in range(reps):
    c, _e = fused(c, cctrl, ridx_all)
jax.block_until_ready(jax.tree.leaves(c))
dt_pallas = (time.time() - t0) / reps
t0 = time.time()
c = core
for _ in range(reps):
    c, _e = ref_fn(c, cctrl, ridx_all)
jax.block_until_ready(jax.tree.leaves(c))
dt_xla = (time.time() - t0) / reps
tps_p = N * T / dt_pallas
tps_x = N * T / dt_xla
print(f"pallas: {dt_pallas*1e3:.2f} ms/{T}ticks = {tps_p/1e6:.2f}M arena-ticks/s")
print(f"xla:    {dt_xla*1e3:.2f} ms/{T}ticks = {tps_x/1e6:.2f}M arena-ticks/s")
print(f"speedup: {dt_xla/dt_pallas:.2f}x")
