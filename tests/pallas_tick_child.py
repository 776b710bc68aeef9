"""Child process for tests/test_pallas_tick.py: runs the fused-tick
parity check on a single-device CPU backend (the parent suite forces 8
virtual devices, which slows the interpret-mode Pallas build ~8x)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "").replace(
    "--xla_force_host_platform_device_count=8", "").strip()

import numpy as np          # noqa: E402
import jax                  # noqa: E402
import jax.numpy as jnp     # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rlgymppo_cpp_tpu.sim.arena import Arena, GameMode              # noqa: E402
from rlgymppo_cpp_tpu.sim.core_state import (arena_state_to_core,   # noqa: E402
                                             controls_to_core)
from rlgymppo_cpp_tpu.sim.state import CarControls                  # noqa: E402
from rlgymppo_cpp_tpu.ops import pallas_tick                        # noqa: E402


def main():
    n, num_ticks = 8, 2
    ar = Arena(GameMode.SOCCAR, teams=(0, 1))
    key = jax.random.PRNGKey(0)
    st = ar.default_state(batch_shape=(n,))
    st = ar.reset_to_random_kickoff(st, key)
    k1, k2 = jax.random.split(jax.random.fold_in(key, 1))
    ctrl = CarControls(
        throttle=jnp.ones((n, 2)),
        steer=jax.random.uniform(k1, (n, 2), minval=-1.0, maxval=1.0),
        pitch=jnp.zeros((n, 2)),
        yaw=jnp.zeros((n, 2)),
        roll=jnp.zeros((n, 2)),
        jump=jax.random.bernoulli(k2, 0.3, (n, 2)),
        boost=jnp.ones((n, 2), bool),
        handbrake=jnp.zeros((n, 2), bool))
    core = arena_state_to_core(st)
    cctrl = controls_to_core(ctrl, 1)
    keys = jax.random.split(jax.random.PRNGKey(7), num_ticks)
    ridx_all = jnp.stack([ar._tick_respawn_idx(k, n) for k in keys])

    @jax.jit
    def ref_fn(core, cctrl, ridx_all):
        acc = None
        for t in range(num_ticks):
            core, ev = ar._tick_core_inner(core, cctrl, ridx_all[t])
            if acc is None:
                acc = dict(ev)
            else:
                acc = {k: (acc[k] | ev[k]) if ev[k].dtype == jnp.bool_
                       else acc[k] + ev[k] for k in ev}
        return core, acc

    ref_core, ref_ev = ref_fn(core, cctrl, ridx_all)
    got_core, got_ev = pallas_tick.fused_ticks(
        ar, core, cctrl, ridx_all, interpret=True)

    for a, b in zip(jax.tree.leaves(ref_core), jax.tree.leaves(got_core)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape, (a.shape, b.shape)
        if a.dtype == np.float32:
            np.testing.assert_allclose(b, a, rtol=2e-6, atol=2e-5)
        else:
            np.testing.assert_array_equal(b, a)
    for k in ref_ev:
        np.testing.assert_array_equal(
            np.asarray(got_ev[k]), np.asarray(ref_ev[k]), err_msg=k)
    print("PALLAS_TICK_PARITY_OK")


if __name__ == "__main__":
    main()
