"""Child process for the 2-process multi-host test (test_multihost.py).

Each process sees 4 virtual CPU devices; jax.distributed joins them into
one 8-device runtime. Both processes build the same globally-shaped env
batch, contribute their local_env_slice via make_global_env_tree, run ONE
fused train step over the (env, model) mesh, and process 0 writes the
resulting policy params + entropy to an npz for the parent to compare
against the single-process result.

Usage: python multihost_child.py <coordinator> <num_procs> <proc_id> <out>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    + os.environ.get("XLA_FLAGS", ""))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    coordinator, n_proc, pid, out = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    jax.distributed.initialize(coordinator, n_proc, pid,
                               local_device_ids=list(range(4)))
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.devices()) == 4 * n_proc

    from tests.multihost_common import run_one_fused_step

    entropy, params_flat = run_one_fused_step()
    if jax.process_index() == 0:
        np.savez(out, entropy=entropy, params=params_flat)
        print("multihost child 0: wrote", out)
    # keep the runtime alive until everyone is done
    jax.experimental.multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    import jax.experimental.multihost_utils  # noqa: F401
    main()
