"""Multi-host runtime initialization.

The reference has no distributed backend at all (SURVEY.md §2.6); this is
the TPU-native replacement's host-level entry: `jax.distributed` brings up
the cross-host runtime (coordinator discovery on TPU pods is automatic),
after which `jax.devices()` spans the slice and the (env, model) mesh of
parallel/mesh.py shards envs across every chip with gradient psums riding
ICI within a slice and DCN across slices.

Typical pod-slice usage:

    from rlgymppo_cpp_tpu.parallel import distributed, make_mesh
    distributed.initialize()          # no-op on a single host
    mesh = make_mesh()                # all devices across all hosts
    learner = Learner(gym, cfg, mesh=mesh)
"""

import jax


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """jax.distributed.initialize with single-host no-op semantics."""
    if num_processes is None and coordinator_address is None:
        try:
            import os
            if os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") in (
                    "", "localhost") and not os.environ.get(
                        "JAX_COORDINATOR_ADDRESS"):
                return False     # single host: nothing to initialize
        except Exception:
            pass
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)
    return True


def local_env_slice(global_num_envs: int):
    """Per-host env count for host-sharded arena batches: each host
    constructs only its slice of the global batch (envs never cross hosts
    during rollout — zero host communication, SURVEY.md §5.8)."""
    n_proc = jax.process_count()
    if global_num_envs % n_proc != 0:
        raise ValueError(
            f"num_envs={global_num_envs} not divisible by "
            f"{n_proc} processes")
    per = global_num_envs // n_proc
    start = jax.process_index() * per
    return start, per
