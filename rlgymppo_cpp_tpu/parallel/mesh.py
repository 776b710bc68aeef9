"""Device mesh construction + sharding specs.

The reference has no distributed backend at all — its parallelism is
threads in one process (SURVEY.md §2.6, ThreadAgentManager). This module is
the required first-class TPU replacement: a 2-D `jax.sharding.Mesh` of
(env, model) axes. Environments (and the flattened experience batch) shard
along `env` — pure data parallelism, the natural layout for thousands of
lockstep arenas — while the MLP weights can optionally shard along `model`
(Megatron-style alternating column/row splits) when a model ever outgrows
replication. XLA inserts the psum/all-gather/reduce-scatter collectives
over ICI from these annotations; no hand-written NCCL/MPI analog exists or
is needed.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"      # data-parallel axis: envs / batch rows
MODEL_AXIS = "model"  # tensor-parallel axis: MLP hidden features


def make_mesh(devices=None, model_parallel=1):
    """(env, model) mesh over `devices` (default: all)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (ENV_AXIS, MODEL_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def env_sharding(mesh):
    """Shard the leading (env or batch) axis."""
    return NamedSharding(mesh, P(ENV_AXIS))


def shard_env_tree(tree, mesh):
    """device_put a pytree of [N, ...] arrays sharded on the leading axis.

    Leaves whose leading dim doesn't divide by the env axis (scalars,
    per-player constants) are replicated.
    """
    n = mesh.shape[ENV_AXIS]
    env = env_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] > 0 and x.shape[0] % n == 0:
            return jax.device_put(x, env)
        return jax.device_put(x, rep)

    return jax.tree.map(put, tree)


def make_global_env_tree(tree, mesh):
    """Multi-process-safe env sharding (SURVEY.md §5.8).

    Single process: plain sharded device_put (shard_env_tree). Multiple
    processes (multi-host pod / the 2-process CPU test): every process
    holds the globally-shaped host tree, contributes only its
    `local_env_slice` of each env-sharded leaf via
    `jax.make_array_from_process_local_data`, and replicated leaves are
    passed whole. The result is a tree of global jax.Arrays addressable
    under pjit across all hosts; rollout math never crosses hosts, and
    gradient psums ride ICI/DCN from the sharding annotations alone.
    """
    if jax.process_count() == 1:
        return shard_env_tree(tree, mesh)
    from rlgymppo_cpp_tpu.parallel.distributed import local_env_slice
    n = mesh.shape[ENV_AXIS]
    env = env_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] > 0 and x.shape[0] % n == 0:
            start, per = local_env_slice(x.shape[0])
            return jax.make_array_from_process_local_data(
                env, np.ascontiguousarray(x[start:start + per]),
                global_shape=x.shape)
        return jax.make_array_from_process_local_data(
            rep, x, global_shape=x.shape)

    return jax.tree.map(put, tree)


def mlp_param_shardings(params, mesh):
    """NamedShardings for a list-of-{'w','b'} MLP (models/mlp.py layout).

    Megatron-style: even layers split the output features ('column
    parallel', bias sharded too), odd layers split the input features ('row
    parallel', bias replicated). Any dim that doesn't divide the model axis
    falls back to replication, so tiny nets and odd sizes always work.
    """
    tp = mesh.shape[MODEL_AXIS]
    rep = replicated(mesh)
    out = []
    for i, layer in enumerate(params):
        w = layer["w"]
        if tp == 1:
            out.append({"w": rep, "b": rep})
        elif i % 2 == 0 and w.shape[1] % tp == 0:
            out.append({"w": NamedSharding(mesh, P(None, MODEL_AXIS)),
                        "b": NamedSharding(mesh, P(MODEL_AXIS))})
        elif i % 2 == 1 and w.shape[0] % tp == 0:
            out.append({"w": NamedSharding(mesh, P(MODEL_AXIS, None)),
                        "b": rep})
        else:
            out.append({"w": rep, "b": rep})
    return out


def shard_train_state(train_state, mesh):
    """device_put the PPOLearner train_state: policy/value params get the
    tensor-parallel layout, optimizer states follow via shape matching
    (Adam moments mirror the param tree)."""
    out = dict(train_state)
    for name in ("policy", "value"):
        shardings = mlp_param_shardings(train_state[name], mesh)
        out[name] = jax.device_put(train_state[name], shardings)
        by_shape = {}
        for layer, sh in zip(train_state[name], shardings):
            for k in ("w", "b"):
                by_shape.setdefault(layer[k].shape, sh[k])

        def put_opt(x):
            sh = by_shape.get(getattr(x, "shape", None), replicated(mesh))
            return jax.device_put(jax.numpy.asarray(x), sh)

        out[name + "_opt"] = jax.tree.map(put_opt, train_state[name + "_opt"])
    return out
