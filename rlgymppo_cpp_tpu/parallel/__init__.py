from rlgymppo_cpp_tpu.parallel.mesh import (
    ENV_AXIS, MODEL_AXIS, make_mesh, replicated, env_sharding,
    shard_env_tree, make_global_env_tree, mlp_param_shardings,
    shard_train_state,
)
from rlgymppo_cpp_tpu.parallel import distributed
