from rlgymppo_cpp_tpu.models.mlp import mlp_init, mlp_apply
from rlgymppo_cpp_tpu.models.discrete_policy import DiscretePolicy
from rlgymppo_cpp_tpu.models.value_estimator import ValueEstimator
