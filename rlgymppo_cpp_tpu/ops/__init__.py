from rlgymppo_cpp_tpu.ops.gae import compute_gae
from rlgymppo_cpp_tpu.ops.welford import WelfordState, welford_init, \
    welford_update_batch, welford_mean, welford_std
