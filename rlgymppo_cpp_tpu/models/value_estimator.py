"""Critic network (reference ValueEstimator.{h,cpp}): MLP -> scalar."""

from rlgymppo_cpp_tpu.models.mlp import mlp_init, mlp_apply


class ValueEstimator:
    def __init__(self, obs_size, layer_sizes=(256, 256, 256),
                 compute_dtype=None):
        self.obs_size = obs_size
        self.layer_sizes = tuple(layer_sizes)
        self.compute_dtype = compute_dtype

    def init(self, key):
        return mlp_init(key, [self.obs_size, *self.layer_sizes, 1])

    def forward(self, params, obs):
        return mlp_apply(params, obs, self.compute_dtype)[..., 0]
