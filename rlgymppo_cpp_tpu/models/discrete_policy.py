"""Discrete softmax policy.

Functional equivalent of the reference's DiscretePolicy
(src/private/RLGymPPO_CPP/PPO/DiscretePolicy.{h,cpp}): MLP -> softmax with
temperature, probabilities clamped to ACTION_MIN_PROB, multinomial sampling
or argmax, log-prob/entropy for backprop.
"""

import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.models.mlp import mlp_init, mlp_apply

ACTION_MIN_PROB = 1e-11  # DiscretePolicy.h:19

# Inference batches at least this large take the fused Pallas kernel on TPU
# (ops/pallas_mlp.py). Smaller batches — e.g. the per-env vmapped old-policy
# forwards in the skill tracker, or single-player InferUnit calls — stay on
# the plain jnp path where XLA does fine and Pallas tiling would be waste.
PALLAS_MIN_BATCH = 1024


class DiscretePolicy:
    def __init__(self, obs_size, action_amount, layer_sizes=(256, 256, 256),
                 temperature=1.0, compute_dtype=None, use_pallas="auto"):
        """use_pallas: "auto" (fused kernel on TPU for large inference
        batches), True (force, any backend — tests use interpret mode
        separately), or False (always jnp)."""
        self.obs_size = obs_size
        self.action_amount = action_amount
        self.layer_sizes = tuple(layer_sizes)
        self.temperature = temperature
        self.compute_dtype = compute_dtype
        self.use_pallas = use_pallas

    def init(self, key):
        return mlp_init(key, [self.obs_size, *self.layer_sizes,
                              self.action_amount])

    def _probs_jnp(self, params, obs):
        """Differentiable path — the learn phase backprops through this."""
        logits = mlp_apply(params, obs, self.compute_dtype)
        probs = jax.nn.softmax(logits / self.temperature, axis=-1)
        return jnp.clip(probs, ACTION_MIN_PROB, 1.0)

    def get_action_probs(self, params, obs):
        """Inference path: fused Pallas kernel when it pays off."""
        if self._take_pallas(obs):
            from rlgymppo_cpp_tpu.ops.pallas_mlp import fused_mlp_probs
            return fused_mlp_probs(
                params, obs, temperature=self.temperature,
                min_prob=ACTION_MIN_PROB, compute_dtype=self.compute_dtype)
        return self._probs_jnp(params, obs)

    def _take_pallas(self, obs):
        return self.use_pallas is True or (
            self.use_pallas == "auto"
            and jax.default_backend() == "tpu"
            and obs.ndim == 2 and obs.shape[0] >= PALLAS_MIN_BATCH)

    def get_action(self, params, obs, key, deterministic=False):
        """-> (action indices, log probs). Deterministic returns argmax with
        zero log prob (DiscretePolicy.cpp:51-62).

        Large inference batches on TPU take the fully-fused sampling
        kernel (ops/pallas_mlp.fused_mlp_sample): probabilities never
        leave VMEM and the categorical draw runs on the hardware PRNG —
        same distribution as the jnp path, different pseudorandom stream
        (both seeded from `key`, so runs stay reproducible)."""
        if self._take_pallas(obs):
            from rlgymppo_cpp_tpu.ops.pallas_mlp import fused_mlp_sample
            return fused_mlp_sample(
                params, obs, key, deterministic=bool(deterministic),
                temperature=self.temperature, min_prob=ACTION_MIN_PROB,
                compute_dtype=self.compute_dtype)
        probs = self._probs_jnp(params, obs)
        if deterministic:
            action = jnp.argmax(probs, axis=-1)
            return action, jnp.zeros(action.shape, jnp.float32)
        logits = jnp.log(probs)
        action = jax.random.categorical(key, logits, axis=-1)
        log_prob = jnp.take_along_axis(
            logits, action[..., None], axis=-1)[..., 0]
        return action, log_prob

    def get_backprop_data(self, params, obs, actions):
        """-> (action log probs, mean entropy) (DiscretePolicy.cpp:64-75)."""
        probs = self._probs_jnp(params, obs)
        log_probs = jnp.log(probs)
        action_log_probs = jnp.take_along_axis(
            log_probs, actions[..., None].astype(jnp.int32), axis=-1)[..., 0]
        entropy = -jnp.sum(log_probs * probs, axis=-1)
        return action_log_probs, jnp.mean(entropy)
