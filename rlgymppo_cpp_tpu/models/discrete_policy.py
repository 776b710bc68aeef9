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


class DiscretePolicy:
    def __init__(self, obs_size, action_amount, layer_sizes=(256, 256, 256),
                 temperature=1.0, compute_dtype=None):
        self.obs_size = obs_size
        self.action_amount = action_amount
        self.layer_sizes = tuple(layer_sizes)
        self.temperature = temperature
        self.compute_dtype = compute_dtype

    def init(self, key):
        return mlp_init(key, [self.obs_size, *self.layer_sizes,
                              self.action_amount])

    def get_action_probs(self, params, obs):
        logits = mlp_apply(params, obs, self.compute_dtype)
        probs = jax.nn.softmax(logits / self.temperature, axis=-1)
        return jnp.clip(probs, ACTION_MIN_PROB, 1.0)

    def get_action(self, params, obs, key, deterministic=False):
        """-> (action indices, log probs). Deterministic returns argmax with
        zero log prob (DiscretePolicy.cpp:51-62)."""
        probs = self.get_action_probs(params, obs)
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
        probs = self.get_action_probs(params, obs)
        log_probs = jnp.log(probs)
        action_log_probs = jnp.take_along_axis(
            log_probs, actions[..., None].astype(jnp.int32), axis=-1)[..., 0]
        entropy = -jnp.sum(log_probs * probs, axis=-1)
        return action_log_probs, jnp.mean(entropy)
