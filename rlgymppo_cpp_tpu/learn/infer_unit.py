"""Standalone deployment inference.

Equivalent of the reference's InferUnit
(src/public/RLGymPPO_CPP/Util/InferUnit.{h,cpp}): loads a trained policy
(and optionally critic) outside any Learner and runs obs-build + forward +
action-parse for one player or all players, with temperature and
deterministic options (InferUnit.cpp:56-132). Used by the RLBot-style
deployment client and by eval tooling.
"""

import functools

import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.learn.config import PPOLearnerConfig
from rlgymppo_cpp_tpu.models.discrete_policy import DiscretePolicy
from rlgymppo_cpp_tpu.models.value_estimator import ValueEstimator
from rlgymppo_cpp_tpu.utils import checkpoint as ckpt


class InferUnit:
    def __init__(self, obs_builder, action_parser, obs_size, teams,
                 policy_params=None, critic_params=None,
                 layer_sizes=(256, 256, 256), temperature=1.0):
        self.obs_builder = obs_builder
        self.action_parser = action_parser
        self.obs_size = obs_size
        self.teams = jnp.asarray(teams)
        self.policy = DiscretePolicy(
            obs_size, action_parser.action_amount, layer_sizes,
            temperature=temperature)
        self.value_net = ValueEstimator(obs_size, layer_sizes)
        self.policy_params = policy_params
        self.critic_params = critic_params

    @classmethod
    def from_checkpoint(cls, path, obs_builder, action_parser, obs_size,
                        teams, ppo_config: PPOLearnerConfig = None,
                        temperature=1.0):
        """Load policy+critic params from a numbered checkpoint folder (or
        its parent run folder, newest picked like Learner.cpp:285-308)."""
        cfg = ppo_config or PPOLearnerConfig()
        newest = ckpt.find_newest_checkpoint(path) or path
        unit = cls(obs_builder, action_parser, obs_size, teams,
                   layer_sizes=cfg.policy_layer_sizes,
                   temperature=temperature)
        key = jax.random.PRNGKey(0)
        template = {
            "policy": unit.policy.init(key),
            "value": unit.value_net.init(key),
        }
        # Checkpoints store the full train_state; pull the two model trees.
        import numpy as np
        import os
        data = np.load(os.path.join(newest, "TRAIN_STATE.npz"))
        # policy params are the first leaves in train_state order
        # ({"policy", "value", "policy_opt", "value_opt"} — dicts keep
        # insertion order but jax sorts dict keys, so recompute indices)
        from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
        ppo = PPOLearner(obs_size, action_parser.action_amount, cfg)
        full_template = ppo.init(key)
        flat_t, treedef = jax.tree.flatten(full_template)
        flat = [data[f"leaf_{i}"] for i in range(len(flat_t))]
        train_state = jax.tree.unflatten(treedef, flat)
        unit.policy_params = train_state["policy"]
        unit.critic_params = train_state["value"]
        return unit

    # ------------------------------------------------------------- inference

    def build_obs(self, gs, prev_actions, key=None):
        return self.obs_builder.build(gs, prev_actions, self.teams, key=key)

    @functools.partial(jax.jit, static_argnames=("self", "deterministic"))
    def _policy_forward(self, params, obs, key, deterministic):
        flat = obs.reshape(-1, self.obs_size)
        actions, _ = self.policy.get_action(params, flat, key,
                                            deterministic=deterministic)
        return actions.reshape(obs.shape[:-1])

    def infer_policy_all(self, gs, prev_actions, deterministic=True,
                         key=None):
        """All players of a (batched) GameState -> (action indices [N, P],
        action vectors [N, P, 8]) (InferUnit.cpp:100-132)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        key, k_obs, k_act = jax.random.split(key, 3)
        obs = self.build_obs(gs, prev_actions, key=k_obs)
        idx = self._policy_forward(self.policy_params, obs, k_act,
                                   deterministic)
        return idx, self.action_parser.to_action_vec(idx)

    def infer_policy_single(self, gs, player_index, prev_actions,
                            deterministic=True, key=None):
        """One player's action (InferUnit.cpp:74-98)."""
        idx, vecs = self.infer_policy_all(gs, prev_actions, deterministic,
                                          key)
        return idx[..., player_index], vecs[..., player_index, :]

    @functools.partial(jax.jit, static_argnames=("self",))
    def _critic_forward(self, params, obs):
        flat = obs.reshape(-1, self.obs_size)
        return self.value_net.forward(params, flat).reshape(obs.shape[:-1])

    def infer_critic_all(self, gs, prev_actions, key=None):
        obs = self.build_obs(gs, prev_actions, key=key)
        return self._critic_forward(self.critic_params, obs)

    def infer_critic_single(self, gs, player_index, prev_actions, key=None):
        return self.infer_critic_all(gs, prev_actions, key)[..., player_index]
