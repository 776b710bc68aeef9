"""Heterogeneous env groups: mixed team sizes trained by one Learner
(SURVEY.md §7 hard part 5) using padded observations."""

import jax
import jax.numpy as jnp
import pytest

from rlgymppo_cpp_tpu.gym import (
    Gym, Match, DiscreteAction, DefaultOBS, DefaultOBSPadded,
    VelocityPlayerToBallReward, NoTouchCondition, RandomState,
)
from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig
from rlgymppo_cpp_tpu.learn.rollout import MultiGymCollector
from rlgymppo_cpp_tpu.models.discrete_policy import DiscretePolicy


def make_gym(team_size, num_envs, max_players=4):
    match = Match(
        reward_fn=VelocityPlayerToBallReward(),
        terminal_conditions=[NoTouchCondition(10)],
        obs_builder=DefaultOBSPadded(max_players),
        action_parser=DiscreteAction(),
        state_setter=RandomState(False, False, False),
        team_size=team_size, spawn_opponents=True,
    )
    return Gym(match, num_envs=num_envs, tick_skip=8)


def test_multi_gym_collector_shapes():
    g1 = make_gym(1, 4)   # 2 players/env -> B=8
    g2 = make_gym(2, 2)   # 4 players/env -> B=8
    assert g1.obs_size == g2.obs_size

    policy = DiscretePolicy(g1.obs_size, g1.action_amount, (16,))
    params = policy.init(jax.random.PRNGKey(0))
    col = MultiGymCollector([g1, g2], policy)
    assert col.players_per_step == 16

    key = jax.random.PRNGKey(1)
    states, obs = col.reset(key)
    states, obs, traj, metrics = col.collect(params, states, obs, key, 3)
    assert traj["obs"].shape == (3, 16, g1.obs_size)
    assert traj["rewards"].shape == (3, 16)
    assert traj["dones"].shape == (3, 16)


def test_multi_gym_rejects_mismatched_obs():
    g1 = make_gym(1, 2)
    match2 = Match(
        reward_fn=VelocityPlayerToBallReward(),
        terminal_conditions=[NoTouchCondition(10)],
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        state_setter=RandomState(False, False, False),
        team_size=2, spawn_opponents=True,
    )
    g2 = Gym(match2, num_envs=2, tick_skip=8)
    policy = DiscretePolicy(g1.obs_size, g1.action_amount, (16,))
    with pytest.raises(ValueError):
        MultiGymCollector([g1, g2], policy)


def test_learner_with_groups(tmp_path):
    g1 = make_gym(1, 4)
    g2 = make_gym(2, 2)
    cfg = LearnerConfig(
        num_envs=6, timesteps_per_iteration=64, exp_buffer_size=128,
        ppo=PPOLearnerConfig(batch_size=64, mini_batch_size=32, epochs=1,
                             policy_layer_sizes=(16,),
                             critic_layer_sizes=(16,)),
        checkpoint_save_folder=None, checkpoint_load_folder=None,
        send_metrics=False)
    learner = Learner([g1, g2], cfg)
    learner.learn(iterations=2)
    assert learner.total_timesteps == 2 * (64 // 16) * 16
    assert learner.ppo.cumulative_model_updates > 0
