"""Shared driver for the multi-host test: one fused train step on an
8-device (env, model) mesh. Used by multihost_child.py (2 processes x 4
virtual devices) and by test_multihost.py's single-process reference run
(1 process x 8 virtual devices) — identical global program either way, so
results must match.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import multihost_utils


def run_one_fused_step():
    """-> (entropy float, flattened policy params after 1 update)."""
    from rlgymppo_cpp_tpu.gym import (
        Gym, Match, DiscreteAction, DefaultOBS, CombinedReward,
        VelocityPlayerToBallReward, NoTouchCondition, GoalScoreCondition,
        RandomState,
    )
    from rlgymppo_cpp_tpu.learn.config import LearnerConfig, PPOLearnerConfig
    from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
    from rlgymppo_cpp_tpu.learn.train_step import make_train_step
    from rlgymppo_cpp_tpu.ops.welford import welford_init
    from rlgymppo_cpp_tpu.parallel import (
        make_mesh, make_global_env_tree, shard_train_state,
    )

    match = Match(
        reward_fn=CombinedReward([(VelocityPlayerToBallReward(), 1.0)]),
        terminal_conditions=[NoTouchCondition(50), GoalScoreCondition()],
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        state_setter=RandomState(True, True, True),
        team_size=1, spawn_opponents=False,
    )
    N, T = 16, 4
    gym = Gym(match, num_envs=N, tick_skip=8)
    cfg = LearnerConfig(num_envs=N)
    cfg.ppo = PPOLearnerConfig(
        batch_size=N * T, mini_batch_size=0, epochs=1,
        policy_layer_sizes=(32, 32), critic_layer_sizes=(32, 32))
    ppo = PPOLearner(gym.obs_size, gym.action_amount, cfg.ppo)

    mesh = make_mesh(model_parallel=2)
    train_state = ppo.init(jax.random.PRNGKey(0))
    train_state = shard_train_state(train_state, mesh)
    return_stats = welford_init(1)

    gym_state, obs = gym.reset(jax.random.PRNGKey(1))
    gym_state = make_global_env_tree(gym_state, mesh)
    obs = make_global_env_tree(obs, mesh)

    step = make_train_step(gym, ppo, cfg, T)
    with mesh:
        train_state, gym_state, obs, return_stats, _, metrics = step(
            train_state, gym_state, obs, return_stats, {},
            jax.random.PRNGKey(2))
        entropy = float(metrics["entropy"])

    # Gather fully-addressable host values for comparison
    params = jax.tree.map(
        lambda x: np.asarray(
            multihost_utils.process_allgather(x, tiled=True)
            if jax.process_count() > 1 else x),
        train_state["policy"])
    flat = np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree.leaves(params)])
    return entropy, flat
