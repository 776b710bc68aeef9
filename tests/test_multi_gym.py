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


@pytest.mark.slow   # two full gym.step compiles (~8 min cold on CPU)
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


@pytest.mark.slow   # learner + two gym compiles (~7 min cold on CPU)
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

    # Per-group metric breakdown (VERDICT r4 item 8; Learner.cpp:709-721
    # returns per-game Reports — per config group is the on-device
    # granularity). Two groups must report DISTINCT metric dicts.
    gm = learner.get_all_game_metrics()
    assert set(gm["groups"]) == {"1v1", "2v2"}
    for name, g in gm["groups"].items():
        assert "avg_step_reward" in g and "avg_episode_reward" in g
    a, b = gm["groups"]["1v1"], gm["groups"]["2v2"]
    assert a["avg_step_reward"] != b["avg_step_reward"]


def test_multi_gym_group_names():
    """Group labels follow SkillTracker.cpp:19-25 mode naming, with a
    #N suffix when two groups share a mode."""
    g1, g2, g3 = make_gym(1, 2), make_gym(1, 2), make_gym(2, 2)
    policy = DiscretePolicy(g1.obs_size, g1.action_amount, (16,))
    col = MultiGymCollector([g1, g2, g3], policy)
    assert col.group_names == ["1v1", "1v1#1", "2v2"]


def _tiny_state(P=4, **overrides):
    """Minimal hand-set GameState (N=1) for reward unit tests."""
    import jax.numpy as jnp
    from rlgymppo_cpp_tpu.gym.gamestate import GameState

    z3 = jnp.zeros((1, 3))
    zp3 = jnp.zeros((1, P, 3))
    eye = jnp.broadcast_to(jnp.eye(3), (1, P, 3, 3))
    zp = jnp.zeros((1, P))
    fields = dict(
        ball_pos=z3, ball_vel=z3, ball_ang_vel=z3,
        car_pos=zp3, car_rot=eye, car_vel=zp3, car_ang_vel=zp3,
        boost_fraction=zp, is_on_ground=zp > 0, is_demoed=zp > 0,
        has_jump=zp > -1, has_flip=zp > -1,
        ball_touched_step=zp > 0, ball_touched_tick=zp > 0,
        match_goals=zp, match_saves=zp, match_assists=zp,
        match_shots=zp, match_shot_passes=zp, match_bumps=zp,
        match_demos=zp, boost_pickups=zp,
        pads_active=jnp.ones((1, 34), bool), pad_timers=jnp.zeros((1, 34)),
        score_line=jnp.zeros((1, 2)),
        last_touch_idx=jnp.full((1,), -1, jnp.int32),
    )
    fields.update(overrides)
    return GameState(**fields)


def test_zero_sum_reward_hand_computed():
    """ZeroSumReward.cpp:3-30 pinned to hand-worked numbers: child rewards
    (1,2,3,4) on teams (B,B,O,O), spirit 0.3, oppScale 0.7 ->
    r*0.7 + ownAvg*0.3 - oppAvg*0.7."""
    import numpy as np
    import jax.numpy as jnp
    from rlgymppo_cpp_tpu.gym.rewards import RewardFunction, ZeroSumReward

    class Const(RewardFunction):
        def compute(self, gs, prev_actions, final, carry):
            return jnp.asarray([[1.0, 2.0, 3.0, 4.0]]), carry

    fn = ZeroSumReward(Const(), team_spirit=0.3, opponent_scale=0.7)
    fn.bind_teams([0, 0, 1, 1])
    gs = _tiny_state()
    out, _ = fn.compute(gs, None, False, fn.init(gs))
    np.testing.assert_allclose(
        np.asarray(out)[0], [-1.3, -0.6, 2.1, 2.8], atol=1e-6)


def test_event_reward_assist_shotpass_weights():
    """Assist/shotPass channels (never hit in the golden gym traces):
    positive deltas x weights, negative deltas ignored
    (CommonRewards.cpp:32-42)."""
    import numpy as np
    import jax.numpy as jnp
    from rlgymppo_cpp_tpu.gym.rewards import EventReward

    fn = EventReward(assist=8.0, shot_pass=64.0, demoed=-512.0)
    fn.bind_teams([0, 0, 1, 1])
    gs0 = _tiny_state(
        match_assists=jnp.asarray([[0.0, 1.0, 0.0, 0.0]]),
        is_demoed=jnp.asarray([[False, True, False, False]]))
    carry = fn.init(gs0)
    gs1 = _tiny_state(
        match_assists=jnp.asarray([[1.0, 1.0, 0.0, 0.0]]),   # p0 +1 assist
        match_shot_passes=jnp.asarray([[0.0, 2.0, 0.0, 0.0]]),  # p1 +2
        is_demoed=jnp.asarray([[False, False, True, False]]))  # p2 demoed
    out, _ = fn.compute(gs1, None, False, carry)
    # p0: 1 assist * 8; p1: 2 shotPasses * 64 (its demoed flag DROPPED ->
    # no -512, only positive deltas count); p2: newly demoed -> -512
    np.testing.assert_allclose(
        np.asarray(out)[0], [8.0, 128.0, -512.0, 0.0], atol=1e-6)
