"""SkillTracker ELO math + eval rollout smoke (SkillTracker.cpp semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlgymppo_cpp_tpu.gym import (
    Match, DiscreteAction, DefaultOBS, VelocityPlayerToBallReward,
    NoTouchCondition, GoalScoreCondition, RandomState,
)
from rlgymppo_cpp_tpu.learn.config import SkillTrackerConfig
from rlgymppo_cpp_tpu.learn.skill_tracker import SkillTracker, mode_name
from rlgymppo_cpp_tpu.models.discrete_policy import DiscretePolicy


def make_match():
    return Match(
        reward_fn=VelocityPlayerToBallReward(),
        terminal_conditions=[NoTouchCondition(10), GoalScoreCondition()],
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        state_setter=RandomState(False, False, False),
        team_size=1, spawn_opponents=True,
    )


def test_mode_name():
    m = make_match()
    assert mode_name(m) == "1v1"


def test_elo_update_math():
    """UpdateRatings (SkillTracker.cpp:72-85) against a hand computation."""
    match = make_match()
    policy = DiscretePolicy(89, 90, (16,))
    cfg = SkillTrackerConfig(enabled=True, num_envs=2, rating_inc=10.0,
                             starting_rating=1000.0)
    tr = SkillTracker(cfg, match, policy)
    tr.cur_rating = {"1v1": 1000.0}
    loser = {"1v1": 1000.0}
    tr._update_ratings(tr.cur_rating, loser, cfg.rating_inc)
    # Equal ratings: expected = 0.5, so +/- K/2
    assert abs(tr.cur_rating["1v1"] - 1005.0) < 1e-4
    assert abs(loser["1v1"] - 995.0) < 1e-4

    # Stronger winner gains less
    w, l = {"1v1": 1400.0}, {"1v1": 1000.0}
    tr.cur_rating = w
    tr._update_ratings(w, l, cfg.rating_inc)
    exp = 1 / (10 ** ((1000 - 1400) / 400) + 1)
    assert abs(w["1v1"] - (1400 + 10 * (1 - exp))) < 1e-3


@pytest.mark.slow   # eval-gym compile (~2.5 min cold on CPU)
def test_run_games_smoke():
    """Full eval rollout: versions snapshot, ratings dict returned."""
    match = make_match()
    policy = DiscretePolicy(89, 90, (16,))
    params = policy.init(jax.random.PRNGKey(0))
    # 3 envs (odd) would break if eval actions were mis-unpacked along
    # the env axis (a [2, P] array silently unpacks into two rows)
    cfg = SkillTrackerConfig(
        enabled=True, num_envs=3, max_eval_seconds=3.0,
        timesteps_per_version=100, max_versions=2, rating_inc=5.0,
        starting_rating=1000.0, kickoff_only=True)
    tr = SkillTracker(cfg, match, policy)
    assert tr.gym.obs_size == 89

    ratings = tr.run_games(params, timesteps_delta=60)
    assert "1v1" in ratings
    assert len(tr.old_params) == 1      # start_with_version behavior

    # Crossing timesteps_per_version snapshots another version
    ratings = tr.run_games(params, timesteps_delta=60)
    assert len(tr.old_params) == 2
    # maxVersions cap
    tr.run_games(params, timesteps_delta=200)
    assert len(tr.old_params) == 2

    # state_dict round trip
    sd = tr.state_dict()
    tr2 = SkillTracker(cfg, match, policy)
    tr2.load_state_dict(sd, old_params=tr.old_params)
    assert tr2.cur_rating == tr.cur_rating
    assert len(tr2.old_params) == 2

    # per-opponent head-to-head instrumentation exists and is consistent
    stats = tr.last_eval_stats
    if stats is not None and stats["goals"]:
        total = sum(s["cur_goals"] + s["opp_goals"]
                    for s in stats["per_opponent"].values())
        assert total == stats["goals"]


@pytest.mark.slow   # shares the eval-gym compile family (~1 min extra)
def test_run_games_sampled_eval():
    """eval_deterministic=False (docs/EVAL_DIAGNOSIS_R5.md): sampled
    actions for both policies — the rollout must accept the separate
    compile and still produce ratings + per-opponent stats."""
    match = make_match()
    policy = DiscretePolicy(89, 90, (16,))
    params = policy.init(jax.random.PRNGKey(0))
    cfg = SkillTrackerConfig(
        enabled=True, num_envs=3, max_eval_seconds=3.0,
        timesteps_per_version=100, max_versions=2, rating_inc=5.0,
        kickoff_only=True, eval_deterministic=False,
        eval_temperature=0.35)
    tr = SkillTracker(cfg, match, policy)
    ratings = tr.run_games(params, timesteps_delta=60)
    assert "1v1" in ratings
    assert tr.last_eval_stats is not None
    assert "per_opponent" in tr.last_eval_stats


def test_eval_temperature_sharpens_sampling():
    """tau << 1 must concentrate eval sampling onto the policy's argmax
    (the skill-expression property the team evals rely on), while tau=1
    samples the raw near-uniform distribution. Uses unit-normal logits —
    a trained-policy-like spread (entropy ~ 4.0 vs ln(90) = 4.5). Note a
    random-INIT MLP is flatter still (logit std ~1e-2) and even tau=0.1
    barely concentrates there; that's consistent: a policy with no
    preferences has no skill for the eval to express."""
    logits = jax.random.normal(jax.random.PRNGKey(1), (512, 90))
    probs = jax.nn.softmax(logits, axis=-1)
    greedy = jnp.argmax(probs, axis=-1)

    def sample(temp, key):
        return jax.random.categorical(
            key, jnp.log(probs) / temp, axis=-1)

    k = jax.random.PRNGKey(2)
    sharp = sample(0.1, k)
    full = sample(1.0, k)
    frac_sharp = float(jnp.mean(sharp == greedy))
    frac_full = float(jnp.mean(full == greedy))
    # tau=1 on near-uniform probs almost never picks the argmax (1/90
    # base rate ~ 0.011, measured ~0.08); tau=0.1 multiplies every logit
    # gap 10x and picks it most of the time (measured ~0.81 — the
    # max-vs-runner-up gap among 90 unit normals is small, so even 10x
    # sharpening leaves some mass on the runner-up)
    assert frac_sharp > 0.7, frac_sharp
    assert frac_full < 0.15, frac_full
    assert frac_sharp > 5 * frac_full
