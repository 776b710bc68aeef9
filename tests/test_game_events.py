"""GameEventTracker behavior tests (shot/goal/save/assist semantics of
GameEventTracker.cpp:48-158 + IsBallProbablyGoingIn Arena.cpp:827-947)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rlgymppo_cpp_tpu.sim.arena import Arena
from rlgymppo_cpp_tpu.sim.constants import GameMode
from rlgymppo_cpp_tpu.sim.game_event_tracker import (
    GameEventTracker, ball_probably_going_in,
)

TICK_RATE = 120.0


def make_arena(teams=(0, 1)):
    return Arena(game_mode=GameMode.SOCCAR, teams=teams)


def set_ball(state, pos, vel):
    ball = state.ball.replace(
        pos=jnp.asarray([pos], jnp.float32),
        vel=jnp.asarray([vel], jnp.float32))
    return state.replace(ball=ball)


def set_hit(state, player, ticks_ago, tick_count=1000):
    bhi = state.cars.ball_hit_info
    bhi = bhi.replace(
        is_valid=bhi.is_valid.at[0, player].set(True),
        tick_count_when_hit=bhi.tick_count_when_hit.at[0, player].set(
            tick_count - ticks_ago))
    return state.replace(cars=state.cars.replace(ball_hit_info=bhi),
                         tick_count=jnp.full((1,), tick_count, jnp.int32))


def test_going_in_straight_shot():
    arena = make_arena()
    pos = jnp.asarray([[0.0, 0.0, 93.15]])
    vel = jnp.asarray([[0.0, 3000.0, 0.0]])
    going, team = ball_probably_going_in(pos, vel, arena.mut,
                                         GameMode.SOCCAR, 2.0, 0.0)
    assert bool(going[0]) and int(team[0]) == 1  # orange net (+y)

    # Too slow: time to goal > maxTime
    vel = jnp.asarray([[0.0, 2000.0, 0.0]])
    going, _ = ball_probably_going_in(pos, vel, arena.mut,
                                      GameMode.SOCCAR, 2.0, 0.0)
    assert not bool(going[0])

    # Wide miss
    vel = jnp.asarray([[2500.0, 3000.0, 0.0]])
    going, _ = ball_probably_going_in(pos, vel, arena.mut,
                                      GameMode.SOCCAR, 2.0, 0.0)
    assert not bool(going[0])


def test_shot_event_and_cooldown():
    arena = make_arena()
    tr = GameEventTracker(arena)
    ts = tr.init((1,))
    st = arena.default_state((1,))
    st = set_ball(st, (0, 0, 93.15), (0, 3000, 0))
    st = set_hit(st, player=0, ticks_ago=40)  # >= 0.3s * 120 = 36 ticks

    ts, ev = tr.update(ts, st, jnp.zeros((1,), bool), 8)
    assert int(ev["shots"][0, 0]) == 1
    assert int(ev["shots"][0, 1]) == 0
    assert bool(ts.ball_shot[0])
    assert int(ts.shot_goal_team[0]) == 1

    # Second update while still going in: no duplicate shot
    ts, ev = tr.update(ts, st, jnp.zeros((1,), bool), 8)
    assert int(ev["shots"][0, 0]) == 0


def test_shot_requires_touch_delay():
    arena = make_arena()
    tr = GameEventTracker(arena)
    ts = tr.init((1,))
    st = arena.default_state((1,))
    st = set_ball(st, (0, 0, 93.15), (0, 3000, 0))
    st = set_hit(st, player=0, ticks_ago=10)  # too fresh (< 36 ticks)
    ts, ev = tr.update(ts, st, jnp.zeros((1,), bool), 8)
    assert int(ev["shots"][0, 0]) == 0
    assert not bool(ts.ball_shot[0])


def test_goal_and_assist():
    arena = Arena(game_mode=GameMode.SOCCAR, teams=(0, 0, 1, 1))
    tr = GameEventTracker(arena)
    ts = tr.init((1,))
    st = arena.default_state((1,))
    # Ball in orange net (+y beyond threshold) -> blue scored
    st = set_ball(st, (0, 5300.0, 93.15), (0, 500, 0))
    st = set_hit(st, player=0, ticks_ago=30)    # scorer (latest blue touch)
    st = set_hit(st, player=1, ticks_ago=100)   # passer (within 2s of shot)
    scored = jnp.ones((1,), bool)
    ts, ev = tr.update(ts, st, scored, 8)
    assert int(ev["goals"][0, 0]) == 1
    assert int(ev["assists"][0, 1]) == 1
    assert int(ev["goals"][0, 2]) == 0

    # Still scored next update: no double count
    ts, ev = tr.update(ts, st, scored, 8)
    assert int(ev["goals"][0, 0]) == 0


def test_save_event():
    arena = make_arena()
    tr = GameEventTracker(arena)
    ts = tr.init((1,))
    # Ball was shot at the blue net (team 0 defends -y)
    ts = ts.replace(ball_shot=jnp.ones((1,), bool),
                    shot_goal_team=jnp.zeros((1,), jnp.int32))
    st = arena.default_state((1,))
    # Defender (player 0, blue) just touched; ball now cleared (not going in)
    st = set_ball(st, (0, -3000.0, 93.15), (0, 2000.0, 0))
    st = set_hit(st, player=0, ticks_ago=4)  # within deltaTicks=8
    ts, ev = tr.update(ts, st, jnp.zeros((1,), bool), 8)
    assert int(ev["saves"][0, 0]) == 1
    assert not bool(ts.ball_shot[0])


def test_shot_miss_no_save():
    arena = make_arena()
    tr = GameEventTracker(arena)
    ts = tr.init((1,))
    ts = ts.replace(ball_shot=jnp.ones((1,), bool),
                    shot_goal_team=jnp.zeros((1,), jnp.int32))
    st = arena.default_state((1,))
    st = set_ball(st, (0, -3000.0, 93.15), (0, 2000.0, 0))
    # Nobody touched it: shot just fizzles, no save
    ts, ev = tr.update(ts, st, jnp.zeros((1,), bool), 8)
    assert int(np.asarray(ev["saves"]).sum()) == 0
    assert not bool(ts.ball_shot[0])


def test_gym_step_carries_tracker(tiny_gym=None):
    """Gym integration: counters exist and tracker state threads through."""
    import jax
    from rlgymppo_cpp_tpu.gym import (
        Gym, Match, DiscreteAction, DefaultOBS, EventReward,
        NoTouchCondition, RandomState,
    )
    match = Match(
        reward_fn=EventReward(goal=1.0, shot=0.5, save=0.3),
        terminal_conditions=[NoTouchCondition(20)],
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        state_setter=RandomState(False, False, False),
        team_size=1, spawn_opponents=True,
    )
    gym = Gym(match, num_envs=2, tick_skip=8)
    key = jax.random.PRNGKey(0)
    state, obs = gym.reset(key)
    acts = jnp.zeros((2, 2), jnp.int32)
    state, obs, rew, done, info = gym.step(state, acts, key)
    for k in ("goals", "saves", "assists", "shots", "shot_passes"):
        assert state.counters[k].shape == (2, 2)
    assert state.event_tracker.ball_shot.shape == (2,)
