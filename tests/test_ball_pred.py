"""BallPredTracker: the jitted ball-only prediction scan must agree with
the real arena's ball when no cars can interfere (BallPredTracker keeps a
ball-only clone arena — RocketSim src/Sim/BallPredTracker/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim.arena import Arena
from rlgymppo_cpp_tpu.sim.ball_pred import BallPredTracker
from rlgymppo_cpp_tpu.sim.state import CarControls

# golden replays / multihost / learner e2e are the
# acceptance bar but dominate wall time: slow-marked, run
# with `pytest tests/ --runslow` (README "Testing")
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def arena():
    return Arena(teams=(0, 1))


def test_prediction_matches_arena_ball(arena):
    """Cars parked far from the ball: 90 predicted ticks must track the
    arena's actual ball trajectory (bounce included)."""
    state = arena.default_state(())
    ball = state.ball.replace(
        pos=jnp.asarray([0.0, 0.0, 600.0]),
        vel=jnp.asarray([700.0, -400.0, 200.0]))
    state = state.replace(ball=ball)

    tracker = BallPredTracker(arena, num_pred_ticks=90)
    pred = tracker.get_pred(ball)

    controls = CarControls.zeros(state.cars.boost.shape)
    key = jax.random.PRNGKey(0)
    for t in range(90):
        key, sub = jax.random.split(key)
        state, _ = arena.tick_jit(state, controls, sub)
        np.testing.assert_allclose(
            np.asarray(jax.tree.map(lambda x: x[t], pred).pos),
            np.asarray(state.ball.pos), atol=1e-3,
            err_msg=f"tick {t}")


def test_batched_prediction_shape(arena):
    tracker = BallPredTracker(arena, num_pred_ticks=30)
    state = arena.default_state((4,))
    ball = state.ball.replace(
        vel=jnp.broadcast_to(jnp.asarray([100.0, 0.0, 0.0]), (4, 3)))
    pred = tracker.get_pred(ball)
    assert pred.pos.shape == (30, 4, 3)


def test_state_for_time_index(arena):
    tracker = BallPredTracker(arena, num_pred_ticks=60)
    state = arena.default_state(())
    ball = state.ball.replace(vel=jnp.asarray([500.0, 0.0, 50.0]))
    pred = tracker.get_pred(ball)
    half_sec = tracker.get_ball_state_for_time(pred, 0.5)
    # 0.5s at 120tps -> tick index 60 clamped to 59
    np.testing.assert_allclose(np.asarray(half_sec.pos),
                               np.asarray(pred.pos[59]))
    start = tracker.get_ball_state_for_time(pred, -1.0)
    np.testing.assert_allclose(np.asarray(start.pos),
                               np.asarray(pred.pos[0]))
