"""Ball physics: drop/bounce/rest behavior vs known RocketSim facts
(RLConst.h: BALL_REST_Z, BALL_RESTITUTION, gravity; Ball.cpp clamps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim.arena import Arena
from rlgymppo_cpp_tpu.sim.state import CarControls


@pytest.fixture(scope="module")
def arena():
    return Arena(teams=(0, 1))


def run_ticks(arena, state, n, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    controls = CarControls.zeros(state.cars.boost.shape)
    for _ in range(n):
        key, sub = jax.random.split(key)
        state, _ = arena.tick_jit(state, controls, sub)
    return state


def test_ball_sleeps_at_kickoff(arena):
    state = arena.default_state(())
    state = run_ticks(arena, state, 30)
    # zero-velocity sleeping: the ball must not fall (Arena.cpp:721-727)
    np.testing.assert_allclose(
        np.asarray(state.ball.pos), [0.0, 0.0, C.BALL_REST_Z], atol=1e-5)
    assert float(jnp.linalg.norm(state.ball.vel)) == 0.0


def test_ball_drop_bounces_and_rests(arena):
    state = arena.default_state(())
    # Drop from 1000uu with a tiny velocity so it is awake
    ball = state.ball.replace(
        pos=jnp.asarray([0.0, 0.0, 1000.0]),
        vel=jnp.asarray([0.0, 0.0, -1e-3]))
    state = state.replace(ball=ball)

    max_z_after_bounce = 0.0
    bounced = False
    zs = []
    for _ in range(400):  # fall (~1.7s) + rise to apex (~1s)
        state = run_ticks(arena, state, 1)
        z = float(state.ball.pos[2])
        vz = float(state.ball.vel[2])
        zs.append(z)
        if bounced:
            max_z_after_bounce = max(max_z_after_bounce, z)
        if vz > 0:
            bounced = True
    assert bounced
    # Energy: bounce height ~ restitution^2 * drop height (~0.36 * 907)
    drop_h = 1000.0 - C.BALL_REST_Z
    ratio = (max_z_after_bounce - C.BALL_REST_Z) / drop_h
    assert 0.25 < ratio < 0.45, ratio

    # Eventually rests at BALL_REST_Z
    for _ in range(10):
        state = run_ticks(arena, state, 120)
    assert abs(float(state.ball.pos[2]) - C.BALL_REST_Z) < 2.0


def test_ball_speed_clamp(arena):
    state = arena.default_state(())
    ball = state.ball.replace(vel=jnp.asarray([9000.0, 0.0, 0.0]))
    state = state.replace(ball=ball)
    state = run_ticks(arena, state, 1)
    speed = float(jnp.linalg.norm(state.ball.vel))
    assert speed <= C.BALL_MAX_SPEED + 1e-3


def test_ball_side_wall_bounce(arena):
    state = arena.default_state(())
    ball = state.ball.replace(
        pos=jnp.asarray([3000.0, 0.0, 500.0]),
        vel=jnp.asarray([2000.0, 0.0, 0.0]))
    state = state.replace(ball=ball)
    state = run_ticks(arena, state, 120)
    # Bounced back off x=4096 wall
    assert float(state.ball.vel[0]) < 0
    assert float(state.ball.pos[0]) < 4096 - 90


def test_ball_enters_goal(arena):
    state = arena.default_state(())
    ball = state.ball.replace(
        pos=jnp.asarray([0.0, 5000.0, 300.0]),
        vel=jnp.asarray([0.0, 2000.0, 0.0]))
    state = state.replace(ball=ball)
    scored = False
    for _ in range(120):
        state = run_ticks(arena, state, 1)
        if bool(arena.is_ball_scored(state.ball.pos)):
            scored = True
            break
    assert scored
    # And it should be stopped by the net, not escape to infinity
    state = run_ticks(arena, state, 240)
    assert float(state.ball.pos[1]) < 6000.0


def test_ball_blocked_above_goal(arena):
    state = arena.default_state(())
    ball = state.ball.replace(
        pos=jnp.asarray([0.0, 5000.0, 1500.0]),  # above goal height
        vel=jnp.asarray([0.0, 2000.0, 0.0]))
    state = state.replace(ball=ball)
    for _ in range(60):
        state = run_ticks(arena, state, 1)
    assert not bool(arena.is_ball_scored(state.ball.pos))
    assert float(state.ball.pos[1]) < 5130.0
