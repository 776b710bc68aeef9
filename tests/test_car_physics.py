"""Car vehicle sim behavior vs known Rocket League facts
(Car.cpp state machine, btVehicleRL suspension/friction, RLConst curves)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim.arena import Arena
from rlgymppo_cpp_tpu.sim.state import CarControls


@pytest.fixture(scope="module")
def arena():
    return Arena(teams=(0,))


def mk_controls(shape=(1,), **kw):
    c = CarControls.zeros(shape)
    updates = {}
    for k, v in kw.items():
        base = getattr(c, k)
        updates[k] = jnp.full_like(base, v)
    return c.replace(**updates)


def place_car(arena, pos=(0.0, 0.0, 17.0), yaw=0.0, vel=(0.0, 0.0, 0.0)):
    from rlgymppo_cpp_tpu.maths.rot import euler_to_rotmat
    state = arena.default_state(())
    cars = state.cars.replace(
        pos=jnp.asarray([pos], jnp.float32),
        vel=jnp.asarray([vel], jnp.float32),
        rot=euler_to_rotmat(jnp.asarray([yaw]), jnp.zeros((1,)),
                            jnp.zeros((1,))),
        boost=jnp.full((1,), 100.0),
    )
    # park the ball far away
    ball = state.ball.replace(pos=jnp.asarray([3000.0, 3000.0, C.BALL_REST_Z]))
    return state.replace(cars=cars, ball=ball)


def run(arena, state, controls, n, key=0):
    k = jax.random.PRNGKey(key)
    for _ in range(n):
        k, sub = jax.random.split(k)
        state, _ = arena.tick_jit(state, controls, sub)
    return state


@pytest.mark.slow   # 120 per-tick dispatches (~3 min cold on CPU);
# resting contact is also pinned by the golden suspension traces
def test_car_rests_on_ground(arena):
    state = place_car(arena)
    state = run(arena, state, mk_controls(), 120)
    z = float(state.cars.pos[0, 2])
    assert 15.0 < z < 20.0, z
    assert bool(state.cars.is_on_ground[0])
    speed = float(jnp.linalg.norm(state.cars.vel[0]))
    assert speed < 10.0, speed


def test_throttle_accelerates_to_max_drive_speed(arena):
    # Start near the -X wall so there is ~7km of runway
    state = place_car(arena, pos=(-3800.0, 0.0, 17.0))
    controls = mk_controls(throttle=1.0)
    state = run(arena, state, controls, 120)
    fwd_speed_1s = float(state.cars.vel[0, 0])
    # RL ground accel starts ~1600 uu/s^2, decaying: expect ~950-1200 after 1s
    assert 800.0 < fwd_speed_1s < 1450.0, fwd_speed_1s
    state = run(arena, state, controls, 240)
    fwd_speed = float(state.cars.vel[0, 0])
    # Max driving speed without boost ~1410 (DRIVE_SPEED_TORQUE_FACTOR_CURVE)
    assert 1350.0 < fwd_speed < 1450.0, fwd_speed
    assert float(state.cars.pos[0, 0]) < 3500.0  # still on the runway
    assert bool(state.cars.is_on_ground[0])


def test_boost_reaches_supersonic_and_depletes(arena):
    # y=-600 avoids all boost pads (nearest row is y=-1024..-1036)
    state = place_car(arena, pos=(-3800.0, -600.0, 17.0),
                      vel=(1400.0, 0.0, 0.0))
    controls = mk_controls(throttle=1.0, boost=True)
    state = run(arena, state, controls, 240)  # 2 s of boosting
    speed = float(jnp.linalg.norm(state.cars.vel[0]))
    assert speed > 2200.0, speed
    assert speed <= C.CAR_MAX_SPEED + 1.0
    assert bool(state.cars.is_supersonic[0])
    used = 100.0 - float(state.cars.boost[0])
    assert used == pytest.approx(2.0 * C.BOOST_USED_PER_SECOND, rel=0.02)


def test_steering_turns_car(arena):
    state = place_car(arena)
    state = run(arena, state, mk_controls(throttle=1.0), 120)
    state = run(arena, state, mk_controls(throttle=1.0, steer=1.0), 120)
    # +steer turns toward +Y (right): heading rotated
    fwd = np.asarray(state.cars.rot[0, :, 0])
    assert fwd[1] > 0.3, fwd
    assert bool(state.cars.is_on_ground[0])


def test_jump_and_double_jump(arena):
    state = place_car(arena)
    # Hold jump for 10 ticks then release
    state = run(arena, state, mk_controls(jump=True), 10)
    assert bool(state.cars.has_jumped[0])
    assert not bool(state.cars.is_on_ground[0])
    vz = float(state.cars.vel[0, 2])
    assert vz > 280.0, vz  # immediate impulse ~292 + hold force

    state = run(arena, state, mk_controls(), 20)
    # Double jump: press jump again in air without stick input
    state2 = run(arena, state, mk_controls(jump=True), 2)
    assert bool(state2.cars.has_double_jumped[0])

    # The car lands eventually and regains jump
    state3 = run(arena, state2, mk_controls(), 600)
    assert bool(state3.cars.is_on_ground[0])
    assert not bool(state3.cars.has_jumped[0])


def test_flip_forward(arena):
    state = place_car(arena)
    # Drive a bit, jump, release, then flip forward (pitch = -1)
    state = run(arena, state, mk_controls(throttle=1.0), 60)
    state = run(arena, state, mk_controls(throttle=1.0, jump=True), 3)
    state = run(arena, state, mk_controls(throttle=1.0), 10)
    v_before = float(state.cars.vel[0, 0])
    state = run(arena, state, mk_controls(throttle=1.0, jump=True,
                                          pitch=-1.0), 3)
    assert bool(state.cars.has_flipped[0])
    assert bool(state.cars.is_flipping[0])
    v_after = float(state.cars.vel[0, 0])
    # Forward dodge impulse ~500 uu/s scaled by speed ratio
    assert v_after - v_before > 300.0, (v_before, v_after)
    # Flip torque pitches the car forward (negative pitch ang vel ~ -right)
    state = run(arena, state, mk_controls(throttle=1.0), 10)
    ang_speed = float(jnp.linalg.norm(state.cars.ang_vel[0]))
    assert ang_speed > 3.0, ang_speed


def test_air_pitch_control(arena):
    state = place_car(arena, pos=(0.0, 0.0, 800.0))
    controls = mk_controls(pitch=1.0)
    state = run(arena, state, controls, 30)
    assert not bool(state.cars.is_on_ground[0])
    # Pitch input rotates about -right axis
    w = np.asarray(state.cars.ang_vel[0])
    assert abs(w[1]) > 1.0, w


def test_car_velocity_clamp(arena):
    state = place_car(arena, pos=(0.0, 0.0, 800.0), vel=(3000.0, 0.0, 0.0))
    state = run(arena, state, mk_controls(), 1)
    speed = float(jnp.linalg.norm(state.cars.vel[0]))
    assert speed <= C.CAR_MAX_SPEED + 1e-2


def test_demo_respawn_timer(arena):
    state = place_car(arena)
    cars = state.cars.replace(
        is_demoed=jnp.ones((1,), bool),
        demo_respawn_timer=jnp.full((1,), C.DEMO_RESPAWN_TIME))
    state = state.replace(cars=cars)
    state = run(arena, state, mk_controls(), 120)
    assert bool(state.cars.is_demoed[0])  # still demoed after 1 s
    state = run(arena, state, mk_controls(), 3 * 120)
    assert not bool(state.cars.is_demoed[0])  # respawned after 3 s
    assert abs(float(state.cars.pos[0, 2]) - 17.0) < 4.0
    assert float(state.cars.boost[0]) == pytest.approx(
        C.BOOST_SPAWN_AMOUNT, abs=1e-3)
