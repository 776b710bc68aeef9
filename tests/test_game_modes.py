"""Alternate game modes: Heatseeker, Snowday, The Void.

Heatseeker homing / retarget replicate Ball::_PreTickUpdate and
_OnWorldCollision (RocketSim Ball.cpp:152-253); mode mutator defaults
replicate MutatorConfig.cpp:5-34; The Void removes the static world
(Arena.cpp:509-515)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim.arena import Arena
from rlgymppo_cpp_tpu.sim.constants import GameMode
from rlgymppo_cpp_tpu.sim.mutators import MutatorConfig
from rlgymppo_cpp_tpu.sim.state import CarControls

# golden replays / multihost / learner e2e are the
# acceptance bar but dominate wall time: slow-marked, run
# with `pytest tests/ --runslow` (README "Testing")
pytestmark = pytest.mark.slow


def run_ticks(arena, state, n, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    controls = CarControls.zeros(state.cars.boost.shape)
    for _ in range(n):
        key, sub = jax.random.split(key)
        state, _ = arena.tick_jit(state, controls, sub)
    return state


@pytest.fixture(scope="module")
def hs_arena():
    return Arena(game_mode=GameMode.HEATSEEKER, teams=(0, 1))


def test_heatseeker_mutator_defaults():
    """Infinite boost: 100 spawn boost, zero usage (MutatorConfig.cpp:29-34)."""
    mut = MutatorConfig.for_game_mode(GameMode.HEATSEEKER)
    assert mut.car_spawn_boost_amount == 100.0
    assert mut.boost_used_per_second == 0.0


def test_snowday_mutator_defaults():
    mut = MutatorConfig.for_game_mode(GameMode.SNOWDAY)
    assert mut.ball_radius == C.Snowday.PUCK_RADIUS
    assert mut.ball_mass == C.Snowday.PUCK_MASS_BT
    assert mut.ball_world_friction == C.Snowday.PUCK_FRICTION
    assert mut.ball_world_restitution == C.Snowday.PUCK_RESTITUTION


def test_heatseeker_homing_turns_ball_toward_goal(hs_arena):
    """A ball with a +Y target and pure +X velocity must curve toward the
    orange goal and blend its speed toward the current target speed."""
    state = hs_arena.default_state(())
    ball = state.ball.replace(
        pos=jnp.asarray([0.0, 0.0, 800.0]),
        vel=jnp.asarray([1400.0, 0.0, 0.0]),
        hs_info=state.ball.hs_info.replace(
            y_target_dir=jnp.float32(1.0),
            cur_target_speed=jnp.float32(C.Heatseeker.INITIAL_TARGET_SPEED)))
    state = state.replace(ball=ball)
    state = run_ticks(hs_arena, state, 30)

    vel = np.asarray(state.ball.vel)
    assert vel[1] > 200.0, f"ball should curve toward +Y goal, vel={vel}"
    speed = float(np.linalg.norm(vel))
    assert speed > 1500.0, "speed must blend up toward the target speed"
    assert float(state.ball.hs_info.time_since_hit) > 0.2


def test_heatseeker_without_target_is_ballistic(hs_arena):
    """y_target_dir == 0 -> no homing: the ball keeps a ~zero Y velocity."""
    state = hs_arena.default_state(())
    ball = state.ball.replace(
        pos=jnp.asarray([0.0, 0.0, 800.0]),
        vel=jnp.asarray([1400.0, 0.0, 0.0]))
    state = state.replace(ball=ball)
    state = run_ticks(hs_arena, state, 30)
    vel = np.asarray(state.ball.vel)
    assert abs(vel[1]) < 1.0
    assert vel[2] < 0.0  # gravity still applies


def test_heatseeker_kickoff_ball_spawn(hs_arena):
    """Heatseeker kickoff launches the ball from the side wall toward a
    random goal (Arena.cpp:128-143 heatseeker branch)."""
    state = hs_arena.default_state(())
    state = hs_arena.reset_to_random_kickoff(state, jax.random.PRNGKey(3))
    pos = np.asarray(state.ball.pos)
    start = np.asarray(C.Heatseeker.BALL_START_POS)
    np.testing.assert_allclose(pos[0], start[0], atol=1e-4)
    assert abs(abs(pos[1]) - abs(start[1])) < 1e-3
    vel = np.asarray(state.ball.vel)
    assert abs(vel[2] - C.Heatseeker.BALL_START_VEL[2]) < 1e-4


def test_snowday_puck_rests_on_ground():
    """A flat puck is a cylinder (Ball.cpp:51-81): dropped near the floor
    it settles at half its height (PUCK_HEIGHT/2 = 31.25), held by the
    ground-stick force (Ball.cpp:217-253 snowday branch)."""
    arena = Arena(game_mode=GameMode.SNOWDAY, teams=(0, 1))
    state = arena.default_state(())
    state = state.replace(ball=state.ball.replace(
        pos=jnp.asarray([0.0, 0.0, 60.0]),
        vel=jnp.asarray([10.0, 0.0, 0.0])))
    state = run_ticks(arena, state, 120)
    z = float(state.ball.pos[2])
    rest = C.Snowday.PUCK_HEIGHT / 2
    assert abs(z - rest) < 8.0, \
        f"flat puck should rest at ~{rest}, z={z}"


def test_snowday_puck_slides_with_low_friction():
    """PUCK_FRICTION = 0.1 (RLConst.h Snowday): a sliding puck keeps most
    of its speed over a second, unlike the soccar ball."""
    arena = Arena(game_mode=GameMode.SNOWDAY, teams=(0, 1))
    state = arena.default_state(())
    state = state.replace(ball=state.ball.replace(
        pos=jnp.asarray([-1000.0, 0.0, C.Snowday.PUCK_HEIGHT / 2]),
        vel=jnp.asarray([900.0, 0.0, 0.0])))
    state = run_ticks(arena, state, 120)
    speed = float(jnp.linalg.norm(state.ball.vel[:2]))
    assert speed > 500.0, f"puck decelerated too hard ({speed})"


def test_snowday_tilted_puck_settles_flat():
    """A puck dropped on its rim topples flat: the cylinder contact's
    off-axis impulse generates the righting torque."""
    from rlgymppo_cpp_tpu.maths.rot import euler_to_rotmat
    arena = Arena(game_mode=GameMode.SNOWDAY, teams=(0, 1))
    state = arena.default_state(())
    rot = euler_to_rotmat(jnp.float32(0.0), jnp.float32(0.0),
                          jnp.float32(1.0))     # 57 deg roll
    state = state.replace(ball=state.ball.replace(
        pos=jnp.asarray([0.0, 0.0, 150.0]), rot=rot,
        vel=jnp.asarray([0.0, 0.0, -50.0])))
    state = run_ticks(arena, state, 600)
    up_z = float(state.ball.rot[2, 2])
    z = float(state.ball.pos[2])
    assert abs(up_z) > 0.85, f"puck should settle flat-ish (axis z={up_z})"
    assert z < 80.0, f"puck should end near the floor (z={z})"


def test_void_has_no_world():
    """THE_VOID: no static geometry — a ball at kickoff height free-falls
    through where the floor would be (Arena.cpp:509-515)."""
    arena = Arena(game_mode=GameMode.THE_VOID, teams=(0, 1))
    state = arena.default_state(())
    state = state.replace(ball=state.ball.replace(
        pos=jnp.asarray([0.0, 0.0, 200.0]),
        vel=jnp.asarray([0.0, 0.0, -100.0])))
    state = run_ticks(arena, state, 120)
    # 1s of free fall from 200uu with -100uu/s: z ≈ 200 - 100 - g/2 ≈ -225
    assert float(state.ball.pos[2]) < -150.0


def test_random_state_respects_hoops_extents():
    """RandomState scales its soccar spawn margins to the active arena:
    in hoops (+-2967 x +-3581 walls) the soccar constants (+-3500 x
    +-4000) placed ~25% of entities inside/beyond the walls, which
    silently destroyed hoops training (symmetric junk rewards from
    embedded cars/balls drowned the learning signal)."""
    from rlgymppo_cpp_tpu.gym.state_setters import RandomState

    arena = Arena(game_mode=GameMode.HOOPS, teams=(0, 1))
    state = arena.default_state((16,))
    setter = RandomState(True, True, False)
    state = setter.reset(arena, state, jax.random.PRNGKey(3))
    bx, by, bz = [np.asarray(state.ball.pos[..., i]) for i in range(3)]
    cx, cy, cz = [np.asarray(state.cars.pos[..., i]) for i in range(3)]
    ex = C.ARENA_EXTENT_X_HOOPS
    ey = C.ARENA_EXTENT_Y_HOOPS
    ez = C.ARENA_HEIGHT_HOOPS
    for name, v, lim in (("ball x", bx, ex), ("ball y", by, ey),
                         ("car x", cx, ex), ("car y", cy, ey)):
        assert np.abs(v).max() < lim, (name, np.abs(v).max(), lim)
    assert bz.max() < ez and cz.max() < ez

    # soccar margins unchanged (reference RandomState.cpp parity)
    arena_s = Arena(game_mode=GameMode.SOCCAR, teams=(0, 1))
    st = setter.reset(arena_s, arena_s.default_state((64,)),
                      jax.random.PRNGKey(4))
    assert np.abs(np.asarray(st.ball.pos[..., 0])).max() > \
        C.ARENA_EXTENT_X_HOOPS  # uses the full soccar +-3500 range
