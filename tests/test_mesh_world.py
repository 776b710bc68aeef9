"""Mesh-backed arena world reachable from training (VERDICT r1 missing #1).

The generated soccar shell (sim/soccar_mesh.py) goes through the real .cmf
pipeline (save -> native parse/hash -> SDF bake) and backs an
Arena/Gym/Learner via `geom=`. These tests assert the physics behaves on
the mesh world — suspension rays find the floor, the ball bounces, goals
register — and that the rollout scan trains on it end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlgymppo_cpp_tpu.sim.arena import Arena, GameMode
from rlgymppo_cpp_tpu.sim.state import CarControls
from rlgymppo_cpp_tpu.sim.soccar_mesh import (
    make_soccar_mesh, make_soccar_mesh_geom,
)
from rlgymppo_cpp_tpu.sim import constants as C

# golden replays / multihost / learner e2e are the
# acceptance bar but dominate wall time: slow-marked, run
# with `pytest tests/ --runslow` (README "Testing")
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh_geom(tmp_path_factory):
    # coarse grid: fast bake, still exact on flat interior regions
    # (trilinear interpolation of a plane's distance field is exact)
    return make_soccar_mesh_geom(
        dims=(64, 88, 24),
        cache_dir=str(tmp_path_factory.mktemp("meshes")))


@pytest.fixture(scope="module")
def mesh_arena(mesh_geom):
    return Arena(GameMode.SOCCAR, teams=(0,), geom=mesh_geom)


def test_mesh_generation_valid():
    tris, verts = make_soccar_mesh()
    assert tris.min() >= 0 and tris.max() < len(verts)
    assert len(tris) > 30
    # shell containment: all verts inside the nominal bounds
    assert np.abs(verts[:, 0]).max() <= C.ARENA_EXTENT_X
    assert np.abs(verts[:, 1]).max() <= 6000.0


def test_mesh_floor_distance_exact(mesh_geom):
    """Interior floor distances are exact under trilinear interpolation."""
    pos = jnp.asarray([[0.0, 0.0, 200.0], [1000.0, -2000.0, 100.0]])
    d = mesh_geom.signed_distances(pos)[..., 0]
    np.testing.assert_allclose(np.asarray(d), [200.0, 100.0], atol=3.0)


def test_ball_bounces_on_mesh_floor(mesh_arena):
    arena = mesh_arena
    state = arena.default_state((1,))
    # epsilon velocity: a zero-vel ball sleeps in BOTH engines
    # (Arena.cpp:721-727)
    state = state.replace(ball=state.ball.replace(
        pos=jnp.asarray([[0.0, 0.0, 500.0]]),
        vel=jnp.asarray([[0.0, 0.0, -1.0]])))
    controls = CarControls.zeros((1, 1))
    key = jax.random.PRNGKey(0)
    step = arena.step_jit(30)
    min_z, bounced = 1e9, False
    for _ in range(12):
        state, _ = step(state, controls, key)
        z = float(state.ball.pos[0, 2])
        vz = float(state.ball.vel[0, 2])
        min_z = min(min_z, z)
        if vz > 100.0:
            bounced = True
    assert bounced, "ball never bounced on the mesh floor"
    assert min_z > C.BALL_REST_Z * 0.5


def test_car_rests_on_mesh_floor(mesh_arena):
    arena = mesh_arena
    state = arena.default_state((1,))
    controls = CarControls.zeros((1, 1))
    key = jax.random.PRNGKey(0)
    state, _ = arena.step_jit(120)(state, controls, key)
    assert bool(state.cars.is_on_ground[0, 0])
    assert 10.0 < float(state.cars.pos[0, 0, 2]) < 40.0


def test_car_drives_on_mesh(mesh_arena):
    arena = mesh_arena
    state = arena.default_state((1,))
    controls = CarControls.zeros((1, 1)).replace(
        throttle=jnp.ones((1, 1)))
    key = jax.random.PRNGKey(0)
    state, _ = arena.step_jit(120)(state, controls, key)
    speed = float(jnp.linalg.norm(state.cars.vel[0, 0]))
    assert speed > 300.0, f"car did not accelerate on mesh floor ({speed})"
    assert bool(state.cars.is_on_ground[0, 0])


def test_gym_trains_on_mesh(mesh_geom):
    """Gym(geom=...) + rollout scan: the mesh world in the training path."""
    from rlgymppo_cpp_tpu.gym import (
        Gym, Match, DiscreteAction, DefaultOBS, CombinedReward,
        VelocityPlayerToBallReward, NoTouchCondition, GoalScoreCondition,
        RandomState,
    )
    from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig

    match = Match(
        reward_fn=CombinedReward([(VelocityPlayerToBallReward(), 1.0)]),
        terminal_conditions=[NoTouchCondition(50), GoalScoreCondition()],
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        state_setter=RandomState(True, True, True),
        team_size=1, spawn_opponents=False,
    )
    gym = Gym(match, num_envs=4, tick_skip=8, geom=mesh_geom)
    assert gym.arena.geom is mesh_geom

    cfg = LearnerConfig(
        num_envs=4, timesteps_per_iteration=32, exp_buffer_size=32,
        ppo=PPOLearnerConfig(batch_size=32, mini_batch_size=0, epochs=1,
                             policy_layer_sizes=(32,),
                             critic_layer_sizes=(32,)),
        checkpoint_load_folder=None, checkpoint_save_folder=None,
        send_metrics=False,
    )
    learner = Learner(gym, cfg)
    assert learner._fused_eligible
    learner.learn(iterations=1)
    assert learner.total_timesteps == 32


# ---------------------------------------------------------------- hoops

@pytest.fixture(scope="module")
def hoops_geom(tmp_path_factory):
    from rlgymppo_cpp_tpu.sim.hoops_mesh import make_hoops_mesh_geom
    return make_hoops_mesh_geom(
        dims=(80, 96, 48),
        cache_dir=str(tmp_path_factory.mktemp("hoops_meshes")))


@pytest.fixture(scope="module")
def hoops_arena(hoops_geom):
    return Arena(GameMode.HOOPS, teams=(0,), geom=hoops_geom)


def test_hoops_net_detected(hoops_geom):
    """The 505-vertex net meshes land in the ball-only field
    (Arena.cpp:1041-1055 analog in MeshGeom.from_cmf)."""
    assert hoops_geom.has_net
    # net field has actual geometry (finite distances near the basket)
    from rlgymppo_cpp_tpu.sim.hoops_mesh import HOOP_CY, HOOP_R
    p = jnp.asarray([[0.0, HOOP_CY - HOOP_R - 30.0, 180.0]])
    d_ball = hoops_geom.signed_distances(p)[0, 0]
    d_car = hoops_geom.signed_distances(p, for_car=True)[0, 0]
    assert float(d_ball) < 120.0          # near the net shell
    assert float(d_car) > float(d_ball)   # car ignores the net


def test_hoops_ball_bounces_on_rim(hoops_arena):
    from rlgymppo_cpp_tpu.sim.hoops_mesh import HOOP_CY, RIM_TOP_Z
    arena = hoops_arena
    state = arena.default_state((1,))
    state = state.replace(ball=state.ball.replace(
        pos=jnp.asarray([[0.0, HOOP_CY - 746.0, 900.0]]),
        vel=jnp.asarray([[0.0, 0.0, -1.0]])))
    controls = CarControls.zeros((1, 1))
    key = jax.random.PRNGKey(0)
    step = arena.step_jit(30)
    bounced = False
    for _ in range(10):
        state, _ = step(state, controls, key)
        if float(state.ball.vel[0, 2]) > 100.0:
            bounced = True
    assert bounced, "ball never bounced on the hoop rim"
    # bounced off the rim top, never reached the floor
    assert float(state.ball.pos[0, 2]) > RIM_TOP_Z * 0.5


def test_hoops_car_drives_through_net(hoops_arena):
    """HOOPS_NET masking: a car crossing the basket footprint at ground
    level never decelerates (the net is ball-only)."""
    arena = hoops_arena
    state = arena.default_state((1,))
    cars = state.cars
    state = state.replace(cars=cars.replace(
        pos=jnp.asarray([[[0.0, 1900.0, 17.01]]]),
        rot=jnp.asarray(
            [[[[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]]]),
    ))
    controls = CarControls.zeros((1, 1)).replace(
        throttle=jnp.ones((1, 1)))
    key = jax.random.PRNGKey(0)
    state, _ = arena.step_jit(140)(state, controls, key)
    # crossed both walls of the near net shell (y 2301..2361)
    assert float(state.cars.pos[0, 0, 1]) > 2500.0
    assert float(state.cars.vel[0, 0, 1]) > 900.0
