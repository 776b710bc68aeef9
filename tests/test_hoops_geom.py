"""Hoops arena geometry + goal detection (Arena.cpp hoops paths)."""

import numpy as np
import jax.numpy as jnp

from rlgymppo_cpp_tpu.sim.arena import Arena
from rlgymppo_cpp_tpu.sim.arena_geom import make_hoops_geom
from rlgymppo_cpp_tpu.sim.constants import GameMode
from rlgymppo_cpp_tpu.sim import constants as C
import pytest

# golden replays / multihost / learner e2e are the
# acceptance bar but dominate wall time: slow-marked, run
# with `pytest tests/ --runslow` (README "Testing")
pytestmark = pytest.mark.slow


def test_hoops_geom_contacts():
    g = make_hoops_geom()
    r = 96.3831   # hoops ball radius

    # Resting on the floor mid-field
    depth, n = g.sphere_contact(jnp.asarray([[0.0, 0.0, r - 5]]), r)
    assert float(depth[0]) > 0 and float(n[0, 2]) > 0.9

    # Free air
    depth, _ = g.sphere_contact(jnp.asarray([[0.0, 0.0, 800.0]]), r)
    assert float(depth[0]) < 0

    # Inside the +y basket at low z: contained by the net's inside face
    # (pushed +y, away from the arena) when pressing against it
    y_front = 2770.0 / 0.9 - 716.0
    depth, n = g.sphere_contact(
        jnp.asarray([[0.0, y_front + 50.0, 100.0]]), r)
    assert float(depth[0]) > 0
    assert float(n[0, 1]) > 0.9

    # Arena side of the net front wall: pushed -y (bounces off the net)
    depth, n = g.sphere_contact(
        jnp.asarray([[0.0, y_front - 50.0, 100.0]]), r)
    assert float(depth[0]) > 0
    assert float(n[0, 1]) < -0.9

    # Above rim height the net has no collision
    depth, _ = g.sphere_contact(
        jnp.asarray([[0.0, y_front + 1.0, 600.0]]), r)
    assert float(depth[0]) < 0


def test_hoops_arena_scoring():
    arena = Arena(game_mode=GameMode.HOOPS, teams=(0, 1))
    # Ball settled inside the hoop below the threshold -> scored
    pos = jnp.asarray([[0.0, 2770.0 / 0.9, 100.0]])
    assert bool(arena.is_ball_scored(pos)[0])
    # Mid-field is not a goal
    assert not bool(arena.is_ball_scored(jnp.asarray([[0.0, 0.0, 100.0]]))[0])
    # Above threshold z: not yet scored
    high = jnp.asarray([[0.0, 2770.0 / 0.9, 500.0]])
    assert not bool(arena.is_ball_scored(high)[0])


def test_hoops_net_is_ball_only():
    """The net mesh has car collision disabled in the reference
    (CollisionMasks::HOOPS_NET, Arena.cpp:1037-1053): car queries must
    pass straight through the net surfaces while ball queries collide."""
    g = make_hoops_geom()
    r = 96.3831
    y_front = 2770.0 / 0.9 - 716.0
    probe = jnp.asarray([[0.0, y_front - 50.0, 100.0]])

    ball_depth, _ = g.sphere_contact(probe, r, for_car=False)
    car_depth, _ = g.sphere_contact(probe, r, for_car=True)
    assert float(ball_depth[0]) > 0
    assert float(car_depth[0]) < 0, "car must not collide with the net"

    # suspension-style ray driving through the net footprint hits only
    # the floor, never a net wall
    start = jnp.asarray([[0.0, y_front - 5.0, 30.0]])
    down = jnp.asarray([[0.0, 0.0, -1.0]])
    hit, t, n = g.raycast(start, down, jnp.asarray([60.0]), for_car=True)
    assert bool(hit[0]) and float(n[0, 2]) > 0.9


def test_hoops_net_cylinder_shape():
    """The net is round: contacts at 45 degrees around the basket axis
    push radially, not axis-aligned."""
    g = make_hoops_geom()
    r = 96.3831
    cy = 2770.0 / 0.9
    d = (716.0 + 40.0) / np.sqrt(2.0)
    probe = jnp.asarray([[d, cy - d, 100.0]])
    depth, n = g.sphere_contact(probe, r)
    assert float(depth[0]) > 0
    # radial outward normal ~ (1, -1, 0)/sqrt(2) (arena side, 45 deg)
    assert abs(float(n[0, 0]) - 1 / np.sqrt(2)) < 0.05
    assert abs(float(n[0, 1]) + 1 / np.sqrt(2)) < 0.05
