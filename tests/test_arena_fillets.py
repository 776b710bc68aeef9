"""Analytic quarter-cylinder fillet primitives (sim/arena_geom.py).

The filleted soccar bowl is the TPU-first answer to the reference's
curved arena meshes (RocketSim.cpp:102-212): the floor-wall transition
curves as closed-form primitives — pure elementwise arithmetic, no SDF
gathers (which profiled ~10x slower per tick). End-to-end behavior vs
the compiled reference is asserted by tests/test_golden_traces.py's
test_analytic_fillet_trace; this file covers the geometry math and the
octant symmetry folding.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rlgymppo_cpp_tpu.maths.v3 import V3
from rlgymppo_cpp_tpu.sim.arena_geom import (
    ArenaGeom, FILLET_RADIUS, INF, fillet_row, make_soccar_geom,
    soccar_fillet_rows,
)

# golden replays / multihost / learner e2e are the
# acceptance bar but dominate wall time: slow-marked, run
# with `pytest tests/ --runslow` (README "Testing")
pytestmark = pytest.mark.slow


def _single_fillet_geom():
    """Floor + -x wall + one fillet (the golden fillet world's shape)."""
    normals = np.array([[0, 0, 1], [1, 0, 0]], np.float32)
    offsets = np.array([0.0, -4096.0], np.float32)
    rmin = np.full((2, 3), -INF, np.float32)
    rmax = np.full((2, 3), INF, np.float32)
    return ArenaGeom(normals, offsets, rmin, rmax,
                     fillets=(fillet_row((-4096.0, -1200.0),
                                         (-4096.0, 1200.0), (1.0, 0.0)),))


def test_fillet_contact_45deg():
    g = _single_fillet_geom()
    R = FILLET_RADIUS
    ang = np.deg2rad(225.0)
    px = -4096.0 + R + R * np.cos(ang)
    pz = R + R * np.sin(ang)
    d, n = g.sphere_contact(jnp.asarray([[px, 0.0, pz]]), 93.15)
    assert abs(float(d[0]) - 93.15) < 1e-3
    assert np.allclose(np.asarray(n[0]), [np.sqrt(0.5), 0, np.sqrt(0.5)],
                       atol=1e-4)
    dv, nv = g.sphere_contact_core(
        V3(jnp.asarray([px]), jnp.asarray([0.0]), jnp.asarray([pz])), 93.15)
    assert abs(float(dv[0]) - 93.15) < 1e-3
    assert abs(float(nv.x[0]) - np.sqrt(0.5)) < 1e-4
    assert abs(float(nv.z[0]) - np.sqrt(0.5)) < 1e-4


def test_fillet_contact_outside_sector_ignored():
    g = _single_fillet_geom()
    # above the axis height: the wall plane must own the contact
    d, n = g.sphere_contact(jnp.asarray([[-4060.0, 0.0, 800.0]]), 93.15)
    assert np.allclose(np.asarray(n[0]), [1, 0, 0], atol=1e-5)
    # beyond the y extent: floor owns it
    d, n = g.sphere_contact(jnp.asarray([[-3900.0, 1500.0, 50.0]]), 93.15)
    assert np.allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-5)


def test_fillet_raycast_from_axis():
    g = _single_fillet_geom()
    R = FILLET_RADIUS
    s = V3(jnp.asarray([-4096.0 + R]), jnp.asarray([0.0]),
           jnp.asarray([R]))
    d = V3(jnp.asarray([-np.sqrt(0.5)]), jnp.asarray([0.0]),
           jnp.asarray([-np.sqrt(0.5)]))
    hit, t, n = g.raycast_core(s, d, jnp.asarray([1000.0]))
    assert bool(hit[0]) and abs(float(t[0]) - R) < 1e-2
    assert abs(float(n.x[0]) - np.sqrt(0.5)) < 1e-4
    hb, tb, nb = g.raycast(jnp.asarray([[-4096.0 + R, 0.0, R]]),
                           jnp.asarray([[-np.sqrt(0.5), 0.0,
                                         -np.sqrt(0.5)]]),
                           jnp.asarray([1000.0]))
    assert bool(hb[0]) and abs(float(tb[0]) - R) < 1e-2


def test_fillet_ray_misses_outside_sector():
    g = _single_fillet_geom()
    # straight down far from the wall: floor hit at start z, not fillet
    s = V3(jnp.asarray([-3000.0]), jnp.asarray([0.0]), jnp.asarray([40.0]))
    d = V3(jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([-1.0]))
    hit, t, n = g.raycast_core(s, d, jnp.asarray([100.0]))
    assert bool(hit[0]) and abs(float(t[0]) - 40.0) < 1e-3
    assert abs(float(n.z[0]) - 1.0) < 1e-5


@pytest.mark.parametrize("seed", [0, 1])
def test_octant_fold_equivalence(seed):
    """The 3-row octant-folded soccar fillets are bit-identical to the
    explicit 10-row layout across all four query paths."""
    g_oct = make_soccar_geom(fillets=True)
    assert g_oct.fillet_octant and len(g_oct.fillets) == 3
    g_full = make_soccar_geom(fillets=False)
    g_full.fillets = soccar_fillet_rows(octant=False)
    assert len(g_full.fillets) == 10

    rng = np.random.default_rng(seed)
    N = 512
    pos = np.stack([rng.uniform(-4100, 4100, N),
                    rng.uniform(-5200, 5200, N),
                    rng.uniform(-10, 600, N)], -1).astype(np.float32)
    p = jnp.asarray(pos)
    d1, n1 = g_oct.sphere_contact(p, 93.15)
    d2, n2 = g_full.sphere_contact(p, 93.15)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))

    pv = V3(p[:, 0], p[:, 1], p[:, 2])
    d1c, n1c = g_oct.sphere_contact_core(pv, 93.15)
    d2c, n2c = g_full.sphere_contact_core(pv, 93.15)
    np.testing.assert_array_equal(np.asarray(d1c), np.asarray(d2c))
    for a, b in ((n1c.x, n2c.x), (n1c.y, n2c.y), (n1c.z, n2c.z)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    dirs = rng.normal(size=(N, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dv = jnp.asarray(dirs.astype(np.float32))
    ml = jnp.full((N,), 120.0)
    h1, t1, m1 = g_oct.raycast(p, dv, ml)
    h2, t2, m2 = g_full.raycast(p, dv, ml)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    sv = V3(p[:, 0], p[:, 1], p[:, 2])
    dvv = V3(dv[:, 0], dv[:, 1], dv[:, 2])
    h1c, t1c, _ = g_oct.raycast_core(sv, dvv, ml)
    h2c, t2c, _ = g_full.raycast_core(sv, dvv, ml)
    np.testing.assert_array_equal(np.asarray(h1c), np.asarray(h2c))
    np.testing.assert_array_equal(np.asarray(t1c), np.asarray(t2c))


def test_plane_world_unchanged_without_fillets():
    g = make_soccar_geom()
    assert g.fillets == () and not g.fillet_octant
