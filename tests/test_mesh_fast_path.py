"""Pointwise bounds on the mesh world's fast path vs the exact path.

The training mesh world (MeshGeom(fast=True), the default) trades
bounded sub-uu field error for ~3x fewer gather bytes — int16 fixed-point
tables, one-gather extrapolated suspension marches, pair-shared wheel
ctxs (mesh_geom.py MeshGeom.__init__ docstring). Trajectory-level golden
traces CANNOT pin that path: they track the compiled reference at sub-uu
precision over thousands of chaotic ticks, where even the 0.03 uu
quantization step compounds to tens of uu of divergence (this is also
how the round-3 fast-path regression slipped in: the approximations were
unconditional and the slow-marked goldens weren't run). So the goldens
pin fast=False, and THIS test pins fast=True to fast=False pointwise:
per-query deviations must stay inside the measured envelope.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rlgymppo_cpp_tpu.maths.v3 import V3
from rlgymppo_cpp_tpu.sim.mesh_geom import MeshGeom


def _wedge_world(dims=(64, 64, 48)):
    """Synthetic bake: floor + a 30-degree wedge ramp — planar regions
    with a concave seam, the exact geometry class where extrapolation
    errs. Built directly as a distance field (no .cmf dependency).
    Cell sizes match the soccar production bake (~64 uu laterally,
    ~32 uu vertically): the pair-shared fast path's precondition is
    wheel offsets <= ~1.5 cells, which 25 uu cells would violate."""
    bounds_min = np.array([-2000.0, -2000.0, -80.0])
    cell = np.array([64.0, 64.0, 32.0])
    xs = bounds_min[0] + cell[0] * np.arange(dims[0])
    ys = bounds_min[1] + cell[1] * np.arange(dims[1])
    zs = bounds_min[2] + cell[2] * np.arange(dims[2])
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    d_floor = Z
    n_ramp = np.array([-np.sin(np.pi / 6), 0.0, np.cos(np.pi / 6)])
    d_ramp = (X - 100.0) * n_ramp[0] + Z * n_ramp[2]
    dist = np.minimum(d_floor, d_ramp).astype(np.float32)
    dirs = np.where((d_floor < d_ramp)[..., None],
                    np.array([0.0, 0.0, 1.0]), n_ramp).astype(np.float32)
    return dist, dirs, bounds_min, cell


@pytest.fixture(scope="module")
def worlds():
    dist, dirs, bmin, cell = _wedge_world()
    fast = MeshGeom(dist, dirs, bmin, cell, fast=True)
    exact = MeshGeom(dist, dirs, bmin, cell, fast=False)
    return fast, exact


def _points(n, seed):
    r = np.random.RandomState(seed)
    p = r.uniform([-1800, -1800, 5], [1800, 1800, 400], size=(n, 3))
    return p.astype(np.float32)


def test_sphere_contact_quantization_bound(worlds):
    """int16 tables: depth within 0.1 uu, normals within 1e-2 of exact."""
    fast, exact = worlds
    pts = _points(20000, 0)
    p = jnp.asarray(pts)
    dq, nq = fast.sphere_contact(p, 20.0)
    df, nf = exact.sphere_contact(p, 20.0)
    assert float(jnp.max(jnp.abs(dq - df))) < 0.1
    assert float(jnp.max(jnp.abs(nq - nf))) < 1e-2


def test_suspension_rays_bound(worlds):
    """Pair-shared one-gather suspension rays: <0.5% hit mismatches (seam
    cells only), sub-uu mean ray-t error on agreeing rays."""
    fast, exact = worlds
    n = 8192
    pts = _points(4 * n, 1).reshape(4, n, 3)
    # 4 'wheels' of each car within one wheelbase of each other
    base = pts[0]
    offs = np.array([[55, 27, -5], [55, -27, -5],
                     [-55, 27, -5], [-55, -27, -5]], np.float32)
    hp = base[None, :, :] + offs[:, None, :]
    start = V3(jnp.asarray(hp[..., 0]), jnp.asarray(hp[..., 1]),
               jnp.asarray(hp[..., 2]))
    dirn = V3(jnp.zeros((4, n)), jnp.zeros((4, n)),
              jnp.full((4, n), -1.0))
    ml = jnp.full((4, n), 70.0)

    hq, tq, nq = fast.suspension_raycast_core(start, dirn, ml)
    hf, tf, nf = exact.raycast_core(start, dirn, ml, for_car=True)
    hq, tq = np.asarray(hq), np.asarray(tq)
    hf, tf = np.asarray(hf), np.asarray(tf)

    # SOLID exact hits (contact well before the ray's end) must all be
    # found by the fast path EXCEPT near the concave seam, where the
    # extrapolated one-gather march can stall above the hit threshold.
    # This wedge world is seam-dense by construction (a full-width seam
    # line); the real soccar ramp world measured 0.08% total mismatches.
    solid = hf & (tf < 70.0 - 5.0)
    missed = solid & ~hq
    assert missed.mean() < 0.03, f"solid hits missed {missed.mean():.4f}"
    if missed.any():
        seam_x = 100.0
        base_x = np.broadcast_to(base[None, :, 0], missed.shape)
        # contact x of a straight-down ray ~ the wheel x; every miss must
        # sit within 2 wheelbases of the seam line
        off_seam = missed & (np.abs(base_x - seam_x) > 260.0)
        assert not off_seam.any(), \
            f"{off_seam.sum()} misses far from the seam"
    both = hq & hf
    terr = np.abs(tq - tf)[both]
    assert terr.mean() < 0.5, f"mean ray-t err {terr.mean():.3f}"
    assert np.percentile(terr, 95) < 2.0
    # false-positive fast hits must be marginal (t at the ray's end)
    fp = hq & ~hf
    if fp.any():
        assert tq[fp].min() > 70.0 - 10.0


def test_exact_path_is_float32_multigather(worlds):
    """The golden-pinned path must stay unquantized and must re-gather at
    the marched point (the round-3 regression made both unconditional)."""
    fast, exact = worlds
    assert not exact.quantized
    assert np.asarray(exact._packed_full).dtype == np.float32
    assert fast.quantized
    assert np.asarray(fast._packed_full).dtype == np.int16
