"""Native .cmf loader + SDF bake + MeshGeom queries, validated against a
synthetic box-room mesh (SURVEY.md §7 hard part 1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rlgymppo_cpp_tpu.sim.mesh_loader import load_cmf, save_cmf, bake_sdf
from rlgymppo_cpp_tpu.sim.mesh_geom import MeshGeom


def box_room_mesh(hx=1000.0, hy=1000.0, hz=500.0):
    """Inward-facing box: floor z=0, ceiling z=2*hz, walls at +-hx, +-hy."""
    v = []
    for x in (-hx, hx):
        for y in (-hy, hy):
            for z in (0.0, 2 * hz):
                v.append((x, y, z))
    verts = np.asarray(v, np.float32)
    # index helper: x*4 + y*2 + z with x,y,z in {0,1}
    def I(x, y, z):
        return x * 4 + y * 2 + z
    quads = [
        (I(0,0,0), I(1,0,0), I(1,1,0), I(0,1,0)),  # floor
        (I(0,0,1), I(1,0,1), I(1,1,1), I(0,1,1)),  # ceiling
        (I(0,0,0), I(0,1,0), I(0,1,1), I(0,0,1)),  # -x wall
        (I(1,0,0), I(1,1,0), I(1,1,1), I(1,0,1)),  # +x wall
        (I(0,0,0), I(1,0,0), I(1,0,1), I(0,0,1)),  # -y wall
        (I(0,1,0), I(1,1,0), I(1,1,1), I(0,1,1)),  # +y wall
    ]
    # Wind every quad so normals face the room interior: the SDF bake is
    # SIGNED by triangle winding (native/cmf_loader.cpp).
    center = np.asarray([0.0, 0.0, hz])
    tris = []
    for a, b, c, d in quads:
        av, bv, cv = verts[a].astype(float), verts[b].astype(float),             verts[c].astype(float)
        n = np.cross(bv - av, cv - av)
        if np.dot(n, center - (av + bv + cv) / 3.0) >= 0:
            tris += [(a, b, c), (a, c, d)]
        else:
            tris += [(a, c, b), (a, d, c)]
    return np.asarray(tris, np.int32), verts


def test_cmf_roundtrip_and_hash(tmp_path):
    tris, verts = box_room_mesh()
    path = str(tmp_path / "box.cmf")
    save_cmf(path, tris, verts)
    tris2, verts2, h = load_cmf(path)
    np.testing.assert_array_equal(tris, tris2)
    # verts round-trip through the file's BT units (UU/50 as float32)
    np.testing.assert_allclose(verts, verts2, rtol=1e-6, atol=1e-4)
    assert h != 0
    # Hash is deterministic
    _, _, h2 = load_cmf(path)
    assert h == h2


def test_cmf_rejects_garbage(tmp_path):
    bad = str(tmp_path / "bad.cmf")
    with open(bad, "wb") as f:
        f.write(np.int32(10).tobytes())
        f.write(np.int32(4).tobytes())
        f.write(b"\x00" * 8)   # truncated
    with pytest.raises(ValueError):
        load_cmf(bad)
    # Bad vertex index
    tris, verts = box_room_mesh()
    tris[0, 0] = 99
    bad2 = str(tmp_path / "bad2.cmf")
    save_cmf(bad2, tris, verts)
    with pytest.raises(ValueError):
        load_cmf(bad2)


def test_sdf_distances_match_analytic():
    tris, verts = box_room_mesh()
    dist, dirs, bmin, cell = bake_sdf(
        tris, verts, (-1100, -1100, -100), (1100, 1100, 1100),
        dims=(45, 45, 25), band=400.0)
    geom = MeshGeom(dist, dirs, bmin, cell)

    # Point near the center of the floor: distance == height
    d, n = geom._sample(jnp.asarray([[0.0, 0.0, 200.0]]))
    assert abs(float(d[0]) - 200.0) < 10.0
    assert float(n[0, 2]) > 0.9          # push direction: up

    # Near the +x wall
    d, n = geom._sample(jnp.asarray([[900.0, 0.0, 250.0]]))
    assert abs(float(d[0]) - 100.0) < 10.0
    assert float(n[0, 0]) < -0.9         # push direction: -x

    # Sphere contact
    depth, n = geom.sphere_contact(jnp.asarray([[0.0, 0.0, 80.0]]), 91.25)
    assert float(depth[0]) > 0
    depth, _ = geom.sphere_contact(jnp.asarray([[0.0, 0.0, 300.0]]), 91.25)
    assert float(depth[0]) < 0


def test_sdf_raycast():
    tris, verts = box_room_mesh()
    dist, dirs, bmin, cell = bake_sdf(
        tris, verts, (-1100, -1100, -100), (1100, 1100, 1100),
        dims=(45, 45, 25), band=400.0)
    geom = MeshGeom(dist, dirs, bmin, cell)

    start = jnp.asarray([[0.0, 0.0, 300.0]])
    down = jnp.asarray([[0.0, 0.0, -1.0]])
    hit, t, n = geom.raycast(start, down, jnp.asarray([500.0]))
    assert bool(hit[0])
    assert abs(float(t[0]) - 300.0) < 25.0

    up = jnp.asarray([[0.0, 0.0, 1.0]])
    hit, t, _ = geom.raycast(start, up, jnp.asarray([200.0]))
    assert not bool(hit[0])              # ceiling is 700 away


def test_sdf_signed_across_surface():
    """The field is SIGNED: linear across the surface (no |d| kink), so
    trilinear interpolation is exact AT the surface — the property that
    keeps suspension rays and contacts working (an unsigned field read
    ~half a cell of phantom clearance at the floor)."""
    tris, verts = box_room_mesh()
    dist, dirs, bmin, cell = bake_sdf(
        tris, verts, (-1100, -1100, -100), (1100, 1100, 1100),
        dims=(45, 45, 25), band=400.0)
    geom = MeshGeom(dist, dirs, bmin, cell)
    for z, want in ((150.0, 150.0), (50.0, 50.0), (0.0, 0.0),
                    (-50.0, -50.0)):
        d = float(geom._sample(jnp.asarray([[0.0, 0.0, z]]))[0][0])
        assert abs(d - want) < 3.0, (z, d)
    # push direction points back inside even from below the floor
    _, n = geom._sample(jnp.asarray([[0.0, 0.0, -30.0]]))
    assert float(n[0, 2]) > 0.9
