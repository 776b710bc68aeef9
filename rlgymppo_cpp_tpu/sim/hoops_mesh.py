"""Triangulated hoops arena + basket meshes -> mesh-world construction.

The reference's hoops world is 6 analytic planes + dumped `.cmf` meshes
for the floor details, corner wedges, and the two baskets; the basket NET
is the mesh with exactly 505 vertices, which Arena adds with collision
group/mask CollisionMasks::HOOPS_NET so only the ball collides with it
(Arena.cpp:1041-1055, Arena.h:164, Ball.cpp:109). The dumps are
proprietary, so — like sim/soccar_mesh.py — this module *generates* an
equivalent arena: the hoops shell (floor/ceiling/walls/corner wedges,
same dimensions as sim/arena_geom.make_hoops_geom), a solid rim ring per
basket (ordinary world collision), and a 505-vertex annular net shell per
basket (ball-only). Everything goes through the real `.cmf` pipeline
(save_cmf -> native parse/hash -> SDF bake); `MeshGeom.from_cmf` detects
the 505-vertex nets exactly as the reference does and routes them into
the ball-only field.

Basket placement matches Arena::IsBallScored / BallWithinHoopsGoalXYMarginSq:
center (0, +-2770/0.9), radius 716, APPROX_RIM_HEIGHT 365
(Arena.cpp:816-826, 866-869). Golden-trace parity for this geometry class
(rim bounce, net bounce, drop-in containment, car-through-net masking) is
asserted in tests/test_golden_traces.py's hoopsmesh_* scenarios.
"""

import os
import tempfile

import numpy as np

from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim.soccar_mesh import _MeshBuilder

HOOP_CY = 2770.0 / 0.9          # basket center |y|  (Arena.cpp:816-826)
HOOP_R = 716.0                  # basket radius      (:820)
RIM_Z = 365.0                   # APPROX_RIM_HEIGHT  (:866-869)
RIM_TOP_Z = 415.0
SHELL_THICKNESS = 60.0
NET_SEGMENTS = 126              # 4*126 = 504 verts + 1 dummy = 505
RIM_SEGMENTS = 48


def _annular_shell(m, cx, cy, ri, ro, z0, z1, segments):
    """Closed tube with rectangular cross-section around (cx, cy), wound
    with normals away from the material (same construction as the golden
    recorder's annularShellCmf)."""
    base = len(m.verts)
    # rings: 0 = outer@z0, 1 = outer@z1, 2 = inner@z1, 3 = inner@z0
    for ring in range(4):
        r = ro if ring < 2 else ri
        z = z1 if ring in (1, 2) else z0
        for i in range(segments):
            a = 2.0 * np.pi * i / segments
            m.verts.append((cx + r * np.cos(a), cy + r * np.sin(a), z))

    def vtx(ring, i):
        return base + ring * segments + (i % segments)

    rm, zm = (ri + ro) / 2.0, (z0 + z1) / 2.0
    for i in range(segments):
        j = i + 1
        am = 2.0 * np.pi * (i + 0.5) / segments
        # free-side reference points per face (outside the material)
        out_ref = (cx + (ro + 50) * np.cos(am), cy + (ro + 50) * np.sin(am), zm)
        in_ref = (cx + (ri - 50) * np.cos(am), cy + (ri - 50) * np.sin(am), zm)
        top_ref = (cx + rm * np.cos(am), cy + rm * np.sin(am), z1 + 50)
        bot_ref = (cx + rm * np.cos(am), cy + rm * np.sin(am), z0 - 50)
        m.quad_idx(vtx(0, i), vtx(0, j), vtx(1, j), vtx(1, i), out_ref)
        m.quad_idx(vtx(2, i), vtx(2, j), vtx(3, j), vtx(3, i), in_ref)
        m.quad_idx(vtx(1, i), vtx(1, j), vtx(2, j), vtx(2, i), top_ref)
        m.quad_idx(vtx(3, i), vtx(3, j), vtx(0, j), vtx(0, i), bot_ref)


def make_hoops_shell():
    """-> (tris, verts) for the hoops bowl: floor, ceiling, side/back
    walls, 45-degree corner wedges (dimensions of make_hoops_geom) plus a
    solid rim ring per basket."""
    ex, ey, ez = (C.ARENA_EXTENT_X_HOOPS, C.ARENA_EXTENT_Y_HOOPS,
                  C.ARENA_HEIGHT_HOOPS)
    corner = ex + ey - 1152.0
    m = _MeshBuilder()
    bowl = (0.0, 0.0, ez / 2)

    m.quad((-ex, -ey, 0), (ex, -ey, 0), (ex, ey, 0), (-ex, ey, 0), bowl)
    m.quad((-ex, -ey, ez), (ex, -ey, ez), (ex, ey, ez), (-ex, ey, ez),
           bowl)
    # side walls x = +-ex and back walls y = +-ey (full spans; the wedges
    # cover the corners in front of them)
    for sx in (1.0, -1.0):
        m.quad((sx * ex, -ey, 0), (sx * ex, ey, 0),
               (sx * ex, ey, ez), (sx * ex, -ey, ez), bowl)
    for sy in (1.0, -1.0):
        m.quad((-ex, sy * ey, 0), (ex, sy * ey, 0),
               (ex, sy * ey, ez), (-ex, sy * ey, ez), bowl)
    # 45-degree corner wedges: |x| + |y| = corner
    for sx in (1.0, -1.0):
        for sy in (1.0, -1.0):
            a = (sx * ex, sy * (corner - ex))
            b = (sx * (corner - ey), sy * ey)
            m.quad((a[0], a[1], 0), (b[0], b[1], 0),
                   (b[0], b[1], ez), (a[0], a[1], ez), bowl)
    # rims (world collision; cars bonk)
    for sy in (1.0, -1.0):
        _annular_shell(m, 0.0, sy * HOOP_CY, HOOP_R,
                       HOOP_R + SHELL_THICKNESS, RIM_Z, RIM_TOP_Z,
                       RIM_SEGMENTS)
    return m.arrays()


def make_hoops_net(sign):
    """-> (tris, verts) for one basket's net shell, EXACTLY 505 vertices
    (504 used + 1 unreferenced dummy) so both this pipeline and the
    reference classify it as the ball-only hoops net."""
    m = _MeshBuilder()
    _annular_shell(m, 0.0, sign * HOOP_CY, HOOP_R,
                   HOOP_R + SHELL_THICKNESS, 0.0, RIM_Z, NET_SEGMENTS)
    m.verts.append(m.verts[0])
    tris, verts = m.arrays()
    assert verts.shape[0] == 505, verts.shape
    return tris, verts


HOOPS_SDF_DIMS = (160, 192, 96)
HOOPS_BOUNDS_MIN = (-C.ARENA_EXTENT_X_HOOPS - 64.0,
                    -C.ARENA_EXTENT_Y_HOOPS - 64.0, -64.0)
HOOPS_BOUNDS_MAX = (C.ARENA_EXTENT_X_HOOPS + 64.0,
                    C.ARENA_EXTENT_Y_HOOPS + 64.0,
                    C.ARENA_HEIGHT_HOOPS + 64.0)


def make_hoops_mesh_geom(dims=HOOPS_SDF_DIMS, band=300.0, cache_dir=None):
    """Generate the hoops arena + baskets, round-trip through the .cmf
    pipeline, and return the baked MeshGeom (with the ball-only net
    field). Cached as .npz like make_soccar_mesh_geom."""
    from rlgymppo_cpp_tpu.sim.mesh_geom import MeshGeom
    from rlgymppo_cpp_tpu.sim.mesh_loader import save_cmf

    cache_dir = cache_dir or os.path.join(
        tempfile.gettempdir(), "rlgymppo_tpu_meshes")
    os.makedirs(cache_dir, exist_ok=True)
    key = "x".join(map(str, dims))
    npz_path = os.path.join(cache_dir, f"hoops_sdf_v1_{key}.npz")

    if os.path.exists(npz_path):
        with np.load(npz_path) as z:
            return MeshGeom(z["dist"], z["dirs"], z["bounds_min"],
                            z["cell"], z["net_dist"], z["net_dirs"])

    paths = []
    for name, (tris, verts) in (
            ("hoops_world_generated", make_hoops_shell()),
            ("hoops_net_blue_generated", make_hoops_net(-1.0)),
            ("hoops_net_orange_generated", make_hoops_net(1.0))):
        p = os.path.join(cache_dir, name + ".cmf")
        save_cmf(p, tris, verts)
        paths.append(p)

    geom = MeshGeom.from_cmf(paths, HOOPS_BOUNDS_MIN, HOOPS_BOUNDS_MAX,
                             dims=dims, band=band, game_mode_name="hoops")
    np.savez_compressed(
        npz_path, dist=np.asarray(geom.dist), dirs=np.asarray(geom.dirs),
        bounds_min=np.asarray(geom.bounds_min),
        cell=np.asarray(geom.cell), net_dist=np.asarray(geom.net_dist),
        net_dirs=np.asarray(geom.net_dirs))
    return geom
