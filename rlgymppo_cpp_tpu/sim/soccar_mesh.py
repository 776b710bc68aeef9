"""Triangulated soccar arena + mesh-world construction.

The reference ships the soccar arena as dumped `.cmf` triangle meshes
(RocketSim.cpp:102-212 loads them, CollisionMeshFile.cpp parses). Those
dumps are proprietary game data and are not vendored here; instead this
module *generates* an equivalent arena shell — floor, ceiling, side walls,
45-degree corner wedges, back walls with goal openings, and full goal
boxes (same dimensions as sim/arena_geom.py's plane soup) — writes it
through the real `.cmf` pipeline (save_cmf -> native parse/hash/validate ->
SDF bake), and returns a MeshGeom the Arena/Gym/Learner can train on.

If official `.cmf` dumps ARE available (e.g. a `collision_meshes/soccar/`
folder like the reference uses), pass their paths to
`MeshGeom.from_cmf` directly instead — the hash whitelist in
sim/mesh_loader.py will recognize them.
"""

import os
import tempfile

import numpy as np

from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim.arena_geom import (
    GOAL_HALF_WIDTH, GOAL_HEIGHT, BACK_NET_Y, CEILING_Z,
    CORNER_INTERSECTION,
)


class _MeshBuilder:
    """Quads -> triangles with consistent INWARD winding.

    The SDF baker (native/cmf_loader.cpp) derives the distance sign from
    each triangle's normal; every quad must be wound so its normal points
    toward the playable side. `ref` is any point on that side."""

    def __init__(self):
        self.verts = []
        self.tris = []

    def quad(self, a, b, c, d, ref):
        i = len(self.verts)
        self.verts += [a, b, c, d]
        av, bv, cv = (np.asarray(a, np.float64), np.asarray(b, np.float64),
                      np.asarray(c, np.float64))
        n = np.cross(bv - av, cv - av)
        centroid = (av + bv + cv) / 3.0
        if np.dot(n, np.asarray(ref, np.float64) - centroid) >= 0:
            self.tris += [(i, i + 1, i + 2), (i, i + 2, i + 3)]
        else:
            self.tris += [(i, i + 2, i + 1), (i, i + 3, i + 2)]

    def quad_idx(self, ia, ib, ic, id_, ref):
        """Quad over EXISTING vertex indices, same winding rule as quad
        (normal toward `ref`, a point on the free side)."""
        av, bv, cv = (np.asarray(self.verts[ia], np.float64),
                      np.asarray(self.verts[ib], np.float64),
                      np.asarray(self.verts[ic], np.float64))
        n = np.cross(bv - av, cv - av)
        centroid = (av + bv + cv) / 3.0
        if np.dot(n, np.asarray(ref, np.float64) - centroid) >= 0:
            self.tris += [(ia, ib, ic), (ia, ic, id_)]
        else:
            self.tris += [(ia, ic, ib), (ia, id_, ic)]

    def arrays(self):
        return (np.asarray(self.tris, np.int32),
                np.asarray(self.verts, np.float32))


FILLET_RADIUS = 260.0
FILLET_SEGS = 10


def _floor_fillet(m, p0, p1, inward):
    """Concave quarter-pipe strip along the wall-floor corner line
    p0 -> p1 (both at z = 0 ON the wall base), `inward` the wall's unit
    inward normal. Runs tangent from the wall at z = R to the floor at
    inward * R — the real arena's curved floor-wall transition
    (golden-validated against the reference BVH pipeline by the
    mesh_fillet_* scenarios, recorder.cpp filletCmfBytes)."""
    R, S = FILLET_RADIUS, FILLET_SEGS
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    inward = np.asarray(inward, np.float64)
    rows = []
    for i in range(S + 1):
        phi = 0.5 * np.pi * i / S
        off = inward * (R - R * np.cos(phi))
        z = R - R * np.sin(phi)
        rows.append(((p0[0] + off[0], p0[1] + off[1], z),
                     (p1[0] + off[0], p1[1] + off[1], z)))
    mid = (p0 + p1) / 2
    axis_ref = (mid[0] + inward[0] * R, mid[1] + inward[1] * R, R)
    for i in range(S):
        (a0, b0), (a1, b1) = rows[i], rows[i + 1]
        m.quad(a0, b0, b1, a1, axis_ref)


def make_soccar_mesh(fillets=True):
    """-> (tris int32 [T, 3], verts float32 [V, 3]) for the soccar shell.

    Same surfaces as arena_geom.make_soccar_geom (so mesh-world training
    is directly comparable to the plane-soup world), plus — by default —
    quarter-pipe floor-wall fillets along the side walls, corner wedges
    and back walls, the curved transitions the real dumped arena has and
    every wall play rides through. `fillets=False` gives the sharp-seam
    shell (the exact analytic-plane counterpart)."""
    ex, ey, ez = C.ARENA_EXTENT_X, C.ARENA_EXTENT_Y, CEILING_Z
    gw, gh, ny = GOAL_HALF_WIDTH, GOAL_HEIGHT, BACK_NET_Y
    yw = CORNER_INTERSECTION - ex          # side-wall y extent (3968)
    xw = CORNER_INTERSECTION - ey          # back-wall x extent (2944)

    m = _MeshBuilder()
    bowl = (0.0, 0.0, ez / 2)          # interior reference of the bowl

    # Floor (whole bowl incl. goal mouths) and ceiling
    m.quad((-ex, -ny, 0), (ex, -ny, 0), (ex, ny, 0), (-ex, ny, 0), bowl)
    m.quad((-ex, -ey, ez), (ex, -ey, ez), (ex, ey, ez), (-ex, ey, ez),
           bowl)

    # Side walls x = +/-ex over the un-wedged y span
    for sx in (1.0, -1.0):
        m.quad((sx * ex, -yw, 0), (sx * ex, yw, 0),
               (sx * ex, yw, ez), (sx * ex, -yw, ez), bowl)

    # 45-degree corner wedges: from (sx*ex, sy*yw) to (sx*xw, sy*ey)
    for sx in (1.0, -1.0):
        for sy in (1.0, -1.0):
            a = (sx * ex, sy * yw)
            b = (sx * xw, sy * ey)
            m.quad((a[0], a[1], 0), (b[0], b[1], 0),
                   (b[0], b[1], ez), (a[0], a[1], ez), bowl)

    # Back walls y = +/-ey: 3 regions around the goal opening
    for sy in (1.0, -1.0):
        y = sy * ey
        goal = (0.0, sy * (ey + ny) / 2, gh / 2)   # goal-box interior
        m.quad((-xw, y, gh), (xw, y, gh), (xw, y, ez), (-xw, y, ez), bowl)
        m.quad((gw, y, 0), (xw, y, 0), (xw, y, gh), (gw, y, gh), bowl)
        m.quad((-xw, y, 0), (-gw, y, 0), (-gw, y, gh), (-xw, y, gh), bowl)

        # Goal box: net, side walls, roof
        yn = sy * ny
        m.quad((-gw, yn, 0), (gw, yn, 0), (gw, yn, gh), (-gw, yn, gh),
               goal)
        for sx in (1.0, -1.0):
            m.quad((sx * gw, y, 0), (sx * gw, yn, 0),
                   (sx * gw, yn, gh), (sx * gw, y, gh), goal)
        m.quad((-gw, y, gh), (gw, y, gh), (gw, yn, gh), (-gw, yn, gh),
               goal)

    if fillets:
        s2 = np.sqrt(0.5)
        for sx in (1.0, -1.0):
            # side walls
            _floor_fillet(m, (sx * ex, -yw, 0), (sx * ex, yw, 0),
                          (-sx, 0.0))
            for sy in (1.0, -1.0):
                # corner wedges
                _floor_fillet(m, (sx * ex, sy * yw, 0),
                              (sx * xw, sy * ey, 0),
                              (-sx * s2, -sy * s2))
        for sy in (1.0, -1.0):
            # back walls either side of the goal mouth
            _floor_fillet(m, (gw, sy * ey, 0), (xw, sy * ey, 0),
                          (0.0, -sy))
            _floor_fillet(m, (-xw, sy * ey, 0), (-gw, sy * ey, 0),
                          (0.0, -sy))

    return m.arrays()


SOCCAR_SDF_DIMS = (128, 176, 48)
SOCCAR_BOUNDS_MIN = (-C.ARENA_EXTENT_X - 64.0, -BACK_NET_Y - 64.0, -64.0)
SOCCAR_BOUNDS_MAX = (C.ARENA_EXTENT_X + 64.0, BACK_NET_Y + 64.0,
                     CEILING_Z + 64.0)


def make_soccar_mesh_geom(dims=SOCCAR_SDF_DIMS, band=300.0, cache_dir=None):
    """Generate the arena shell, round-trip it through the .cmf pipeline
    (write -> native parse + hash + whitelist check -> SDF bake), and
    return the baked MeshGeom.

    The baked grids are cached as .npz next to the .cmf (one bake per
    process tree; the bake is multithreaded C++ but still ~seconds)."""
    from rlgymppo_cpp_tpu.sim.mesh_geom import MeshGeom
    from rlgymppo_cpp_tpu.sim.mesh_loader import save_cmf, load_cmf, bake_sdf

    cache_dir = cache_dir or os.path.join(
        tempfile.gettempdir(), "rlgymppo_tpu_meshes")
    os.makedirs(cache_dir, exist_ok=True)
    cmf_path = os.path.join(cache_dir, "soccar_generated.cmf")
    key = "x".join(map(str, dims))
    npz_path = os.path.join(cache_dir, f"soccar_sdf_v3_{key}.npz")

    if os.path.exists(npz_path):
        with np.load(npz_path) as z:
            return MeshGeom(z["dist"], z["dirs"], z["bounds_min"], z["cell"])

    tris, verts = make_soccar_mesh()
    save_cmf(cmf_path, tris, verts)
    tris2, verts2, _h = load_cmf(cmf_path)   # validating native parse
    dist, dirs, bmin, cell = bake_sdf(
        tris2, verts2, SOCCAR_BOUNDS_MIN, SOCCAR_BOUNDS_MAX, dims, band)
    np.savez_compressed(npz_path, dist=dist, dirs=dirs, bounds_min=bmin,
                        cell=cell)
    return MeshGeom(dist, dirs, bmin, cell)
