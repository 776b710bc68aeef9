"""Static arena collision geometry as a branchless plane soup.

The reference collides against `.cmf` triangle meshes through bullet BVHs plus
4-6 backstop planes (Arena.cpp:1015-1121), and short-circuits most suspension
rays to analytic planes via a voxel grid (SuspensionCollisionGrid.cpp:124-183).
Pointer-chasing BVHs are hostile to XLA, so here the *entire* static world is a
fixed set of bounded planes — floor, ceiling, walls, 45-degree corner wedges,
and goal boxes — queried with dense vectorized math. Every query touches every
plane; with ~24 planes that is a few hundred VPU flops per body, far cheaper
than any gather.

Each plane is (normal, offset, region_min, region_max): signed distance is
`dot(n, p) - d` (positive inside the arena) and the plane only applies when
the query point lies inside its region AABB. This keeps goal openings exact
up to edge rounding. A mesh-derived SDF backend can replace this class
without touching callers.

Known approximations vs the real arena mesh (acceptable for training; the
reference itself documents RocketSim as approximate):
  - floor/wall/ceiling transition curves are sharp edges here,
  - goal posts are hard edges of the opening regions,
  - goal interior is a plain box.
"""

import functools

import numpy as np
import jax.numpy as jnp

from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim.constants import GameMode

INF = 1e30

# Approximate goal dims (RLBot wiki values, used by the reference's own
# goal prediction, Arena.cpp:846-849) and RL goal depth.
GOAL_HALF_WIDTH = 892.755
GOAL_HEIGHT = 642.775
BACK_NET_Y = 6000.0
# Ceiling plane of the real soccar mesh (CommonValues CEILING_Z); the
# backstop plane in the reference sits at ARENA_HEIGHT=2048 but the mesh
# surface is at 2044.
CEILING_Z = 2044.0
# Corner wedge offset: |x| + |y| = 8064 on the 45-degree corner walls.
CORNER_INTERSECTION = 8064.0
# Floor-wall transition curve radius used by both the analytic fillet
# primitives here and the triangulated shell (sim/soccar_mesh.py); matches
# the authored golden fillet world (tools/golden/recorder.cpp
# filletCmfBytes, R=260).
FILLET_RADIUS = 260.0


class ArenaGeom:
    """Bounded-plane world for one game mode. Static, hashable, jit-friendly."""

    def __init__(self, normals, offsets, region_min, region_max,
                 car_collides=None, ball_cylinders=(), fillets=(),
                 fillet_octant=False):
        """`car_collides` [NP] bool: False marks ball-only surfaces (the
        Hoops net: RocketSim adds the 505-vert net mesh with car collision
        disabled via CollisionMasks::HOOPS_NET, Arena.cpp:1037-1053,
        CollisionMasks.h:8-11). Car queries pass for_car=True and skip
        those planes at trace time.

        `fillets`: concave quarter-cylinder floor-wall transitions — the
        real arena's curved surfaces as ANALYTIC primitives (pure VPU
        arithmetic, no gathers, unlike the SDF-grid backend whose random
        gathers dominate its cost on TPU). Each row is
        (p0x, p0y, ux, uy, inx, iny, radius, length): the wall base line
        starts at (p0x, p0y, z=0), runs along the horizontal unit (ux,
        uy) for `length`, with horizontal inward wall normal (inx, iny);
        the cylinder axis sits at base + inward*radius at z=radius, and
        the surface spans the quarter from the wall tangent (z=radius)
        to the floor tangent. Golden-validated against the reference's
        faceted BVH fillet by the mesh_fillet_* traces.

        `fillet_octant`: the fillet rows describe only the first octant
        (x >= 0, y >= 0) of an x/y-mirror-symmetric world; queries fold
        the point into the octant (|x|, |y|) and unfold the resulting
        normal. The soccar bowl's 10 fillets collapse to 3 unique rows
        this way — 3.3x less fillet arithmetic per query. Fold choice is
        per query point; surfaces crossing a mirror plane must be
        continuous through it (the side-wall fillet is) and rays must be
        short relative to their distance from the planes (suspension
        rays are ~70 uu, fillets sit at |x|>3800)."""
        self.normals = jnp.asarray(normals, dtype=jnp.float32)        # [NP, 3]
        self.offsets = jnp.asarray(offsets, dtype=jnp.float32)        # [NP]
        self.region_min = jnp.asarray(region_min, dtype=jnp.float32)  # [NP, 3]
        self.region_max = jnp.asarray(region_max, dtype=jnp.float32)  # [NP, 3]
        self.num_planes = self.normals.shape[0]
        if car_collides is None:
            car_collides = np.ones(self.num_planes, bool)
        self.car_collides = np.asarray(car_collides, bool)
        # ball-only vertical cylinder surfaces: (cx, cy, radius, z_max)
        # rows — used for the hoops net (see make_hoops_geom)
        self.ball_cylinders = tuple(
            tuple(float(v) for v in c) for c in ball_cylinders)
        self.fillets = tuple(tuple(float(v) for v in f) for f in fillets)
        self.fillet_octant = bool(fillet_octant)

    def signed_distances(self, pos, for_car=False):
        """Signed distance of `pos` [..., 3] to every applicable plane.

        Returns [..., NP]; inapplicable planes read +INF. `for_car`
        excludes ball-only surfaces (hoops net)."""
        d = jnp.einsum("...k,pk->...p", pos, self.normals) - self.offsets
        if for_car and not self.car_collides.all():
            d = jnp.where(jnp.asarray(self.car_collides), d, INF)
        inside = jnp.all(
            (pos[..., None, :] >= self.region_min)
            & (pos[..., None, :] <= self.region_max),
            axis=-1,
        )
        return jnp.where(inside, d, INF)

    def _fold(self, pos):
        """Octant fold for fillet queries: -> (folded pos, sign vector
        [..., 3] that unfolds a folded-frame normal). Identity when
        fillet_octant is off."""
        if not self.fillet_octant:
            return pos, jnp.ones((3,), pos.dtype)
        signs = jnp.concatenate(
            [jnp.where(pos[..., :2] >= 0.0, 1.0, -1.0),
             jnp.ones_like(pos[..., 2:])], axis=-1)
        return pos * signs, signs

    def sphere_contact(self, pos, radius, for_car=False):
        """Deepest sphere-vs-world contact.

        Returns (depth [...], normal [..., 3]); depth > 0 means penetration
        of the sphere surface (dist < radius).
        """
        dists = self.signed_distances(pos, for_car=for_car)
        depths = radius - dists                       # [..., NP]
        best = jnp.argmax(depths, axis=-1)
        depth = jnp.take_along_axis(depths, best[..., None], axis=-1)[..., 0]
        normal = self.normals[best]
        if self.fillets:
            fpos, signs = self._fold(pos)
            for (p0x, p0y, ux, uy, inx, iny, R, L) in self.fillets:
                ax_, ay_ = p0x + inx * R, p0y + iny * R
                v = fpos - jnp.asarray([ax_, ay_, R])
                t = v[..., 0] * ux + v[..., 1] * uy
                r = v - t[..., None] * jnp.asarray([ux, uy, 0.0])
                rd = jnp.linalg.norm(r, axis=-1)
                sect = ((r[..., 0] * inx + r[..., 1] * iny <= 0.0)
                        & (r[..., 2] <= 0.0) & (t >= 0.0) & (t <= L))
                fdepth = radius - (R - rd)
                fnormal = (-r / jnp.maximum(rd, 1e-6)[..., None]) * signs
                better = sect & (fdepth > depth)
                depth = jnp.where(better, fdepth, depth)
                normal = jnp.where(better[..., None], fnormal, normal)
        if not for_car:
            for (ccx, ccy, r_cyl, z_max) in self.ball_cylinders:
                dxy = pos[..., :2] - jnp.asarray([ccx, ccy])
                rd = jnp.linalg.norm(dxy, axis=-1)
                side = jnp.where(rd >= r_cyl, 1.0, -1.0)
                cdepth = radius - jnp.abs(rd - r_cyl)
                cnormal = jnp.concatenate(
                    [dxy * (side / jnp.maximum(rd, 1e-6))[..., None],
                     jnp.zeros_like(rd)[..., None]], axis=-1)
                applic = (pos[..., 2] >= 0.0) & (pos[..., 2] <= z_max)
                better = applic & (cdepth > depth)
                depth = jnp.where(better, cdepth, depth)
                normal = jnp.where(better[..., None], cnormal, normal)
        return depth, normal

    def raycast(self, start, direction, max_len, for_car=False):
        """Analytic ray vs all planes; `direction` must be unit length.

        Returns (hit [...] bool, t [...], normal [..., 3]). Matches the
        suspension-grid fast path semantics: nearest front-face hit whose
        hit point lies in the plane's region.
        """
        n_dot_dir = jnp.einsum("...k,pk->...p", direction, self.normals)
        n_dot_p0 = jnp.einsum("...k,pk->...p", start, self.normals)
        denom = jnp.where(jnp.abs(n_dot_dir) > 1e-9, n_dot_dir, -1e-9)
        t = (self.offsets - n_dot_p0) / denom         # [..., NP]
        # Only hits moving into the surface, within range
        valid = (n_dot_dir < -1e-9) & (t >= 0.0) & (t <= max_len[..., None])
        if for_car and not self.car_collides.all():
            valid = valid & jnp.asarray(self.car_collides)
        hit_point = start[..., None, :] + direction[..., None, :] * t[..., None]
        in_region = jnp.all(
            (hit_point >= self.region_min - 1e-3)
            & (hit_point <= self.region_max + 1e-3),
            axis=-1,
        )
        valid = valid & in_region
        t_masked = jnp.where(valid, t, INF)
        best = jnp.argmin(t_masked, axis=-1)
        best_t = jnp.take_along_axis(t_masked, best[..., None], axis=-1)[..., 0]
        normal = self.normals[best]
        if self.fillets:
            fstart, signs = self._fold(start)
            fdir = direction * signs
            for (p0x, p0y, ux, uy, inx, iny, R, L) in self.fillets:
                axis_pt = jnp.asarray([p0x + inx * R, p0y + iny * R, R])
                u = jnp.asarray([ux, uy, 0.0])
                w = fstart - axis_pt
                w = w - (w @ u)[..., None] * u
                q = fdir - (fdir @ u)[..., None] * u
                a = jnp.sum(q * q, axis=-1)
                b = 2.0 * jnp.sum(w * q, axis=-1)
                c = jnp.sum(w * w, axis=-1) - R * R
                disc = b * b - 4.0 * a * c
                ok = (a > 1e-12) & (disc >= 0.0)
                # exit root: a ray inside the concave surface (rd < R)
                # crosses it at the larger root, moving outward =>
                # front-face by construction (normal points at the axis)
                th = (-b + jnp.sqrt(jnp.maximum(disc, 0.0))) \
                    / jnp.maximum(2.0 * a, 1e-12)
                hp = fstart + fdir * th[..., None]
                v = hp - axis_pt
                tt = v @ u
                r = v - tt[..., None] * u
                sect = ((r[..., 0] * inx + r[..., 1] * iny <= 0.0)
                        & (r[..., 2] <= 0.0) & (tt >= 0.0) & (tt <= L))
                ok = (ok & sect & (th >= 0.0) & (th <= max_len)
                      & (th < best_t))
                fnormal = (-r / R) * signs
                best_t = jnp.where(ok, th, best_t)
                normal = jnp.where(ok[..., None], fnormal, normal)
        hit = best_t < INF
        return hit, jnp.where(hit, best_t, max_len), normal


    # ------------------------------------------------ env-last core queries
    #
    # Static python loops over the (small, constant) plane list: every
    # iteration is a handful of fused elementwise select ops on fully
    # lane-packed arrays. No [NP, ...] intermediates, no argmax+gather —
    # gathers profiled as the hottest kernels of the tick on TPU. Region
    # bounds that are infinite are skipped at trace time.

    @functools.cached_property
    def _np_planes(self):
        import numpy as np
        return (np.asarray(self.normals), np.asarray(self.offsets),
                np.asarray(self.region_min), np.asarray(self.region_max))

    def _region_mask(self, px, py, pz, rmin, rmax, pad=0.0):
        import numpy as np
        mask = None

        def acc(m, cond):
            return cond if m is None else (m & cond)

        for comp, lo, hi in ((px, rmin[0], rmax[0]),
                             (py, rmin[1], rmax[1]),
                             (pz, rmin[2], rmax[2])):
            if lo > -INF / 2:
                mask = acc(mask, comp >= lo - pad)
            if hi < INF / 2:
                mask = acc(mask, comp <= hi + pad)
        return mask

    def sphere_contact_core(self, pos, radius, for_car=False):
        """V3 of [...] -> (depth [...], normal V3 of [...])."""
        from rlgymppo_cpp_tpu.maths.v3 import V3
        normals, offsets, rmins, rmaxs = self._np_planes
        shape = pos.x.shape
        best_depth = jnp.full(shape, -INF)
        nx = jnp.zeros(shape)
        ny = jnp.zeros(shape)
        nz = jnp.ones(shape)
        for p in range(self.num_planes):
            if for_car and not self.car_collides[p]:
                continue
            n0, n1, n2 = (float(normals[p, 0]), float(normals[p, 1]),
                          float(normals[p, 2]))
            dist = n0 * pos.x + n1 * pos.y + n2 * pos.z - float(offsets[p])
            depth = radius - dist
            mask = self._region_mask(pos.x, pos.y, pos.z,
                                     rmins[p], rmaxs[p])
            better = depth > best_depth
            if mask is not None:
                better = better & mask
            best_depth = jnp.where(better, depth, best_depth)
            nx = jnp.where(better, n0, nx)
            ny = jnp.where(better, n1, ny)
            nz = jnp.where(better, n2, nz)
        if self.fillets:
            if self.fillet_octant:
                sgx = jnp.where(pos.x >= 0.0, 1.0, -1.0)
                sgy = jnp.where(pos.y >= 0.0, 1.0, -1.0)
                fx, fy = pos.x * sgx, pos.y * sgy
            else:
                sgx = sgy = 1.0
                fx, fy = pos.x, pos.y
            for (p0x, p0y, ux, uy, inx, iny, R, L) in self.fillets:
                # concave quarter-cylinder: solid where rd > R inside the
                # wall-floor quarter sector; ~20 fused elementwise ops, no
                # gathers (see class docstring)
                vx = fx - (p0x + inx * R)
                vy = fy - (p0y + iny * R)
                vz = pos.z - R
                t = vx * ux + vy * uy
                rx = vx - t * ux
                ry = vy - t * uy
                rd = jnp.sqrt(rx * rx + ry * ry + vz * vz)
                sect = ((rx * inx + ry * iny <= 0.0) & (vz <= 0.0)
                        & (t >= 0.0) & (t <= L))
                depth = radius - (R - rd)
                inv = -1.0 / jnp.maximum(rd, 1e-6)
                better = sect & (depth > best_depth)
                best_depth = jnp.where(better, depth, best_depth)
                nx = jnp.where(better, rx * inv * sgx, nx)
                ny = jnp.where(better, ry * inv * sgy, ny)
                nz = jnp.where(better, vz * inv, nz)
        if not for_car:
            for (ccx, ccy, r_cyl, z_max) in self.ball_cylinders:
                # double-sided vertical cylinder (hoops net): the normal
                # points from the surface toward the ball's side
                dxp = pos.x - ccx
                dyp = pos.y - ccy
                rd = jnp.sqrt(dxp * dxp + dyp * dyp)
                side = jnp.where(rd >= r_cyl, 1.0, -1.0)
                depth = radius - jnp.abs(rd - r_cyl)
                inv = side / jnp.maximum(rd, 1e-6)
                applic = (pos.z >= 0.0) & (pos.z <= z_max)
                better = applic & (depth > best_depth)
                best_depth = jnp.where(better, depth, best_depth)
                nx = jnp.where(better, dxp * inv, nx)
                ny = jnp.where(better, dyp * inv, ny)
                nz = jnp.where(better, 0.0, nz)
        return best_depth, V3(nx, ny, nz)

    def raycast_core(self, start, direction, max_len, for_car=False):
        """V3 starts/dirs of [...] -> (hit [...], t [...], normal V3)."""
        from rlgymppo_cpp_tpu.maths.v3 import V3
        normals, offsets, rmins, rmaxs = self._np_planes
        shape = start.x.shape
        best_t = jnp.full(shape, INF)
        nx = jnp.zeros(shape)
        ny = jnp.zeros(shape)
        nz = jnp.ones(shape)
        for p in range(self.num_planes):
            if for_car and not self.car_collides[p]:
                continue
            n0, n1, n2 = (float(normals[p, 0]), float(normals[p, 1]),
                          float(normals[p, 2]))
            n_dot_dir = n0 * direction.x + n1 * direction.y \
                + n2 * direction.z
            n_dot_p0 = n0 * start.x + n1 * start.y + n2 * start.z
            denom = jnp.where(jnp.abs(n_dot_dir) > 1e-9, n_dot_dir, -1e-9)
            t = (float(offsets[p]) - n_dot_p0) / denom
            valid = (n_dot_dir < -1e-9) & (t >= 0.0) & (t <= max_len)
            hx = start.x + direction.x * t
            hy = start.y + direction.y * t
            hz = start.z + direction.z * t
            mask = self._region_mask(hx, hy, hz, rmins[p], rmaxs[p],
                                     pad=1e-3)
            if mask is not None:
                valid = valid & mask
            better = valid & (t < best_t)
            best_t = jnp.where(better, t, best_t)
            nx = jnp.where(better, n0, nx)
            ny = jnp.where(better, n1, ny)
            nz = jnp.where(better, n2, nz)
        if self.fillets:
            if self.fillet_octant:
                sgx = jnp.where(start.x >= 0.0, 1.0, -1.0)
                sgy = jnp.where(start.y >= 0.0, 1.0, -1.0)
            else:
                sgx = sgy = 1.0
            sx_, sy_ = start.x * sgx, start.y * sgy
            dx_, dy_ = direction.x * sgx, direction.y * sgy
            for (p0x, p0y, ux, uy, inx, iny, R, L) in self.fillets:
                # exact ray vs the concave quarter-cylinder (see raycast)
                axx, axy = p0x + inx * R, p0y + iny * R
                wx0 = sx_ - axx
                wy0 = sy_ - axy
                wz0 = start.z - R
                wu = wx0 * ux + wy0 * uy
                wx = wx0 - wu * ux
                wy = wy0 - wu * uy
                du = dx_ * ux + dy_ * uy
                qx = dx_ - du * ux
                qy = dy_ - du * uy
                qz = direction.z
                a = qx * qx + qy * qy + qz * qz
                b = 2.0 * (wx * qx + wy * qy + wz0 * qz)
                c = wx * wx + wy * wy + wz0 * wz0 - R * R
                disc = b * b - 4.0 * a * c
                ok = (a > 1e-12) & (disc >= 0.0)
                th = (-b + jnp.sqrt(jnp.maximum(disc, 0.0))) \
                    / jnp.maximum(2.0 * a, 1e-12)
                hx = sx_ + dx_ * th - axx
                hy = sy_ + dy_ * th - axy
                hz = start.z + direction.z * th - R
                tt = hx * ux + hy * uy
                rx = hx - tt * ux
                ry = hy - tt * uy
                sect = ((rx * inx + ry * iny <= 0.0) & (hz <= 0.0)
                        & (tt >= 0.0) & (tt <= L))
                ok = (ok & sect & (th >= 0.0) & (th <= max_len)
                      & (th < best_t))
                inv = -1.0 / R
                best_t = jnp.where(ok, th, best_t)
                nx = jnp.where(ok, rx * inv * sgx, nx)
                ny = jnp.where(ok, ry * inv * sgy, ny)
                nz = jnp.where(ok, hz * inv, nz)
        hit = best_t < INF
        return hit, jnp.where(hit, best_t, max_len), V3(nx, ny, nz)


def _plane(n, d, rmin=(-INF, -INF, -INF), rmax=(INF, INF, INF), car=True):
    return (np.asarray(n, np.float64), float(d),
            np.asarray(rmin, np.float64), np.asarray(rmax, np.float64),
            bool(car))


def _build(planes, ball_cylinders=(), fillets=(), fillet_octant=False):
    return ArenaGeom(
        np.stack([p[0] for p in planes]).astype(np.float32),
        np.array([p[1] for p in planes], dtype=np.float32),
        np.stack([p[2] for p in planes]).astype(np.float32),
        np.stack([p[3] for p in planes]).astype(np.float32),
        np.array([p[4] for p in planes], dtype=bool),
        ball_cylinders=ball_cylinders, fillets=fillets,
        fillet_octant=fillet_octant)


def fillet_row(p0, p1, inward, radius=FILLET_RADIUS):
    """ArenaGeom fillet tuple for the wall base line p0 -> p1 (z=0
    points) with horizontal unit inward normal `inward`."""
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    d = p1 - p0
    length = float(np.hypot(d[0], d[1]))
    u = d / length
    return (float(p0[0]), float(p0[1]), float(u[0]), float(u[1]),
            float(inward[0]), float(inward[1]), float(radius), length)


def soccar_fillet_rows(octant=True):
    """The floor-wall transition curves of the soccar bowl — side walls,
    corner wedges, and back walls either side of the goal mouth —
    mirroring sim/soccar_mesh.py's faceted strips (same lines, same
    radius). Goal-mouth and wall-wall seams stay sharp, as in the
    triangulated shell.

    `octant=True` (used with ArenaGeom(fillet_octant=True)) exploits the
    bowl's x/y mirror symmetry: 3 unique rows instead of 10 — the side
    wall (continuous through y=0, folded to its y>=0 half), the first
    corner wedge, and the back-wall segment beside the goal."""
    s2 = np.sqrt(0.5)
    ex, ey = C.ARENA_EXTENT_X, C.ARENA_EXTENT_Y
    gw = GOAL_HALF_WIDTH
    yw = CORNER_INTERSECTION - ex
    xw = CORNER_INTERSECTION - ey
    if octant:
        return (fillet_row((ex, 0.0), (ex, yw), (-1.0, 0.0)),
                fillet_row((ex, yw), (xw, ey), (-s2, -s2)),
                fillet_row((gw, ey), (xw, ey), (0.0, -1.0)))
    rows = []
    for sx in (1.0, -1.0):
        rows.append(fillet_row((sx * ex, -yw), (sx * ex, yw), (-sx, 0.0)))
        for sy in (1.0, -1.0):
            rows.append(fillet_row((sx * ex, sy * yw), (sx * xw, sy * ey),
                                   (-sx * s2, -sy * s2)))
    for sy in (1.0, -1.0):
        rows.append(fillet_row((gw, sy * ey), (xw, sy * ey), (0.0, -sy)))
        rows.append(fillet_row((-xw, sy * ey), (-gw, sy * ey), (0.0, -sy)))
    return tuple(rows)


def make_soccar_geom(fillets=False) -> ArenaGeom:
    """`fillets=True` adds the analytic quarter-cylinder floor-wall
    transitions — the realistic curved bowl at plane-soup cost (pure
    elementwise arithmetic; the SDF mesh backend's random gathers cost
    ~10x more per tick on TPU). Default False keeps the sharp-seam world
    the plane-world golden traces were recorded against."""
    s = np.sqrt(0.5)
    gw, gh, ny = GOAL_HALF_WIDTH, GOAL_HEIGHT, BACK_NET_Y
    ex, ey, ez = C.ARENA_EXTENT_X, C.ARENA_EXTENT_Y, CEILING_Z

    planes = [
        # Floor (extends into goals) and ceiling
        _plane((0, 0, 1), 0.0),
        _plane((0, 0, -1), -ez, rmax=(INF, ey, INF), rmin=(-INF, -ey, -INF)),
        # Side walls
        _plane((-1, 0, 0), -ex),
        _plane((1, 0, 0), -ex),
        # 45-degree corner wedges
        _plane((-s, -s, 0), -CORNER_INTERSECTION * s),
        _plane((s, -s, 0), -CORNER_INTERSECTION * s),
        _plane((-s, s, 0), -CORNER_INTERSECTION * s),
        _plane((s, s, 0), -CORNER_INTERSECTION * s),
    ]
    for sign in (1.0, -1.0):
        # Back wall split into 3 regions around the goal opening
        n = (0.0, -sign, 0.0)
        d = -ey
        planes += [
            _plane(n, d, rmin=(-INF, -INF, gh)),                      # above goal
            _plane(n, d, rmin=(gw, -INF, -INF)),                      # beside (+x)
            _plane(n, d, rmax=(-gw, INF, INF)),                       # beside (-x)
        ]
        # Goal box interior (only applies beyond the back wall)
        in_goal_min = (-INF, ey, -INF) if sign > 0 else (-INF, -INF, -INF)
        in_goal_max = (INF, INF, INF) if sign > 0 else (INF, -ey, INF)
        planes += [
            _plane((0.0, -sign, 0.0), -ny, rmin=in_goal_min, rmax=in_goal_max),  # net
            _plane((1, 0, 0), -gw, rmin=in_goal_min, rmax=in_goal_max),   # left wall
            _plane((-1, 0, 0), -gw, rmin=in_goal_min, rmax=in_goal_max),  # right wall
            _plane((0, 0, -1), -gh, rmin=in_goal_min, rmax=in_goal_max),  # goal roof
        ]

    return _build(planes,
                  fillets=soccar_fillet_rows(octant=True) if fillets
                  else (),
                  fillet_octant=bool(fillets))


def make_hoops_geom() -> ArenaGeom:
    """Hoops arena as bounded planes.

    Real hoops arena collision is a mesh (RocketSim loads hoops .cmf files,
    RocketSim.cpp:29-36); approximations here: sharp floor/wall edges, 45°
    corner wedges, and the basket nets as square boxes around the hoop
    footprint of Arena::IsBallScored (center |y| = 2770/0.9 ≈ 3077.8,
    radius 716, rim height ~365 per IsBallProbablyGoingIn's
    APPROX_RIM_HEIGHT, Arena.cpp:866-869). Each net wall is a pair of
    region-gated one-sided planes so balls bounce off the outside while
    balls that drop in are contained until they fall below the scoring
    threshold.
    """
    s = np.sqrt(0.5)
    ex, ey, ez = C.ARENA_EXTENT_X_HOOPS, C.ARENA_EXTENT_Y_HOOPS, \
        C.ARENA_HEIGHT_HOOPS
    rim_h = 365.0
    hoop_r = 716.0
    hoop_cy = 2770.0 / 0.9
    corner = ex + ey - 1152.0     # same wedge inset as soccar's 8064

    planes = [
        _plane((0, 0, 1), 0.0),                      # floor
        _plane((0, 0, -1), -ez),                     # ceiling
        _plane((-1, 0, 0), -ex),                     # side walls
        _plane((1, 0, 0), -ex),
        _plane((0, -1, 0), -ey),                     # back walls
        _plane((0, 1, 0), -ey),
        # 45-degree corner wedges
        _plane((-s, -s, 0), -corner * s),
        _plane((s, -s, 0), -corner * s),
        _plane((-s, s, 0), -corner * s),
        _plane((s, s, 0), -corner * s),
    ]
    # Hoops nets: analytic vertical cylinder surfaces, BALL-ONLY
    # (RocketSim adds the 505-vert net mesh with car collision masked out
    # — CollisionMasks::HOOPS_NET, Arena.cpp:1037-1053,
    # CollisionMasks.h:8-11 — so cars drive straight through the net while
    # balls bounce off it / stay contained after dropping in). A cylinder
    # is the net's actual shape up to mesh facets, is double-sided by
    # construction (the contact normal flips with the side the ball is
    # on), and has no region-AABB corner artifacts.
    cylinders = [(0.0, hoop_cy * sign, hoop_r, rim_h)
                 for sign in (1.0, -1.0)]

    return _build(planes, ball_cylinders=cylinders)


def make_void_geom() -> ArenaGeom:
    """THE_VOID: no static world at all (Arena.cpp:509-515)."""
    normals = np.zeros((1, 3), dtype=np.float32)
    normals[0, 2] = 1.0
    offsets = np.array([-INF], dtype=np.float32)  # floor infinitely far below
    rmin = np.full((1, 3), -INF, dtype=np.float32)
    rmax = np.full((1, 3), INF, dtype=np.float32)
    return ArenaGeom(normals, offsets, rmin, rmax)


def make_geom(game_mode: GameMode) -> ArenaGeom:
    if game_mode in (GameMode.SOCCAR, GameMode.HEATSEEKER, GameMode.SNOWDAY):
        return make_soccar_geom()
    if game_mode == GameMode.HOOPS:
        return make_hoops_geom()
    if game_mode == GameMode.THE_VOID:
        return make_void_geom()
    raise NotImplementedError(f"geometry for {game_mode!r} not implemented yet")
