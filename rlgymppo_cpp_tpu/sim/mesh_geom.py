"""Mesh-derived arena geometry: dense SDF grid sampled on-device.

The TPU-friendly replacement for bullet's btBvhTriangleMeshShape +
internal-edge fixup (RocketSim.cpp:165-170): the native pipeline
(sim/mesh_loader.py -> native/cmf_loader.cpp) bakes the arena triangle
soup into a distance + push-direction grid once on the host; queries are
then pure gathers + trilinear interpolation, identical cost for 1 or
10,000 arenas under vmap.

API-compatible with ArenaGeom (sphere_contact / raycast / signed_distances
callers), so `Arena(geom=...)`-style swapping needs no caller changes.
Raycasts sphere-trace the grid with a fixed iteration count (branchless,
scan-friendly), mirroring how most suspension rays short-circuit to cheap
analytic queries in the reference (SuspensionCollisionGrid.cpp:124-183).

Ball-only surfaces (the hoops net): RocketSim detects the 505-vertex net
mesh and adds it with collision group/mask CollisionMasks::HOOPS_NET so
only the ball collides with it (Arena.cpp:1041-1055, Arena.h:164,
Ball.cpp:109, CollisionMasks.h:8-11). Here that is a SECOND distance grid
(`net_dist`/`net_dirs`, same bounds/cell as the main grid): queries with
`for_car=True` read only the main grid; ball queries take the closer of
the two fields.
"""

import numpy as np
import jax.numpy as jnp

INF = 1e30


MIN_CURVE_RADIUS = 260.0      # tightest curve treated as smooth (the
                              # arena fillet radius, recorder.cpp)


def _encode_dirs(dirs, cell):
    """Normalize node push-directions and mark SEAM nodes (any axis
    neighbor whose direction differs by more than the crease threshold)
    by leaving them unit length; smooth nodes are scaled to 2.0. The
    sampler then picks the normal source per query from the gathered
    vector's length alone: nearest-node direction at seams (sharp
    creases like wall-floor, where the trilinear gradient would blend
    the two planes into a 45 degree mush), analytic trilinear gradient
    on smooth/curved surfaces (where per-node constant directions are a
    staircase).

    The threshold adapts to resolution: on a smooth curve of radius R,
    adjacent node directions differ by ~cell/R radians, so the floor is
    1.6 * max_cell / MIN_CURVE_RADIUS (never below 12 deg — authored
    facet steps like the 12-segment quarter-pipe's 7.5 deg stay smooth,
    real creases like the 26.6 deg ramp seam or 90 deg wall-floor are
    far above it at golden-trace resolutions)."""
    d = np.asarray(dirs, np.float32)
    thresh = max(np.radians(12.0),
                 1.6 * float(np.max(cell)) / MIN_CURVE_RADIUS)
    seam_cos = np.cos(thresh)
    n = np.linalg.norm(d, axis=-1, keepdims=True)
    dn = d / np.maximum(n, 1e-9)
    smooth = np.ones(d.shape[:3], bool)
    for axis in range(3):
        a = np.swapaxes(dn, 0, axis)
        dot = np.sum(a[1:] * a[:-1], axis=-1)
        bad = dot < seam_cos
        m = np.swapaxes(smooth, 0, axis)
        m[1:] &= ~bad
        m[:-1] &= ~bad
    return dn * np.where(smooth, 2.0, 1.0)[..., None]


def _corner_pack(dist):
    """Cell (i,j,k) holds its 8 corner distances contiguously, so one
    trilinear sample is ONE 8-wide row gather instead of 8 scattered
    gathers — TPU gathers are row-oriented, making this ~8x cheaper.
    (+8x memory: ~35 MB at soccar resolution, irrelevant next to HBM.)"""
    d = np.asarray(dist, np.float32)
    X, Y, Z = d.shape
    packed = np.empty((X - 1, Y - 1, Z - 1, 8), np.float32)
    c = 0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                packed[..., c] = d[dx:X - 1 + dx, dy:Y - 1 + dy,
                                   dz:Z - 1 + dz]
                c += 1
    return jnp.asarray(packed.reshape(-1, 8))


def _corner_pack_full(dist, dirs_encoded):
    """[cells, 32] rows: 8 corner distances + the 8 corner nodes' encoded
    push-directions (3 components each, _encode_dirs length convention:
    |v| == 2 smooth, 1 seam). ONE row gather then serves the trilinear
    distance, its analytic gradient, AND the nearest-node seam normal —
    the TPU probe (scripts/mesh_profile.py, 8192 envs) showed the
    scattered dirs[ni] gather cost as much as every packed-row gather
    combined (~1.9 us/player-step each), so folding dirs into the row
    halves the whole mesh overhead by itself."""
    d = np.asarray(dist, np.float32)
    dd = np.asarray(dirs_encoded, np.float32)
    X, Y, Z = d.shape
    packed = np.empty((X - 1, Y - 1, Z - 1, 32), np.float32)
    c = 0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                sl = (slice(dx, X - 1 + dx), slice(dy, Y - 1 + dy),
                      slice(dz, Z - 1 + dz))
                packed[..., c] = d[sl]
                packed[..., 8 + 3 * c:8 + 3 * c + 3] = dd[sl]
                c += 1
    return jnp.asarray(packed.reshape(-1, 32))


# int16 fixed-point scales for the packed tables (see MeshGeom.__init__):
# distances in 1/16 uu steps (band 300 uu -> |q| <= 4800), directions in
# 1/8192 steps (|v| <= 2 -> |q| <= 16384).
_Q_DIST = 16.0
_Q_DIR = 8192.0
_Q32 = np.concatenate([np.full(8, _Q_DIST, np.float32),
                       np.full(24, _Q_DIR, np.float32)])
_INV_Q32 = (1.0 / _Q32).astype(np.float32)


class MeshGeom:
    """Distance-grid world. Static arrays; hashable by id; jit-friendly."""

    # Suspension rays are short (<~70 uu) and the field is locally
    # near-linear, so sphere tracing converges geometrically on flat
    # ground in 1-2 steps; rays grazing inclined surfaces (ramp climbs)
    # converge by only sin(grazing angle) per step and need the extra
    # iterations — 3 steps broke the mesh_*_drive goldens, 4 passes.
    # The marching steps read only the distance (one 8-wide row gather,
    # _dist_only), not the normal: gathers are the mesh world's whole
    # cost on TPU, so the march costs half a full sample per step.
    RAY_STEPS = 4

    def __init__(self, dist, dirs, bounds_min, cell,
                 net_dist=None, net_dirs=None, fast=True):
        self.dist = jnp.asarray(dist, jnp.float32)          # [X, Y, Z]
        enc = _encode_dirs(dirs, cell)                      # np [X, Y, Z, 3]
        self.dirs = jnp.asarray(enc)
        self.bounds_min = jnp.asarray(bounds_min, jnp.float32)
        self.cell = jnp.asarray(cell, jnp.float32)
        self.dims = self.dist.shape
        self.band = float(np.abs(np.asarray(dist)).max())

        # `fast` (the TRAINING default) trades bounded sub-uu field error
        # for ~3x fewer gather bytes — the same speed-for-exactness trade
        # the reference's SuspensionCollisionGrid makes when it
        # short-circuits suspension rays to analytic planes
        # (SuspensionCollisionGrid.cpp:124-183):
        #   - int16 fixed-point packed tables: every random row gather
        #     fetches a whole XLA (8,128) memory tile regardless of the
        #     32-value row it wants (scripts/mesh_tick_profile.py pinned
        #     the mesh world's ENTIRE overhead on that random access —
        #     with uniform indices it runs at plane-world speed), so
        #     halving the tile bytes halves the mesh cost. Quantization is
        #     uniform: 1/16 uu for distances, 1/8192 for directions
        #     (measured: depth err <= 0.031 uu, ray-t err <= 0.23 uu).
        #   - pair-shared suspension rays (suspension_raycast_core): one
        #     gathered row per front/back wheel PAIR instead of per wheel
        #     (measured vs exact: 0.08% hit mismatches near seam cells,
        #     mean ray-t err 0.13 uu).
        # The golden trajectory traces stay on fast=False: they pin the
        # engine to the compiled reference at sub-uu precision over
        # thousands of chaotic ticks, where even 0.03 uu of query noise
        # compounds to tens of uu of divergence; the fast path is pinned
        # pointwise instead (tests/test_mesh_fast_path.py).
        self.fast = bool(fast)
        self.quantized = self.fast
        if self.quantized:
            # int16 range guard: distances are stored as round(d*16)
            # int16, so a bake whose band exceeds 32767/16 ~ 2047 uu
            # would silently wrap and corrupt the fast-path field.
            # Directions are bounded by construction (|v| <= 2 ->
            # |q| <= 16384 < 32767).
            assert self.band * _Q_DIST <= 32767.0, (
                f"fast=True int16 packing needs band <= "
                f"{32767.0 / _Q_DIST:.0f} uu, got {self.band:.0f}; "
                f"use fast=False or rebake with a narrower band")

        def pack8(x):
            if not self.quantized:
                return x
            return jnp.round(x * _Q_DIST).astype(jnp.int16)

        def pack32(x):
            if not self.quantized:
                return x
            return jnp.round(x * jnp.asarray(_Q32)).astype(jnp.int16)

        self._packed = pack8(_corner_pack(dist))
        self._packed_full = pack32(_corner_pack_full(dist, enc))
        X, Y, Z = self.dims
        self._cdims = (X - 1, Y - 1, Z - 1)

        # Optional ball-only field (hoops net). Same bounds/dims/cell as
        # the main grid so one index computation serves both gathers.
        self.has_net = net_dist is not None
        if self.has_net:
            assert tuple(np.shape(net_dist)) == tuple(self.dims), \
                "net grid must share the main grid's dims/bounds"
            net_enc = _encode_dirs(net_dirs, cell)
            self.net_dist = jnp.asarray(net_dist, jnp.float32)
            self.net_dirs = jnp.asarray(net_enc)
            self._net_packed = pack8(_corner_pack(net_dist))
            self._net_packed_full = pack32(_corner_pack_full(
                net_dist, net_enc))

    @classmethod
    def from_cmf(cls, paths, bounds_min, bounds_max, dims=(128, 160, 64),
                 band=300.0, game_mode_name="soccar"):
        """Bake one grid from one or more .cmf files (a game mode's arena
        is split across several meshes, RocketSim.cpp:118-148). Mesh
        hashes are checked against the official whitelist with warnings
        for unknown/duplicate meshes (:149-163). In hoops, a mesh with
        exactly 505 vertices is the net (Arena.cpp:1041-1055) and is
        baked into the ball-only field."""
        from rlgymppo_cpp_tpu.sim.mesh_loader import (
            load_cmf, bake_sdf, validate_mesh_hashes,
        )
        HOOPS_NET_NUM_VERTS = 505
        is_hoops = game_mode_name == "hoops"
        world, net, hashes = [], [], []
        for p in paths:
            tris, verts, h = load_cmf(p)
            hashes.append(h)
            dest = net if (is_hoops and
                           verts.shape[0] == HOOPS_NET_NUM_VERTS) else world
            dest.append((tris, verts))
        validate_mesh_hashes(hashes, game_mode_name)

        def merge(meshes):
            tris, verts, off = [], [], 0
            for t, v in meshes:
                tris.append(t + off)
                verts.append(v)
                off += v.shape[0]
            return np.concatenate(tris), np.concatenate(verts)

        tris, verts = merge(world)
        dist, dirs, bmin, cell = bake_sdf(
            tris, verts, bounds_min, bounds_max, dims, band)
        net_dist = net_dirs = None
        if net:
            ntris, nverts = merge(net)
            net_dist, net_dirs, _, _ = bake_sdf(
                ntris, nverts, bounds_min, bounds_max, dims, band)
        return cls(dist, dirs, bmin, cell, net_dist, net_dirs)

    # ------------------------------------------------------------- sampling

    def _decode32(self, row):
        """int16 fixed-point -> f32 (identity for unquantized tables)."""
        if not self.quantized:
            return row
        return row.astype(jnp.float32) * jnp.asarray(_INV_Q32)

    def _row_eval(self, row, tx, ty, tz):
        """Trilinear distance + contact normal from one gathered 32-wide
        row at (possibly out-of-[0,1], i.e. extrapolated) cell weights.

        Distance and its ANALYTIC GRADIENT come from the row's 8 corner
        distances (the gradient of the interpolant is exact from the same
        8 corners — no extra memory traffic — and varies smoothly within
        a cell; outside the cell both are the polynomial's extension,
        first-order accurate within ~a cell of it). The normal source is
        selected per query by the _encode_dirs flag carried in the node
        direction's length: smooth/curved surfaces use the gradient
        (per-node constant directions are a staircase there — they bled
        ~7% of climb speed on the quarter-pipe golden traces), sharp
        concave creases use the nearest-node bake direction (the gradient
        blends the two planes of a crease into diagonal mush). The
        nearest node's direction is read from the SAME row (no scattered
        dirs gather — see _corner_pack_full).

        Returns (d, (nx, ny, nz)) with component arrays."""
        wx1, wy1, wz1 = tx, ty, tz
        wx0, wy0, wz0 = 1 - wx1, 1 - wy1, 1 - wz1
        # packed corner order: bit2 = dx, bit1 = dy, bit0 = dz
        c0, c1, c2, c3 = row[..., 0], row[..., 1], row[..., 2], row[..., 3]
        c4, c5, c6, c7 = row[..., 4], row[..., 5], row[..., 6], row[..., 7]
        d = (wx0 * (wy0 * (wz0 * c0 + wz1 * c1)
                    + wy1 * (wz0 * c2 + wz1 * c3))
             + wx1 * (wy0 * (wz0 * c4 + wz1 * c5)
                      + wy1 * (wz0 * c6 + wz1 * c7)))
        gx = ((c4 - c0) * wy0 * wz0 + (c5 - c1) * wy0 * wz1
              + (c6 - c2) * wy1 * wz0 + (c7 - c3) * wy1 * wz1)
        gy = ((c2 - c0) * wx0 * wz0 + (c3 - c1) * wx0 * wz1
              + (c6 - c4) * wx1 * wz0 + (c7 - c5) * wx1 * wz1)
        gz = ((c1 - c0) * wx0 * wy0 + (c3 - c2) * wx0 * wy1
              + (c5 - c4) * wx1 * wy0 + (c7 - c6) * wx1 * wy1)
        cx = self.cell
        gx, gy, gz = gx / cx[0], gy / cx[1], gz / cx[2]
        gnorm = jnp.sqrt(gx * gx + gy * gy + gz * gz)

        # nearest node = the cell corner picked per axis by the (clamped)
        # weight — identical to the old round(f) global-node selection
        bx = jnp.clip(tx, 0.0, 1.0) >= 0.5
        by = jnp.clip(ty, 0.0, 1.0) >= 0.5
        bz = jnp.clip(tz, 0.0, 1.0) >= 0.5
        # corner index c = 4*dx + 2*dy + dz; select its 3 dir components
        # with a 3-level where chain (vector selects, no gather)
        def pick(axis_off):
            v_dz0_dy0 = jnp.where(bx, row[..., 8 + 3 * 4 + axis_off],
                                  row[..., 8 + axis_off])
            v_dz0_dy1 = jnp.where(bx, row[..., 8 + 3 * 6 + axis_off],
                                  row[..., 8 + 3 * 2 + axis_off])
            v_dz1_dy0 = jnp.where(bx, row[..., 8 + 3 * 5 + axis_off],
                                  row[..., 8 + 3 * 1 + axis_off])
            v_dz1_dy1 = jnp.where(bx, row[..., 8 + 3 * 7 + axis_off],
                                  row[..., 8 + 3 * 3 + axis_off])
            v_dz0 = jnp.where(by, v_dz0_dy1, v_dz0_dy0)
            v_dz1 = jnp.where(by, v_dz1_dy1, v_dz1_dy0)
            return jnp.where(bz, v_dz1, v_dz0)

        ndx, ndy, ndz = pick(0), pick(1), pick(2)
        ndnorm = jnp.sqrt(ndx * ndx + ndy * ndy + ndz * ndz)
        smooth = (ndnorm > 1.5) & (gnorm > 1e-6)
        inv_g = 1.0 / jnp.maximum(gnorm, 1e-6)
        inv_nd = 1.0 / jnp.maximum(ndnorm, 1e-6)
        nx = jnp.where(smooth, gx * inv_g, ndx * inv_nd)
        ny = jnp.where(smooth, gy * inv_g, ndy * inv_nd)
        nz = jnp.where(smooth, gz * inv_g, ndz * inv_nd)
        degenerate = ndnorm <= 1e-6
        nx = jnp.where(degenerate, 0.0, nx)
        ny = jnp.where(degenerate, 0.0, ny)
        nz = jnp.where(degenerate, 1.0, nz)
        return d, (nx, ny, nz)

    def _grid_coords(self, pos):
        f = (pos - self.bounds_min) / self.cell
        f = jnp.clip(f, 0.0, jnp.asarray(
            [d - 1.001 for d in self.dims], jnp.float32))
        i0 = jnp.floor(f).astype(jnp.int32)
        t = f - i0
        cx, cy, cz = self._cdims
        flat_idx = (i0[..., 0] * cy + i0[..., 1]) * cz + i0[..., 2]
        return f, flat_idx, t

    def _dist_only(self, packed, flat_idx, t):
        """Trilinear distance from one 8-wide corner-row gather — the
        ray-marching fast path (no normal, no dirs gather)."""
        c = jnp.take(packed, flat_idx, axis=0)
        if self.quantized:
            c = c.astype(jnp.float32) * (1.0 / _Q_DIST)
        wx1, wy1, wz1 = t[..., 0], t[..., 1], t[..., 2]
        wx0, wy0, wz0 = 1 - wx1, 1 - wy1, 1 - wz1
        return (wx0 * (wy0 * (wz0 * c[..., 0] + wz1 * c[..., 1])
                       + wy1 * (wz0 * c[..., 2] + wz1 * c[..., 3]))
                + wx1 * (wy0 * (wz0 * c[..., 4] + wz1 * c[..., 5])
                         + wy1 * (wz0 * c[..., 6] + wz1 * c[..., 7])))

    def _sample_dist(self, pos, for_car=False):
        f, flat_idx, t = self._grid_coords(pos)
        d = self._dist_only(self._packed, flat_idx, t)
        if self.has_net and not for_car:
            d = jnp.minimum(d, self._dist_only(self._net_packed,
                                               flat_idx, t))
        return d

    def _sample(self, pos, for_car=False):
        """Trilinear distance + contact normal at pos [..., 3].
        Out-of-grid positions clamp to the border (distances there are
        `band`, i.e. no contact)."""
        f, flat_idx, t = self._grid_coords(pos)
        row = self._decode32(jnp.take(self._packed_full, flat_idx, axis=0))
        d, (nx, ny, nz) = self._row_eval(row, t[..., 0], t[..., 1],
                                         t[..., 2])
        n = jnp.stack([nx, ny, nz], axis=-1)

        if self.has_net and not for_car:
            nrow = self._decode32(
                jnp.take(self._net_packed_full, flat_idx, axis=0))
            nd, (mx, my, mz) = self._row_eval(nrow, t[..., 0], t[..., 1],
                                              t[..., 2])
            nn = jnp.stack([mx, my, mz], axis=-1)
            closer = nd < d
            d = jnp.where(closer, nd, d)
            n = jnp.where(closer[..., None], nn, n)
        return d, n

    # --------------------------------------------- cached-cell local eval
    # The mesh world's whole TPU cost is gather rows (scripts/
    # mesh_profile.py). These helpers gather ONE 32-wide row per physics
    # feature (a car, a wheel ray) and answer every query of that feature
    # from registers — extrapolated trilinear within ~a cell of the
    # gathered one, which is exact on planar surfaces and first-order
    # accurate on curved ones (golden mesh traces bound the error).

    def _coords_core(self, pos):
        """Unclamped fractional grid coords of a V3 (component form)."""
        bm, cl = self.bounds_min, self.cell
        return ((pos.x - bm[0]) / cl[0], (pos.y - bm[1]) / cl[1],
                (pos.z - bm[2]) / cl[2])

    def local_ctx_core(self, pos, for_car=False):
        """Gather the cell row(s) containing V3 `pos` (clamped into the
        grid). Returns a ctx dict for eval_local_core / _eval_d_local."""
        fx, fy, fz = self._coords_core(pos)
        cx, cy, cz = self._cdims
        ix = jnp.clip(jnp.floor(fx), 0, cx - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.floor(fy), 0, cy - 1).astype(jnp.int32)
        iz = jnp.clip(jnp.floor(fz), 0, cz - 1).astype(jnp.int32)
        flat = (ix * cy + iy) * cz + iz
        ctx = {
            "row": self._decode32(
                jnp.take(self._packed_full, flat, axis=0)),
            "ox": ix.astype(jnp.float32),
            "oy": iy.astype(jnp.float32),
            "oz": iz.astype(jnp.float32),
        }
        if self.has_net and not for_car:
            ctx["net_row"] = self._decode32(
                jnp.take(self._net_packed_full, flat, axis=0))
        return ctx

    def _local_weights(self, ctx, pos):
        """Cell weights of V3 `pos` relative to the ctx cell, bounded to
        one cell of extrapolation so far-out positions can't manufacture
        phantom contacts from the polynomial's extension."""
        fx, fy, fz = self._coords_core(pos)
        tx = jnp.clip(fx - ctx["ox"], -1.0, 2.0)
        ty = jnp.clip(fy - ctx["oy"], -1.0, 2.0)
        tz = jnp.clip(fz - ctx["oz"], -1.0, 2.0)
        return tx, ty, tz

    def eval_local_core(self, ctx, pos):
        """(distance, normal V3) at V3 `pos` from the cached ctx row."""
        from rlgymppo_cpp_tpu.maths.v3 import V3
        tx, ty, tz = self._local_weights(ctx, pos)
        d, (nx, ny, nz) = self._row_eval(ctx["row"], tx, ty, tz)
        if "net_row" in ctx:
            nd, (mx, my, mz) = self._row_eval(ctx["net_row"], tx, ty, tz)
            closer = nd < d
            d = jnp.minimum(d, nd)
            nx = jnp.where(closer, mx, nx)
            ny = jnp.where(closer, my, ny)
            nz = jnp.where(closer, mz, nz)
        return d, V3(nx, ny, nz)

    def _eval_d_local(self, ctx, pos):
        """Distance only from the cached ctx row (no normal math)."""
        tx, ty, tz = self._local_weights(ctx, pos)
        row = ctx["row"]
        wx1, wy1, wz1 = tx, ty, tz
        wx0, wy0, wz0 = 1 - wx1, 1 - wy1, 1 - wz1
        d = (wx0 * (wy0 * (wz0 * row[..., 0] + wz1 * row[..., 1])
                    + wy1 * (wz0 * row[..., 2] + wz1 * row[..., 3]))
             + wx1 * (wy0 * (wz0 * row[..., 4] + wz1 * row[..., 5])
                      + wy1 * (wz0 * row[..., 6] + wz1 * row[..., 7])))
        if "net_row" in ctx:
            nrow = ctx["net_row"]
            nd = (wx0 * (wy0 * (wz0 * nrow[..., 0] + wz1 * nrow[..., 1])
                         + wy1 * (wz0 * nrow[..., 2] + wz1 * nrow[..., 3]))
                  + wx1 * (wy0 * (wz0 * nrow[..., 4] + wz1 * nrow[..., 5])
                          + wy1 * (wz0 * nrow[..., 6]
                                   + wz1 * nrow[..., 7])))
            d = jnp.minimum(d, nd)
        return d

    # ----------------------------------------------------------- geom API

    def sphere_contact(self, pos, radius, for_car=False):
        """(depth, normal): depth > 0 means the sphere penetrates."""
        d, n = self._sample(pos, for_car)
        return radius - d, n

    def signed_distances(self, pos, for_car=False):
        """[..., 1] distance (band = no contact), for API parity."""
        d, _ = self._sample(pos, for_car)
        return d[..., None]

    # --------------------------------------------- env-last core queries
    # (component V3 API matching ArenaGeom.sphere_contact_core /
    # raycast_core, so MeshGeom can back the physics core directly)

    def _sample_core(self, pos, for_car=False):
        from rlgymppo_cpp_tpu.maths.v3 import V3
        p = jnp.stack([pos.x, pos.y, pos.z], axis=-1)
        d, n = self._sample(p, for_car)
        return d, V3(n[..., 0], n[..., 1], n[..., 2])

    def sphere_contact_core(self, pos, radius, for_car=False):
        d, n = self._sample_core(pos, for_car)
        return radius - d, n

    def raycast_ctx_core(self, ctx, start, direction, max_len):
        """Sphere-trace entirely on a cached ctx row (no gather at all).
        ctx rows of [P, N] broadcast against [4, P, N] wheel rays, so ONE
        per-car ctx serves all four suspension rays — the gather count
        per tick drops from one row per wheel to one per car."""
        from rlgymppo_cpp_tpu.maths.v3 import V3
        t = jnp.zeros_like(start.x)
        for _ in range(self.RAY_STEPS):
            p = V3(start.x + direction.x * t, start.y + direction.y * t,
                   start.z + direction.z * t)
            d = self._eval_d_local(ctx, p)
            t = jnp.minimum(t + jnp.maximum(d, 0.0), max_len)
        p = V3(start.x + direction.x * t, start.y + direction.y * t,
               start.z + direction.z * t)
        d, n = self.eval_local_core(ctx, p)
        hit = (d < 6.0) & (t < max_len)
        return hit, jnp.where(hit, t, max_len), n

    def suspension_raycast_core(self, start, direction, max_len):
        """The 4 wheel rays of each car, [4, P, N]. On the fast path the
        front pair (wheels 0,1) and back pair (2,3) each share ONE
        gathered ctx row at the pair's ray midpoint — wheels of a pair
        sit ~27 uu apart laterally, well inside a cell, so the shared
        trilinear field is pointwise-exact except in the rare seam cell
        (measured 0.08% hit mismatches, mean t err 0.13 uu on the golden
        ramp world). Halves the suspension gather rows. Precondition:
        lateral cells >= ~40 uu (wheel offsets must stay inside the
        _local_weights extrapolation clamp) — production bakes use
        ~64 uu; tests/test_mesh_fast_path.py pins the error envelope at
        that resolution."""
        if not self.fast:
            return self.raycast_core(start, direction, max_len,
                                     for_car=True)
        from rlgymppo_cpp_tpu.maths.v3 import V3
        half = max_len * 0.5

        def pair_mean(c):
            return jnp.stack([(c[0] + c[1]) * 0.5, (c[2] + c[3]) * 0.5],
                             axis=0)

        mid = V3(pair_mean(start.x + direction.x * half),
                 pair_mean(start.y + direction.y * half),
                 pair_mean(start.z + direction.z * half))
        ctx2 = self.local_ctx_core(mid, for_car=True)   # [2, P, N, ...]
        ctx = {k: jnp.repeat(v, 2, axis=0) for k, v in ctx2.items()}
        return self.raycast_ctx_core(ctx, start, direction, max_len)

    def raycast_core(self, start, direction, max_len, for_car=False):
        """fast=True — suspension-length rays (< ~2 cells): ONE row gather
        at the ray segment midpoint, then the whole sphere-trace runs in
        registers on that cell's (extrapolated) trilinear field. Exact on
        planar surfaces; near seam cells the extrapolation is off by up to
        tens of uu for ~0.1% of rays (measured; this is what broke the
        sub-uu golden traces when it was unconditional).

        fast=False — the exact sphere-trace: every march step re-gathers
        the field at the CURRENT point, as bullet's raycast walks the real
        BVH. The golden replayer pins this path."""
        from rlgymppo_cpp_tpu.maths.v3 import V3
        if self.fast:
            half = max_len * 0.5
            mid = V3(start.x + direction.x * half,
                     start.y + direction.y * half,
                     start.z + direction.z * half)
            ctx = self.local_ctx_core(mid, for_car)
            return self.raycast_ctx_core(ctx, start, direction, max_len)
        t = jnp.zeros_like(start.x)
        for _ in range(self.RAY_STEPS):
            p = V3(start.x + direction.x * t, start.y + direction.y * t,
                   start.z + direction.z * t)
            d = self._sample_dist(
                jnp.stack([p.x, p.y, p.z], axis=-1), for_car)
            t = jnp.minimum(t + jnp.maximum(d, 0.0), max_len)
        p = V3(start.x + direction.x * t, start.y + direction.y * t,
               start.z + direction.z * t)
        d, n = self._sample_core(p, for_car)
        hit = (d < 6.0) & (t < max_len)
        return hit, jnp.where(hit, t, max_len), n

    def raycast(self, start, direction, max_len, for_car=False):
        """Sphere-trace the distance field: fixed RAY_STEPS iterations.

        Returns (hit [...], t [...], normal [..., 3]).
        """
        t = jnp.zeros(start.shape[:-1], jnp.float32)
        for _ in range(self.RAY_STEPS):
            p = start + direction * t[..., None]
            d = self._sample_dist(p, for_car)
            t = jnp.minimum(t + jnp.maximum(d, 0.0), max_len)
        p = start + direction * t[..., None]
        d, n = self._sample(p, for_car)
        hit = (d < 6.0) & (t < max_len)
        return hit, jnp.where(hit, t, max_len), n
