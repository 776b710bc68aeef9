"""Replay recorded reference traces through the TPU-native engine.

Shared by tests/test_golden_traces.py and the calibration report
(tools/golden/report.py): loads a tests/golden/*.npz trace (see
convert_traces.py for the layout), reconstructs the initial ArenaState,
steps the Arena tick-for-tick with the recorded controls, and returns both
trajectories for comparison.

The traces were recorded against reference RocketSim built from
/root/reference (Arena.cpp:716-812 tick loop) on a plane-only SOCCAR arena
(see recorder.cpp), which matches the default analytic plane-soup world.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.sim.arena import Arena, GameMode
from rlgymppo_cpp_tpu.sim.state import CarControls

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                          "tests", "golden")

# recorder.cpp car-state layout (name, width); keep in sync
CAR_FIELDS = [
    ("pos", 3), ("forward", 3), ("right", 3), ("up", 3),
    ("vel", 3), ("ang_vel", 3),
    ("is_on_ground", 1),
    ("has_jumped", 1), ("has_double_jumped", 1), ("has_flipped", 1),
    ("flip_rel_torque", 3),
    ("jump_time", 1), ("flip_time", 1),
    ("is_flipping", 1), ("is_jumping", 1),
    ("air_time", 1), ("air_time_since_jump", 1),
    ("boost", 1), ("time_spent_boosting", 1),
    ("is_supersonic", 1), ("supersonic_time", 1),
    ("handbrake_val", 1),
    ("is_auto_flipping", 1), ("auto_flip_timer", 1),
]

_slices = {}
_off = 0
for _name, _w in CAR_FIELDS:
    _slices[_name] = slice(_off, _off + _w)
    _off += _w


def load_trace(name):
    """-> dict with controls [R, C, 8], per-field car arrays [R, C, w],
    ball pos/vel/ang_vel [R, 3]."""
    with np.load(os.path.join(GOLDEN_DIR, name + ".npz")) as z:
        controls, car, ball = z["controls"], z["car"], z["ball"]
    out = {"controls": controls,
           "ball_pos": ball[:, 0:3], "ball_vel": ball[:, 3:6],
           "ball_ang_vel": ball[:, 6:9]}
    for fname, _ in CAR_FIELDS:
        out[fname] = car[:, :, _slices[fname]]
    # rot matrices with basis vectors as columns (forward, right, up),
    # matching sim.state.CarState.rot
    out["rot"] = np.stack(
        [out.pop("forward"), out.pop("right"), out.pop("up")], axis=-1)
    return out


_ARENAS = {}


def mode_for(name):
    if name.startswith("snowday_"):
        return GameMode.SNOWDAY
    if name.startswith("heatseeker_"):
        return GameMode.HEATSEEKER
    if name.startswith(("hoops_", "hoopsmesh_")):
        return GameMode.HOOPS
    return GameMode.SOCCAR


def mesh_for(name):
    if name.startswith("mesh_fillet"):
        return "fillet"
    if name.startswith("mesh_"):
        return "ramp"
    if name.startswith("hoopsmesh_"):
        return "hoops"
    return None


def config_for(name):
    """cfg_<preset>_* scenarios run non-Octane CarConfig presets
    (recorder.cpp passes the matching reference preset to AddCar)."""
    from rlgymppo_cpp_tpu.sim import car_config as cc
    if name.startswith("cfg_"):
        preset = name.split("_")[1]
        return getattr(cc, "CAR_CONFIG_" + preset.upper())
    return cc.CAR_CONFIG_OCTANE


def _mesh_ramp_geom():
    """SDF world for the mesh_* scenarios: the reference's meshless-arena
    planes (floor + x side walls; no back walls/corners/goals,
    Arena.cpp:1060-1105) plus the IDENTICAL hand-authored ramp triangle
    soup both engines load (tests/golden/ramp.cmf, recorder.cpp
    rampCmfBytes) — through this engine's real .cmf -> SDF pipeline.
    Grid bounds cover only the scenarios' reachable region for accuracy;
    the ceiling (z 2044) is above the grid and unreachable."""
    import numpy as np
    from rlgymppo_cpp_tpu.sim.mesh_geom import MeshGeom
    from rlgymppo_cpp_tpu.sim.mesh_loader import load_cmf, bake_sdf

    cache = "/tmp/rlgymppo_golden_ramp_sdf_v2.npz"
    if os.path.exists(cache):
        with np.load(cache) as z:
            return MeshGeom(z["dist"], z["dirs"], z["bounds_min"],
                            z["cell"], fast=False)

    ramp_tris, ramp_verts, _h = load_cmf(
        os.path.join(GOLDEN_DIR, "ramp.cmf"))
    ex = 4096.0
    quads = [
        # floor spanning the grid; +z up
        [(-2400, -3800, 0), (4400, -3800, 0), (4400, 1900, 0),
         (-2400, 1900, 0)],
        # side walls x = +-4096 (inward normals)
        [(ex, -3800, 0), (ex, 1900, 0), (ex, 1900, 1200),
         (ex, -3800, 1200)],
        [(-ex, -3800, 0), (-ex, 1900, 0), (-ex, 1900, 1200),
         (-ex, -3800, 1200)],
    ]
    refs = [(0, 0, 500), (0, 0, 500), (0, 0, 500)]
    verts, tris = list(ramp_verts), [tuple(t) for t in ramp_tris]
    for quad, ref in zip(quads, refs):
        i = len(verts)
        a, b, c = (np.asarray(quad[0], np.float64),
                   np.asarray(quad[1], np.float64),
                   np.asarray(quad[2], np.float64))
        n = np.cross(b - a, c - a)
        centroid = (a + b + c) / 3.0
        verts += [np.asarray(q, np.float32) for q in quad]
        if np.dot(n, np.asarray(ref, np.float64) - centroid) >= 0:
            tris += [(i, i + 1, i + 2), (i, i + 2, i + 3)]
        else:
            tris += [(i, i + 2, i + 1), (i, i + 3, i + 2)]
    tris = np.asarray(tris, np.int32)
    verts = np.asarray(verts, np.float32)

    bounds_min = (-2300.0, -3700.0, -64.0)
    bounds_max = (4300.0, 1800.0, 1100.0)
    dist, dirs, bmin, cell = bake_sdf(
        tris, verts, bounds_min, bounds_max, dims=(256, 160, 96))
    np.savez_compressed(cache, dist=dist, dirs=dirs, bounds_min=bmin,
                        cell=cell)
    return MeshGeom(dist, dirs, bmin, cell, fast=False)


def _hoops_mesh_geom():
    """SDF world for the hoopsmesh_* scenarios: the reference's hoops
    planes that the scenarios can reach (floor + y = 3581 back wall;
    ceiling/x-walls are outside the grid and unreachable) plus the
    IDENTICAL authored rim + net meshes both engines load
    (tests/golden/hoops_{rim,net}.cmf, recorder.cpp annularShellCmf).
    The 505-vertex net mesh goes into MeshGeom's ball-only field —
    exactly the masking RocketSim applies (Arena.cpp:1041-1055)."""
    import numpy as np
    from rlgymppo_cpp_tpu.sim.mesh_geom import MeshGeom
    from rlgymppo_cpp_tpu.sim.mesh_loader import load_cmf, bake_sdf

    cache = "/tmp/rlgymppo_golden_hoops_sdf_v1.npz"
    if os.path.exists(cache):
        with np.load(cache) as z:
            return MeshGeom(z["dist"], z["dirs"], z["bounds_min"],
                            z["cell"], z["net_dist"], z["net_dirs"],
                            fast=False)

    rim_tris, rim_verts, _h = load_cmf(
        os.path.join(GOLDEN_DIR, "hoops_rim.cmf"))
    net_tris, net_verts, _h = load_cmf(
        os.path.join(GOLDEN_DIR, "hoops_net.cmf"))

    ey = 3581.0
    quads = [
        # floor spanning the grid; +z up
        [(-2100, 1200, 0), (2100, 1200, 0), (2100, 3645, 0),
         (-2100, 3645, 0)],
        # back wall y = 3581 (inward normal -y)
        [(-2100, ey, 0), (2100, ey, 0), (2100, ey, 1100),
         (-2100, ey, 1100)],
    ]
    verts = list(rim_verts)
    tris = [tuple(t) for t in rim_tris]
    for quad in quads:
        i = len(verts)
        a, b, c = (np.asarray(quad[0], np.float64),
                   np.asarray(quad[1], np.float64),
                   np.asarray(quad[2], np.float64))
        n = np.cross(b - a, c - a)
        centroid = (a + b + c) / 3.0
        verts += [np.asarray(q, np.float32) for q in quad]
        ref = np.asarray((0, 2000, 500), np.float64)
        if np.dot(n, ref - centroid) >= 0:
            tris += [(i, i + 1, i + 2), (i, i + 2, i + 3)]
        else:
            tris += [(i, i + 2, i + 1), (i, i + 3, i + 2)]
    tris = np.asarray(tris, np.int32)
    verts = np.asarray(verts, np.float32)

    bounds_min = (-2100.0, 1200.0, -64.0)
    bounds_max = (2100.0, 3645.0, 1100.0)
    dims = (128, 160, 96)
    dist, dirs, bmin, cell = bake_sdf(
        tris, verts, bounds_min, bounds_max, dims=dims)
    net_dist, net_dirs, _, _ = bake_sdf(
        net_tris, net_verts, bounds_min, bounds_max, dims=dims)
    np.savez_compressed(cache, dist=dist, dirs=dirs, bounds_min=bmin,
                        cell=cell, net_dist=net_dist, net_dirs=net_dirs)
    return MeshGeom(dist, dirs, bmin, cell, net_dist, net_dirs,
                    fast=False)


def _mesh_fillet_geom():
    """SDF world for the mesh_fillet_* scenarios: floor + the -x side
    wall + the IDENTICAL authored quarter-pipe fillet both engines load
    (tests/golden/fillet.cmf, recorder.cpp filletCmfBytes)."""
    import numpy as np
    from rlgymppo_cpp_tpu.sim.mesh_geom import MeshGeom
    from rlgymppo_cpp_tpu.sim.mesh_loader import load_cmf, bake_sdf

    cache = "/tmp/rlgymppo_golden_fillet_sdf_v1.npz"
    if os.path.exists(cache):
        with np.load(cache) as z:
            return MeshGeom(z["dist"], z["dirs"], z["bounds_min"],
                            z["cell"], fast=False)

    f_tris, f_verts, _h = load_cmf(
        os.path.join(GOLDEN_DIR, "fillet.cmf"))
    quads = [
        # floor spanning the grid; +z up
        [(-4096, -1300, 0), (-2200, -1300, 0), (-2200, 1300, 0),
         (-4096, 1300, 0)],
        # -x wall (inward normal +x)
        [(-4096, -1300, 0), (-4096, 1300, 0), (-4096, 1300, 1700),
         (-4096, -1300, 1700)],
    ]
    verts = list(f_verts)
    tris = [tuple(t) for t in f_tris]
    ref = np.asarray((-3000, 0, 500), np.float64)
    for quad in quads:
        i = len(verts)
        a, b, c = (np.asarray(quad[0], np.float64),
                   np.asarray(quad[1], np.float64),
                   np.asarray(quad[2], np.float64))
        n = np.cross(b - a, c - a)
        centroid = (a + b + c) / 3.0
        verts += [np.asarray(q, np.float32) for q in quad]
        if np.dot(n, ref - centroid) >= 0:
            tris += [(i, i + 1, i + 2), (i, i + 2, i + 3)]
        else:
            tris += [(i, i + 2, i + 1), (i, i + 3, i + 2)]
    tris = np.asarray(tris, np.int32)
    verts = np.asarray(verts, np.float32)

    bounds_min = (-4160.0, -1300.0, -64.0)
    bounds_max = (-2300.0, 1300.0, 1700.0)
    dist, dirs, bmin, cell = bake_sdf(
        tris, verts, bounds_min, bounds_max, dims=(128, 96, 128))
    np.savez_compressed(cache, dist=dist, dirs=dirs, bounds_min=bmin,
                        cell=cell)
    return MeshGeom(dist, dirs, bmin, cell, fast=False)


def _fillet_analytic_geom():
    """ANALYTIC counterpart of _mesh_fillet_geom: the same floor + -x
    wall + quarter-pipe fillet as ArenaGeom primitives (planes + one
    arena_geom fillet row, smooth cylinder vs the reference's 12-segment
    facets — max surface gap R*(1-cos(pi/48)) ~ 0.56 uu). Replaying the
    SAME reference traces through this world validates the analytic
    fillet primitive end-to-end."""
    import numpy as np
    from rlgymppo_cpp_tpu.sim.arena_geom import ArenaGeom, fillet_row, INF

    normals = np.array([[0, 0, 1], [1, 0, 0]], np.float32)
    offsets = np.array([0.0, -4096.0], np.float32)
    rmin = np.full((2, 3), -INF, np.float32)
    rmax = np.full((2, 3), INF, np.float32)
    return ArenaGeom(normals, offsets, rmin, rmax,
                     fillets=(fillet_row((-4096.0, -1200.0),
                                         (-4096.0, 1200.0), (1.0, 0.0)),))


def make_arena(num_cars, game_mode=GameMode.SOCCAR,
               car_config=None, mesh=None):
    from rlgymppo_cpp_tpu.sim.car_config import CAR_CONFIG_OCTANE
    car_config = car_config or CAR_CONFIG_OCTANE
    key = (num_cars, game_mode, id(car_config), mesh)
    if key not in _ARENAS:
        teams = tuple(i % 2 for i in range(num_cars))
        geom = {None: None, "ramp": _mesh_ramp_geom,
                "fillet": _mesh_fillet_geom,
                "fillet_analytic": _fillet_analytic_geom,
                "hoops": _hoops_mesh_geom}[mesh]
        _ARENAS[key] = Arena(game_mode, teams=teams,
                             car_config=car_config,
                             geom=geom() if geom else None)
    return _ARENAS[key]


def initial_state(arena, tr):
    """ArenaState for batch shape (1,) from trace row 0."""
    st = arena.default_state(batch_shape=(1,))

    def car_f(field, bool_=False):
        v = tr[field][0][None]                       # [1, C, w]
        if v.shape[-1] == 1:
            v = v[..., 0]
        return jnp.asarray(v.astype(bool if bool_ else np.float32))

    cars = st.cars.replace(
        pos=car_f("pos"), rot=jnp.asarray(tr["rot"][0][None]),
        vel=car_f("vel"), ang_vel=car_f("ang_vel"),
        is_on_ground=car_f("is_on_ground", True),
        has_jumped=car_f("has_jumped", True),
        has_double_jumped=car_f("has_double_jumped", True),
        has_flipped=car_f("has_flipped", True),
        flip_rel_torque=car_f("flip_rel_torque"),
        jump_time=car_f("jump_time"), flip_time=car_f("flip_time"),
        is_flipping=car_f("is_flipping", True),
        is_jumping=car_f("is_jumping", True),
        air_time=car_f("air_time"),
        air_time_since_jump=car_f("air_time_since_jump"),
        boost=car_f("boost"),
        time_spent_boosting=car_f("time_spent_boosting"),
        is_supersonic=car_f("is_supersonic", True),
        supersonic_time=car_f("supersonic_time"),
        handbrake_val=car_f("handbrake_val"),
        is_auto_flipping=car_f("is_auto_flipping", True),
        auto_flip_timer=car_f("auto_flip_timer"),
    )
    ball = st.ball.replace(
        pos=jnp.asarray(tr["ball_pos"][0][None]),
        vel=jnp.asarray(tr["ball_vel"][0][None]),
        ang_vel=jnp.asarray(tr["ball_ang_vel"][0][None]),
    )
    return st.replace(cars=cars, ball=ball)


# All traces replay through ONE jitted scan per (num_cars, mode) arena
# config, padded to a common length: a 300-tick scenario costs one scan
# call instead of 300 host dispatches (which profiled ~100x slower on the
# single-core CPU test environment).
PAD_T = 456

_SCANS = {}


def _scan_replay(arena):
    key = id(arena)
    if key in _SCANS:
        return _SCANS[key]

    import functools

    @jax.jit
    def run(state, ctrl_seq):
        prng = jax.random.PRNGKey(0)

        def body(st, c):
            controls = CarControls(
                throttle=c[None, :, 0], steer=c[None, :, 1],
                pitch=c[None, :, 2], yaw=c[None, :, 3],
                roll=c[None, :, 4], jump=c[None, :, 5] != 0,
                boost=c[None, :, 6] != 0, handbrake=c[None, :, 7] != 0)
            st2, _ = arena.tick(st, controls, prng)
            cars = st2.cars
            snap = {
                "pos": cars.pos[0], "rot": cars.rot[0],
                "vel": cars.vel[0], "ang_vel": cars.ang_vel[0],
                "ball_pos": st2.ball.pos[0], "ball_vel": st2.ball.vel[0],
                "ball_ang_vel": st2.ball.ang_vel[0],
                "flip_rel_torque": cars.flip_rel_torque[0],
            }
            for f in ("is_on_ground", "has_jumped", "has_double_jumped",
                      "has_flipped", "is_flipping", "is_jumping",
                      "is_supersonic", "is_auto_flipping"):
                snap[f] = getattr(cars, f)[0].astype(jnp.float32)[:, None]
            for f in ("jump_time", "flip_time", "air_time",
                      "air_time_since_jump", "boost",
                      "time_spent_boosting", "supersonic_time",
                      "handbrake_val", "auto_flip_timer"):
                snap[f] = getattr(cars, f)[0][:, None]
            return st2, snap

        _, snaps = jax.lax.scan(body, state, ctrl_seq)
        return snaps

    _SCANS[key] = run
    return run


def replay(name, world=None):
    """Run the TPU engine under the trace's controls.

    `world` overrides the collision world (a make_arena `mesh` key) —
    used to replay the mesh_fillet traces through the ANALYTIC fillet.
    -> (trace dict, ours dict with the same keys/shapes [R, C, w]/[R, 3])
    """
    tr = load_trace(name)
    R, C = tr["controls"].shape[:2]
    arena = make_arena(C, mode_for(name), config_for(name),
                       mesh=world or mesh_for(name))
    state = initial_state(arena, tr)
    if mode_for(name) == GameMode.HEATSEEKER:
        # recorder-set hsInfo.yTargetDir per scenario (not in the trace
        # format; keep in sync with recorder.cpp)
        hs_dir = {"heatseeker_homing": 1.0, "heatseeker_onhit": -1.0}[name]
        from rlgymppo_cpp_tpu.sim import constants as RC
        state = state.replace(ball=state.ball.replace(
            hs_info=state.ball.hs_info.replace(
                y_target_dir=jnp.full_like(
                    state.ball.hs_info.y_target_dir, hs_dir),
                cur_target_speed=jnp.full_like(
                    state.ball.hs_info.cur_target_speed,
                    RC.Heatseeker.INITIAL_TARGET_SPEED))))
    key = jax.random.PRNGKey(0)

    ctrl = np.zeros((PAD_T, C, 8), np.float32)
    ctrl[:R - 1] = tr["controls"][1:]
    ctrl[R - 1:] = tr["controls"][-1]
    snaps = _scan_replay(arena)(state, jnp.asarray(ctrl))
    snaps = jax.device_get(snaps)

    row0 = _snapshot(state)
    ours = {k: np.concatenate([row0[k][None], np.asarray(v)[:R - 1]])
            for k, v in snaps.items()}
    return tr, ours


def _snapshot(state):
    c = state.cars
    g = lambda x: np.asarray(x[0])
    out = {
        "pos": g(c.pos), "rot": g(c.rot), "vel": g(c.vel),
        "ang_vel": g(c.ang_vel),
        "ball_pos": g(state.ball.pos), "ball_vel": g(state.ball.vel),
        "ball_ang_vel": g(state.ball.ang_vel),
    }
    for f in ("is_on_ground", "has_jumped", "has_double_jumped",
              "has_flipped", "is_flipping", "is_jumping", "is_supersonic",
              "is_auto_flipping"):
        out[f] = g(getattr(c, f)).astype(np.float32)[:, None]
    for f in ("jump_time", "flip_time", "air_time", "air_time_since_jump",
              "boost", "time_spent_boosting", "supersonic_time",
              "handbrake_val", "auto_flip_timer"):
        out[f] = g(getattr(c, f))[:, None]
    out["flip_rel_torque"] = g(c.flip_rel_torque)
    return out
