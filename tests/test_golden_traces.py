"""Golden-trace physics parity vs the COMPILED reference engine.

tests/golden/*.npz are tick-by-tick Car/Ball state traces recorded from
reference RocketSim built from /root/reference (tools/golden/recorder.cpp;
38 scripted scenarios on a plane-only SOCCAR arena + SNOWDAY/HEATSEEKER —
see that file for the geometry argument). Each test replays the recorded
controls through the TPU-native engine from the same initial state and
asserts the trajectories match.

Calibration (tools/golden/report.py) shows the engine tracks the compiled
reference to sub-uu precision over hundreds of ticks for smooth dynamics;
contact events accumulate bounded divergence (single-pass analytic
impulses vs bullet's iterative manifold solver). Tolerances are set a
small factor above measured drift — tight enough that any constant-scale
error (wrong curve gain, wrong timing constant, wrong mass/impulse scale)
fails immediately. These traces caught five real solver bugs in round 2:
Baumgarte bias injecting velocity (the reference uses split impulse,
Arena.cpp:485-488), car-car face contacts never registering for aligned
identical hitboxes, single-point face impulses running ~25% soft, unsigned
SDF reads giving phantom clearance at the mesh surface, and the car
inertia tensor built from the CONFIGURED hitbox instead of bullet's
margin-shrunk effective box (~9% off — the entire powerslide/drive_steer
drift; see sim/car_config.py:bullet_effective_half_extents).

Velocity errors are asserted at the 98th percentile over the trace: a
bounce that lands one tick apart in the two engines produces a huge
1-2-tick velocity spike even when the trajectories re-converge (position
max stays asserted, so real divergence still fails).
"""

import os
import sys

import numpy as np
import pytest

# golden replays / multihost / learner e2e are the
# acceptance bar but dominate wall time: slow-marked, run
# with `pytest tests/ --runslow` (README "Testing")
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tools", "golden"))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

DEFAULT = dict(until=None, pos=8.0, vel=12.0, rot=1.5, bpos=8.0, bvel=10.0,
               flag_slack=0, boost_tol=1.0)
TOL = {
    # smooth dynamics: near-exact
    "drive_throttle": dict(pos=1.0, vel=1.0, rot=0.2),
    "drive_reverse": dict(pos=1.0, vel=1.0, rot=0.3),
    "coast": dict(pos=1.0, vel=1.0, rot=0.2),
    "handbrake_tap": dict(pos=1.0, vel=1.0, rot=0.2),
    "brake": dict(pos=1.0, vel=1.0, rot=0.2),
    "boost_ground": dict(pos=1.0, vel=1.0, rot=0.2),
    "boost_tap": dict(pos=1.0, vel=1.0, rot=0.2),
    "supersonic": dict(pos=1.0, vel=1.0, rot=0.2),
    "air_pitch": dict(pos=1.0, vel=1.0, rot=0.3),
    "air_yaw_roll": dict(pos=1.0, vel=1.0, rot=0.3),
    "air_damping": dict(pos=1.0, vel=1.0, rot=0.3),
    "boost_air_pitched": dict(pos=2.5, vel=3.5, rot=1.0),
    "jump_hold": dict(pos=2.0, vel=2.0, rot=0.5),
    "jump_tap": dict(pos=2.0, vel=2.0, rot=0.5),
    "double_jump": dict(pos=2.5, vel=4.0, rot=0.5),
    "flip_forward": dict(pos=2.0, vel=2.0, rot=0.5),
    "flip_sideways": dict(pos=1.0, vel=1.0, rot=0.2),
    "powerslide": dict(pos=1.0, vel=1.0, rot=0.2),
    "drive_steer": dict(pos=1.0, vel=1.0, rot=0.2),
    "wall_drive": dict(pos=1.0, vel=1.0, rot=0.2),
    "ball_drop": dict(bpos=5.0, bvel=6.0),
    "ball_roll": dict(bpos=2.0, bvel=2.0),
    "ball_arc": dict(bpos=4.0, bvel=3.0),

    # contact-rich: measured drift x ~1.5 safety (landing/contact ticks
    # dominate the vel p98)
    "flip_cancel": dict(pos=8.0, vel=60.0, rot=8.0),
    "auto_flip": dict(pos=10.0, vel=80.0, rot=6.0, flag_slack=6),
    "ceiling_stick": dict(pos=28.0, vel=20.0, rot=4.0, flag_slack=4),
    "ball_bounce_spin": dict(bpos=12.0, bvel=20.0),
    "ball_wall_bounce": dict(bpos=12.0, bvel=8.0),
    "ball_fast_clamp": dict(bpos=50.0, bvel=5.0),
    "car_ball_hit": dict(pos=4.0, vel=15.0, rot=2.0, bpos=85.0, bvel=60.0,
                         until=230),
    "car_ball_hit_angled": dict(pos=4.0, vel=15.0, rot=2.0, bpos=85.0,
                                bvel=60.0, until=230),
    "car_ball_aerial": dict(pos=45.0, vel=50.0, rot=10.0, bpos=35.0,
                            bvel=50.0),
    "car_bump": dict(pos=22.0, vel=105.0, rot=40.0, flag_slack=16),
    "car_demo": dict(pos=9.0, vel=11.0, rot=2.5, flag_slack=4),

    # 20-gon puck: exact hull-vertex manifold vs world (regular solver +
    # split impulse, Arena.cpp:270-272 skips isSpecial in SNOWDAY) and
    # deepest-feature GJK-analog vs the car box (vertex-in-box, corner-
    # in-cylinder, axis-segment side contact). Residuals are facet-phase
    # and single- vs 10-iteration solver differences.
    "snowday_puck_drop": dict(bpos=35.0, bvel=140.0),
    "snowday_puck_slide": dict(bpos=30.0, bvel=25.0),
    "snowday_puck_spin_bounce": dict(bpos=180.0, bvel=450.0),
    # r3: contact fires on the recorder's exact tick; measured maxima
    # car 6.6 uu / puck 36 uu (was 526 / 1900-bounded in r2)
    "snowday_car_puck_hit": dict(pos=15.0, vel=25.0, rot=8.0,
                                 bpos=60.0, bvel=250.0,
                                 flag_slack=8, boost_tol=2.0),

    # homing is tick-exact; the tail flies past the back wall, which only
    # exists in this engine (the recorder arena has no goal meshes)
    "heatseeker_homing": dict(bpos=3.0, bvel=3.0, until=255),
    # homing exact until the car-ball hit; contact lands one tick apart
    # between the engines and the homing then amplifies the different
    # post-hit geometry — loose bounds still catch wrong _OnHit math
    # compare through the hit + ~20 ticks: the 1-tick contact offset
    # compounds at 2300 uu/s thereafter
    "heatseeker_onhit": dict(pos=40.0, vel=280.0, rot=7.0, bpos=320.0,
                             bvel=2400.0, until=40),
    "pad_pickup_big": dict(pos=1.0, vel=1.0, rot=0.2),
    "pad_pickup_small_row": dict(pos=1.0, vel=1.0, rot=0.2),

    # hoops mode (meshless reference arena: 6 planes, no rim meshes;
    # scenarios stay clear of the goal regions)
    "hoops_ball_bounce": dict(pos=1.0, vel=1.0, rot=0.2, bpos=4.0,
                              bvel=6.0),
    # exact through the (2432, 0) big-pad pickup; comparison stops before
    # the deliberate 2000 uu/s nose-first crash into the +x wall (the
    # chaotic contact-event class already bounded by car_bump et al.)
    "hoops_pad_pickup": dict(pos=1.0, vel=1.0, rot=0.2, until=132),
    # spinning puck wall bounce: facet-phase + solver-iteration residual
    # (same class as snowday_puck_spin_bounce)
    "snowday_puck_wall": dict(bpos=120.0, bvel=500.0),
}

# Mesh-world scenarios: both engines load the IDENTICAL hand-authored ramp
# triangle soup (tests/golden/ramp.cmf) — the reference through its
# btBvhTriangleMeshShape pipeline, this engine through the .cmf -> signed
# SDF bake (replay._mesh_ramp_geom). The slope approach/climb and the
# ball's slope bounces track the reference tightly (planar surfaces are
# exact under trilinear interpolation). The drive comparison stops at the
# ramp's top edge (t=198): a 90-degree CONVEX edge is rounded by grid
# interpolation (~cell size), so the launch direction off the lip differs
# by a few degrees — measured 437 uu/s launch-velocity delta at 12-uu
# cells, scaling ~linearly with cell size. Documented SDF approximation,
# same class as the Snowday hull stand-in.
TOL["mesh_ramp_drive"] = dict(pos=6.0, vel=120.0, rot=5.0, flag_slack=4,
                              until=198)
TOL["mesh_ramp_ball"] = dict(bpos=6.0, bvel=8.0, rot=0.3)

# Quarter-pipe fillet (tests/golden/fillet.cmf, authored identically into
# both engines): the floor-to-wall transition every wall play rides
# through. The car boosts into the curve, transitions onto the vertical
# wall and climbs ~1500 uu; drift is a ~4% climb-speed deficit acquired
# during the curve transit (bullet's iterative per-wheel handling of the
# rotating contact basis vs this engine's single-pass formulation — the
# baked surface itself is within 0.4 uu of the faceted truth). The ball
# rolls in, curves up to z~445 and back down, tracking to ~12 uu.
TOL["mesh_fillet_drive"] = dict(pos=75.0, vel=130.0, rot=4.0,
                                flag_slack=4)
TOL["mesh_fillet_ball"] = dict(bpos=18.0, bvel=70.0, rot=0.3)

# Hoops basket: both engines load the IDENTICAL authored rim + net meshes
# (tests/golden/hoops_{rim,net}.cmf; recorder.cpp annularShellCmf). The
# 505-vertex net is ball-only in BOTH engines — RocketSim detects the
# vertex count and masks car collision (Arena.cpp:1041-1055, Arena.h:164);
# this engine bakes it into MeshGeom's ball-only field. The ball's rim
# bounce, outer-net bounce, and drop-in containment track to a few uu;
# the car driving THROUGH the net is near-exact (the masking parity test —
# a solid net would stop it at y~2300 and fail by hundreds of uu).
TOL["hoopsmesh_rim_bounce"] = dict(bpos=8.0, bvel=10.0, rot=0.3)
TOL["hoopsmesh_net_outside"] = dict(bpos=10.0, bvel=80.0, rot=0.3)
TOL["hoopsmesh_ball_in"] = dict(bpos=10.0, bvel=10.0, rot=0.3)
TOL["hoopsmesh_car_through_net"] = dict(pos=1.0, vel=1.0, rot=0.2)
# car vs rim outer wall: airborne nose-corner contact ON a facet knife
# edge (a ring vertex sits exactly at the approach line x = 0) — the
# chaotic contact-event class (car_bump/snowday_car_puck_hit). Bounds
# catch the failure that matters: a car-masked rim would let the car sail
# through (settling ~400 uu deeper with no rebound).
TOL["hoopsmesh_car_rim"] = dict(pos=340.0, vel=700.0, rot=75.0,
                                flag_slack=24)

# Non-Octane CarConfig presets (steer sweep + sideways flip per preset,
# recorder.cpp): all track the reference exactly — validates the per-preset
# hitbox/wheel/suspension tables and the margin-shrunk effective-box
# inertia (Merc is the margin-cap edge case: min half extent > 0.4 m).
for _p in ("dominus", "plank", "breakout", "hybrid", "merc"):
    TOL[f"cfg_{_p}_steer"] = dict(pos=1.0, vel=1.0, rot=0.2)
    TOL[f"cfg_{_p}_flip"] = dict(pos=1.0, vel=1.5, rot=0.3)


def _all_scenarios():
    # gym_* traces are the gym-layer goldens (obs/reward/action layout,
    # test_golden_gym.py), not physics state traces
    return sorted(fn[:-4] for fn in os.listdir(GOLDEN_DIR)
                  if fn.endswith(".npz") and not fn.startswith("gym_"))


_cache = {}


def _replay(name):
    if name not in _cache:
        from replay import replay
        _cache[name] = replay(name)
    return _cache[name]


def rot_angle_deg(ra, rb):
    tr = np.einsum("...ij,...ij->...", ra, rb)
    return np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))


FLAGS = ("is_on_ground", "has_jumped", "has_double_jumped", "has_flipped",
         "is_flipping", "is_jumping", "is_supersonic", "is_auto_flipping")


def _flag_mismatch_ticks(tr, ours, f, until):
    a = tr[f][:until, :, 0] != 0
    b = ours[f][:until, :, 0] != 0
    diff = a != b
    # transitions within +-2 ticks are equivalent: ignore mismatch runs
    # shorter than 3 ticks
    bad = 0
    for car in range(diff.shape[1]):
        runs = np.flatnonzero(np.diff(np.concatenate(
            [[0], diff[:, car].astype(np.int8), [0]])))
        for s, e in zip(runs[::2], runs[1::2]):
            if e - s > 2:
                bad += e - s
    return bad


@pytest.mark.parametrize("name", _all_scenarios())
def test_golden_trace(name):
    tr, ours = _replay(name)
    R = tr["controls"].shape[0]
    t = {**DEFAULT, **TOL.get(name, {})}
    u = t["until"] or R

    def maxn(field):
        return np.linalg.norm(tr[field][:u] - ours[field][:u],
                              axis=-1).max()

    def p98(field):
        return np.percentile(
            np.linalg.norm(tr[field][:u] - ours[field][:u], axis=-1), 98)

    pe, ve = maxn("pos"), p98("vel")
    re = rot_angle_deg(tr["rot"][:u], ours["rot"][:u]).max()
    be, bv = maxn("ball_pos"), p98("ball_vel")

    assert pe <= t["pos"], f"{name}: car pos drift {pe:.2f} > {t['pos']}"
    assert ve <= t["vel"], f"{name}: car vel p98 {ve:.2f} > {t['vel']}"
    assert re <= t["rot"], f"{name}: car rot drift {re:.2f}d > {t['rot']}"
    assert be <= t["bpos"], f"{name}: ball pos drift {be:.2f} > {t['bpos']}"
    assert bv <= t["bvel"], f"{name}: ball vel p98 {bv:.2f} > {t['bvel']}"

    slack = t["flag_slack"]
    for f in FLAGS:
        bad = _flag_mismatch_ticks(tr, ours, f, u)
        assert bad <= slack, \
            f"{name}: flag {f} mismatched for {bad} ticks (> {slack})"

    # scalar state-machine fields
    for f, tol in (("boost", t["boost_tol"]), ("handbrake_val", 0.05),
                   ("jump_time", 0.03), ("flip_time", 0.03)):
        err = np.abs(tr[f][:u] - ours[f][:u]).max()
        assert err <= tol, f"{name}: {f} err {err:.4f} > {tol}"


# The ANALYTIC quarter-cylinder fillet (arena_geom fillets — the curved
# soccar bowl at plane-soup cost, no SDF gathers) replayed against the
# SAME reference mesh-fillet traces. The analytic surface is the smooth
# cylinder the reference's 12-segment facets approximate (max gap
# ~0.56 uu); it tracks the reference BETTER than the SDF bake (exact
# normals/distances vs grid interpolation): drive pos drift 22.8 uu vs
# the SDF's 61.6, ball 15.7 vs 12.0. Tolerances ~1.5x measured.
ANALYTIC_TOL = {
    "mesh_fillet_drive": dict(pos=35.0, vel=70.0, rot=1.6, flag_slack=4),
    "mesh_fillet_ball": dict(bpos=20.0, bvel=60.0, rot=0.3),
}


@pytest.mark.parametrize("name", sorted(ANALYTIC_TOL))
def test_analytic_fillet_trace(name):
    from replay import replay
    tr, ours = replay(name, world="fillet_analytic")
    R = tr["controls"].shape[0]
    t = {**DEFAULT, **ANALYTIC_TOL[name]}
    u = t["until"] or R

    def maxn(field):
        return np.linalg.norm(tr[field][:u] - ours[field][:u],
                              axis=-1).max()

    pe = maxn("pos")
    ve = np.percentile(np.linalg.norm(
        tr["vel"][:u] - ours["vel"][:u], axis=-1), 98)
    re = rot_angle_deg(tr["rot"][:u], ours["rot"][:u]).max()
    be = maxn("ball_pos")
    bv = np.percentile(np.linalg.norm(
        tr["ball_vel"][:u] - ours["ball_vel"][:u], axis=-1), 98)
    assert pe <= t["pos"], f"{name}: car pos drift {pe:.2f} > {t['pos']}"
    assert ve <= t["vel"], f"{name}: car vel p98 {ve:.2f} > {t['vel']}"
    assert re <= t["rot"], f"{name}: car rot drift {re:.2f}d > {t['rot']}"
    assert be <= t["bpos"], f"{name}: ball pos drift {be:.2f} > {t['bpos']}"
    assert bv <= t["bvel"], f"{name}: ball vel p98 {bv:.2f} > {t['bvel']}"
    slack = t["flag_slack"]
    for f in FLAGS:
        bad = _flag_mismatch_ticks(tr, ours, f, u)
        assert bad <= slack, \
            f"{name}: flag {f} mismatched for {bad} ticks (> {slack})"
