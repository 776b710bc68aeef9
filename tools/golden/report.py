"""Calibration report: per-scenario divergence of the TPU engine vs the
recorded reference traces. Run from repo root:

    JAX_PLATFORMS=cpu python tools/golden/report.py [scenario ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/rlgymppo_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402


def rot_angle_deg(ra, rb):
    """Geodesic angle between rotmats [.., 3, 3] in degrees."""
    tr = np.einsum("...ij,...ij->...", ra, rb)
    c = np.clip((tr - 1) / 2, -1, 1)
    return np.degrees(np.arccos(c))


def report(name):
    from replay import replay
    tr, ours = replay(name)
    R = tr["controls"].shape[0]
    checkpoints = [c for c in (30, 60, 120, 240, R - 1) if c < R]
    print(f"== {name} ({R - 1} ticks) ==")
    for t in sorted(set(checkpoints)):
        pe = np.linalg.norm(tr["pos"][t] - ours["pos"][t], axis=-1).max()
        ve = np.linalg.norm(tr["vel"][t] - ours["vel"][t], axis=-1).max()
        re = rot_angle_deg(tr["rot"][t], ours["rot"][t]).max()
        be = np.linalg.norm(tr["ball_pos"][t] - ours["ball_pos"][t])
        bv = np.linalg.norm(tr["ball_vel"][t] - ours["ball_vel"][t])
        sp = np.linalg.norm(tr["vel"][t], axis=-1).max()
        print(f"  t={t:4d} car: pos {pe:9.2f} vel {ve:8.2f} rot {re:7.2f}d "
              f"(ref speed {sp:7.1f})  ball: pos {be:9.2f} vel {bv:8.2f}")
    for f in ("is_on_ground", "has_jumped", "has_double_jumped",
              "has_flipped", "is_flipping", "is_jumping", "is_supersonic",
              "is_auto_flipping"):
        a = tr[f][..., 0] != 0
        b = ours[f][..., 0] != 0
        mism = (a != b).sum()
        if mism:
            first = int(np.argwhere((a != b).any(axis=-1))[0][0])
            print(f"  flag {f}: {mism} mismatched rows (first t={first})")
    for f in ("boost", "handbrake_val", "jump_time", "flip_time"):
        err = np.abs(tr[f] - ours[f]).max()
        if err > 1e-4:
            print(f"  scalar {f}: max err {err:.4f}")


if __name__ == "__main__":
    names = sys.argv[1:]
    if not names:
        names = sorted(
            fn[:-4] for fn in os.listdir(
                os.path.join(os.path.dirname(__file__), "..", "..",
                             "tests", "golden")) if fn.endswith(".npz"))
    for n in names:
        report(n)
