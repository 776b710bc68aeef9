"""Parity test for the experimental fused Pallas tick kernel
(ops/pallas_tick.py) in interpret mode.

The kernel replays the exact jaxpr of arena._tick_core_inner (with
semantics-preserving Mosaic rewrites: bool select_n -> and/or masks,
cast-to-bool -> !=0, bool shape ops in i32, host-folded constants), so
against a JITTED multi-tick reference it must match to float32 rounding
(fma/fusion choices differ between executions; ~1 ulp on hardware).

Runs in a single-device CPU subprocess: the suite's 8-virtual-device
env slows the interpret-mode Pallas build ~8x (see
tests/pallas_tick_child.py for the actual assertions).
"""

import os
import subprocess
import sys
import pytest

# golden replays / multihost / learner e2e are the
# acceptance bar but dominate wall time: slow-marked, run
# with `pytest tests/ --runslow` (README "Testing")
pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))


def test_fused_ticks_matches_jitted_scan():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "pallas_tick_child.py")],
        env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PALLAS_TICK_PARITY_OK" in proc.stdout, \
        proc.stdout + proc.stderr
