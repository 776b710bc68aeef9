"""2-process jax.distributed CPU test (SURVEY §4(c), VERDICT r1 missing #7).

Launches two OS processes, each with 4 virtual CPU devices, joined by
jax.distributed into one 8-device runtime. Both contribute their
local_env_slice of the env batch through make_global_env_tree and run one
fused train step over the (env=4, model=2) mesh; the resulting policy
params must match a single-process 8-virtual-device run of the SAME global
program (the sharded-vs-single-device equality of test_sharding.py,
extended across real process boundaries).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_fused_step(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out = str(tmp_path / "proc0.npz")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_child.py"),
             coord, "2", str(pid), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{logs[i][-4000:]}"
    assert os.path.exists(out), logs[0][-2000:]

    with np.load(out) as z:
        dist_entropy = float(z["entropy"])
        dist_params = z["params"]

    # Single-process reference: same global program on 8 virtual devices
    # (this pytest process runs with xla_force_host_platform_device_count=8
    # from conftest).
    from tests.multihost_common import run_one_fused_step
    ref_entropy, ref_params = run_one_fused_step()

    assert dist_params.shape == ref_params.shape
    np.testing.assert_allclose(dist_params, ref_params, rtol=2e-5,
                               atol=2e-6)
    np.testing.assert_allclose(dist_entropy, ref_entropy, rtol=2e-5)
