"""True multi-process distributed BA: two OS processes, each with 4
virtual CPU devices, joined via jax.distributed over localhost gRPC —
the closest a single machine gets to the 2-host DCN topology the
BASELINE's scaling criterion targets."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, %(root)r)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
import numpy as np
from orb_slam2_test_tpu.parallel.multihost import (
    initialize_from_env, global_ba_mesh, make_global_problem,
)
from orb_slam2_test_tpu.parallel.dist_ba import (
    dist_bundle_adjust, shard_problem,
)

assert initialize_from_env()
assert jax.process_count() == 2, jax.process_count()
mesh = global_ba_mesh()
assert mesh.size == 8, mesh.size

sys.path.insert(0, %(tests)r)
from test_ba import make_ba_problem

rng = np.random.default_rng(7)
cam, prob, T_true, X_true = make_ba_problem(
    rng, n_cams=5, n_pts=64, noise=0.3, n_fixed=2
)
sprob = shard_problem(prob, mesh.size)
gprob = make_global_problem(sprob, mesh)
Tcw, xyz, cost = dist_bundle_adjust(gprob, cam, mesh, iters=8)
Tcw = np.asarray(Tcw)  # replicated output: addressable everywhere
assert np.isfinite(float(cost))
if jax.process_index() == 0:
    np.savez(%(out)r, Tcw=Tcw, cost=float(cost))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dist_ba(tmp_path, rng):
    out = str(tmp_path / "proc0.npz")
    script = WORKER % {
        "root": ROOT,
        "tests": os.path.join(ROOT, "tests"),
        "out": out,
    }
    wpath = str(tmp_path / "worker.py")
    with open(wpath, "w") as f:
        f.write(script)

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            SLAM_COORDINATOR=f"127.0.0.1:{port}",
            SLAM_NUM_PROCS="2",
            SLAM_PROC_ID=str(pid),
            XLA_FLAGS="",  # worker sets device count via jax.config
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, wpath],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process BA timed out")
        outs.append((p.returncode, stdout.decode(), stderr.decode()))
    for rc, so, se in outs:
        assert rc == 0, f"worker failed:\n{so}\n{se[-3000:]}"

    # compare against the in-process 8-device solve of the same problem
    from orb_slam2_test_tpu.parallel.dist_ba import (
        dist_bundle_adjust,
        make_ba_mesh,
        shard_problem,
    )

    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from test_ba import make_ba_problem

    ref_rng = np.random.default_rng(7)
    cam, prob, T_true, X_true = make_ba_problem(
        ref_rng, n_cams=5, n_pts=64, noise=0.3, n_fixed=2
    )
    r8 = dist_bundle_adjust(
        shard_problem(prob, 8), cam, make_ba_mesh(8), iters=8
    )
    got = np.load(out)
    np.testing.assert_allclose(got["Tcw"], np.asarray(r8[0]), atol=5e-3)
