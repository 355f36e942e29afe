"""Distributed BA on the 8-device virtual CPU mesh: correctness vs the
single-device solver and scaling smoke test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_test_tpu.geometry.se3 import se3_log, se3_inverse
from orb_slam2_test_tpu.parallel.dist_ba import (
    dist_bundle_adjust,
    make_ba_mesh,
    shard_problem,
)

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_ba import make_ba_problem  # noqa: E402


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_dist_ba_matches_truth(rng, n_dev):
    cam, prob, T_true, X_true = make_ba_problem(
        rng, n_cams=6, n_pts=96, noise=0.4, n_fixed=2
    )
    mesh = make_ba_mesh(n_dev)
    sprob = shard_problem(prob, n_dev)
    Tcw, xyz, cost = dist_bundle_adjust(sprob, cam, mesh, iters=12)
    for c in range(1, 6):
        err = se3_log(Tcw[c] @ se3_inverse(T_true[c]))
        assert float(jnp.linalg.norm(err[:3])) < 0.02, (n_dev, c)


def test_dist_matches_single_device(rng):
    """8-way sharded result must agree with the 1-way result (same math,
    psum is exact for these sizes)."""
    cam, prob, T_true, X_true = make_ba_problem(
        rng, n_cams=5, n_pts=64, noise=0.3, n_fixed=2
    )
    r1 = dist_bundle_adjust(
        shard_problem(prob, 1), cam, make_ba_mesh(1), iters=8
    )
    r8 = dist_bundle_adjust(
        shard_problem(prob, 8), cam, make_ba_mesh(8), iters=8
    )
    np.testing.assert_allclose(
        np.asarray(r1[0]), np.asarray(r8[0]), atol=5e-4
    )
    assert abs(float(r1[2]) - float(r8[2])) < 2.0
