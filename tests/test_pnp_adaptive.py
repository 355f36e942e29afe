"""Adaptive PnP RANSAC (reference PnPsolver::SetRansacParameters):
at ~25% inlier ratio the consensus set needs ~19k trials for 99%
confidence — the fixed 200-hypothesis budget almost always misses it,
the adaptive-round version keeps sampling until the running bound is
met."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.solvers.pnp import pnp_ransac, pnp_ransac_adaptive

CAM = PinholeCamera(
    fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480, bf=0.0
)


def _reloc_problem(rng, n_inlier=40, n_outlier=120):
    """2D-3D matches where only n_inlier correspond to the true pose and
    the rest are clutter (wrong data association, the reloc failure
    mode)."""
    R = np.eye(3)
    t = np.array([0.3, -0.1, 0.5])
    X_in = rng.uniform([-2, -2, 4], [2, 2, 10], (n_inlier, 3))
    pc = X_in @ R.T + t
    uv_in = np.stack(
        [
            500.0 * pc[:, 0] / pc[:, 2] + 320.0 + rng.normal(0, 0.3, n_inlier),
            500.0 * pc[:, 1] / pc[:, 2] + 240.0 + rng.normal(0, 0.3, n_inlier),
        ],
        axis=-1,
    )
    # clutter: random world points paired with random pixels
    X_out = rng.uniform([-2, -2, 4], [2, 2, 10], (n_outlier, 3))
    uv_out = np.stack(
        [
            rng.uniform(0, 640, n_outlier),
            rng.uniform(0, 480, n_outlier),
        ],
        axis=-1,
    )
    X = np.concatenate([X_in, X_out]).astype(np.float32)
    uv = np.concatenate([uv_in, uv_out]).astype(np.float32)
    perm = rng.permutation(len(X))
    Tcw = np.eye(4)
    Tcw[:3, :3] = R
    Tcw[:3, 3] = t
    return jnp.asarray(X[perm]), jnp.asarray(uv[perm]), Tcw


def test_adaptive_recovers_at_25pct_inliers(rng):
    X, uv, Tcw_gt = _reloc_problem(rng)
    valid = jnp.ones((X.shape[0],), bool)
    ok_fixed = 0
    ok_adapt = 0
    for seed in range(4):
        key = jax.random.PRNGKey(seed)
        rf = pnp_ransac(CAM, X, uv, valid, key, n_iters=200)
        ok_fixed += int(
            bool(rf.success)
            and np.linalg.norm(np.asarray(rf.Tcw[:3, 3]) - Tcw_gt[:3, 3])
            < 0.05
        )
        ra, _ = pnp_ransac_adaptive(
            CAM, X, uv, valid, key, batch=512, max_hypotheses=32768
        )
        ok_adapt += int(
            bool(ra.success)
            and np.linalg.norm(np.asarray(ra.Tcw[:3, 3]) - Tcw_gt[:3, 3])
            < 0.05
        )
    # adaptive must recover on every seed; the fixed budget's expected
    # hit rate at w=0.25 is ~5% per seed (don't flake on a lucky draw,
    # just require adaptive to be strictly more reliable)
    assert ok_adapt == 4
    assert ok_adapt > ok_fixed


def test_adaptive_early_exit_at_high_inliers(rng):
    """At healthy inlier ratios one batch must suffice (the adaptive
    bound collapses below the first batch size)."""
    X, uv, Tcw_gt = _reloc_problem(rng, n_inlier=100, n_outlier=20)
    valid = jnp.ones((X.shape[0],), bool)
    import orb_slam2_test_tpu.solvers.pnp as pnp_mod

    calls = {"n": 0}
    orig = pnp_mod._pnp_round

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    pnp_mod._pnp_round = counting
    try:
        res, _ = pnp_ransac_adaptive(
            CAM, X, uv, valid, jax.random.PRNGKey(0), batch=256
        )
    finally:
        pnp_mod._pnp_round = orig
    assert bool(res.success)
    assert calls["n"] == 1
    assert (
        np.linalg.norm(np.asarray(res.Tcw[:3, 3]) - Tcw_gt[:3, 3]) < 0.05
    )
