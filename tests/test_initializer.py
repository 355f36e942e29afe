"""Tests for monocular H/F RANSAC initialization."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.se3 import se3_exp, se3_apply
from orb_slam2_test_tpu.geometry.camera import project
from orb_slam2_test_tpu.solvers.initializer import initialize_mono
from orb_slam2_test_tpu.utils.synthetic import default_camera, make_landmarks


def _two_view(rng, n=300, planar=False, noise=0.3, outlier_frac=0.0,
              baseline=0.4):
    cam = default_camera(640, 480)
    if planar:
        xy = rng.uniform(-2.5, 2.5, size=(n, 2))
        z = 6.0 + 0.3 * xy[:, 0] + 0.2 * xy[:, 1]  # tilted plane
        X = np.concatenate([xy, z[:, None]], axis=1).astype(np.float32)
    else:
        X = make_landmarks(rng, n, spread=2.5)
    X = jnp.asarray(X)
    T1 = jnp.eye(4)
    T2 = se3_exp(
        jnp.array([baseline, 0.03, 0.02, 0.01, 0.05, 0.01], jnp.float32)
    )
    uv1, z1 = project(cam, se3_apply(T1, X))
    uv2, z2 = project(cam, se3_apply(T2, X))
    uv1 = uv1 + jnp.asarray(rng.normal(0, noise, uv1.shape), jnp.float32)
    uv2 = uv2 + jnp.asarray(rng.normal(0, noise, uv2.shape), jnp.float32)
    n_out = int(n * outlier_frac)
    if n_out:
        uv2 = uv2.at[:n_out].set(
            jnp.asarray(rng.uniform(0, 480, (n_out, 2)), jnp.float32)
        )
    valid = jnp.ones(n, bool)
    return cam, X, T2, uv1, uv2, valid


class TestMonoInit:
    def test_general_scene_uses_fundamental(self, rng):
        cam, X, T2, uv1, uv2, valid = _two_view(rng)
        res = initialize_mono(cam, uv1, uv2, valid, jax.random.PRNGKey(0))
        assert bool(res.success)
        assert not bool(res.used_homography)
        # direction of translation matches ground truth up to scale
        t_est = np.asarray(res.Tcw2[:3, 3])
        t_true = np.asarray(T2[:3, 3])
        cos = abs(np.dot(t_est, t_true) / (
            np.linalg.norm(t_est) * np.linalg.norm(t_true)))
        assert cos > 0.99
        # rotation close
        R_err = np.asarray(res.Tcw2[:3, :3]).T @ np.asarray(T2[:3, :3])
        assert abs(np.trace(R_err) - 3.0) < 0.01
        assert int(res.n_good) > 200

    def test_planar_scene_uses_homography(self, rng):
        cam, X, T2, uv1, uv2, valid = _two_view(rng, planar=True)
        res = initialize_mono(cam, uv1, uv2, valid, jax.random.PRNGKey(1))
        assert bool(res.used_homography)
        assert bool(res.success)
        t_est = np.asarray(res.Tcw2[:3, 3])
        t_true = np.asarray(T2[:3, 3])
        cos = abs(np.dot(t_est, t_true) / (
            np.linalg.norm(t_est) * np.linalg.norm(t_true)))
        assert cos > 0.98

    def test_robust_to_outliers(self, rng):
        cam, X, T2, uv1, uv2, valid = _two_view(rng, outlier_frac=0.25)
        res = initialize_mono(cam, uv1, uv2, valid, jax.random.PRNGKey(2))
        assert bool(res.success)
        t_est = np.asarray(res.Tcw2[:3, 3])
        t_true = np.asarray(T2[:3, 3])
        cos = abs(np.dot(t_est, t_true) / (
            np.linalg.norm(t_est) * np.linalg.norm(t_true)))
        assert cos > 0.98
        # outlier rows should not be 'good'
        good = np.asarray(res.good)
        assert good[:75].sum() < 10

    def test_pure_rotation_fails(self, rng):
        """No parallax -> initialization must be rejected."""
        cam, X, T2, uv1, uv2, valid = _two_view(rng, baseline=0.0)
        res = initialize_mono(cam, uv1, uv2, valid, jax.random.PRNGKey(3))
        assert not bool(res.success)

    def test_triangulated_scale_consistency(self, rng):
        """Triangulated structure matches ground truth up to one scale."""
        cam, X, T2, uv1, uv2, valid = _two_view(rng, noise=0.1)
        res = initialize_mono(cam, uv1, uv2, valid, jax.random.PRNGKey(4))
        good = np.asarray(res.good)
        pts = np.asarray(res.points)[good]
        gt = np.asarray(X)[good]
        scale = np.median(np.linalg.norm(pts, axis=1) /
                          np.linalg.norm(gt, axis=1))
        rel = np.linalg.norm(pts - gt * scale, axis=1) / np.linalg.norm(
            gt * scale, axis=1)
        assert np.median(rel) < 0.02
