"""Tests for motion-only pose optimization on synthetic scenes."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.se3 import se3_exp, se3_log, se3_inverse
from orb_slam2_test_tpu.geometry.camera import project, project_stereo
from orb_slam2_test_tpu.solvers.pose_opt import pose_optimization
from orb_slam2_test_tpu.utils.synthetic import default_camera, make_landmarks


def _setup(rng, n=200, stereo=False, noise=0.5, outlier_frac=0.0):
    cam = default_camera(640, 480)
    if stereo:
        cam = cam._replace(bf=0.08 * cam.fx)
    X = jnp.asarray(make_landmarks(rng, n, spread=2.0))  # stays in-frame
    T_true = se3_exp(
        jnp.array([0.2, -0.1, 0.05, 0.02, -0.04, 0.01], dtype=jnp.float32)
    )
    from orb_slam2_test_tpu.geometry.se3 import se3_apply

    pc = se3_apply(T_true, X)
    if stereo:
        uvr, z = project_stereo(cam, pc)
        obs = uvr
    else:
        uv, z = project(cam, pc)
        obs = jnp.concatenate([uv, -jnp.ones((n, 1))], axis=-1)
    obs = obs + jnp.asarray(rng.normal(0, noise, obs.shape), jnp.float32)

    n_out = int(n * outlier_frac)
    if n_out:
        bad = jnp.asarray(
            rng.uniform(0, 400, size=(n_out, obs.shape[1])), jnp.float32
        )
        if stereo:
            bad = bad.at[:, 2].set(jnp.abs(bad[:, 2]))
        obs = obs.at[:n_out].set(bad)
    return cam, X, T_true, obs


class TestPoseOptimization:
    def test_converges_from_perturbed_init(self, rng):
        cam, X, T_true, obs = _setup(rng, noise=0.3)
        T0 = (
            se3_exp(jnp.array([0.05, 0.05, -0.05, 0.01, 0.02, -0.01]))
            @ T_true
        )
        res = pose_optimization(
            cam, T0, X, obs, jnp.ones(X.shape[0]), jnp.ones(X.shape[0], bool)
        )
        err = se3_log(res.Tcw @ se3_inverse(T_true))
        assert float(jnp.linalg.norm(err[:3])) < 0.01
        assert float(jnp.linalg.norm(err[3:])) < 0.005
        assert int(res.n_inliers) > 180

    def test_rejects_outliers(self, rng):
        cam, X, T_true, obs = _setup(rng, noise=0.3, outlier_frac=0.3)
        T0 = se3_exp(jnp.array([0.03, -0.02, 0.02, 0.005, 0.01, 0.0])) @ T_true
        res = pose_optimization(
            cam, T0, X, obs, jnp.ones(X.shape[0]), jnp.ones(X.shape[0], bool)
        )
        err = se3_log(res.Tcw @ se3_inverse(T_true))
        assert float(jnp.linalg.norm(err[:3])) < 0.02
        # the 60 corrupted obs should be classified outliers
        inl = np.asarray(res.inliers)
        assert inl[:60].sum() < 10
        assert inl[60:].sum() > 120

    def test_stereo_edges(self, rng):
        cam, X, T_true, obs = _setup(rng, stereo=True, noise=0.3)
        T0 = se3_exp(jnp.array([0.04, 0.02, -0.03, 0.01, 0.0, 0.01])) @ T_true
        res = pose_optimization(
            cam, T0, X, obs, jnp.ones(X.shape[0]), jnp.ones(X.shape[0], bool)
        )
        err = se3_log(res.Tcw @ se3_inverse(T_true))
        assert float(jnp.linalg.norm(err[:3])) < 0.01
        assert int(res.n_inliers) > 180

    def test_masked_observations_ignored(self, rng):
        cam, X, T_true, obs = _setup(rng, noise=0.3)
        # corrupt half the observations but also mask them out
        obs = obs.at[:100, :2].set(0.0)
        valid = jnp.arange(X.shape[0]) >= 100
        T0 = se3_exp(jnp.array([0.03, 0.0, 0.02, 0.0, 0.01, 0.0])) @ T_true
        res = pose_optimization(cam, T0, X, obs, jnp.ones(X.shape[0]), valid)
        err = se3_log(res.Tcw @ se3_inverse(T_true))
        assert float(jnp.linalg.norm(err[:3])) < 0.02
        assert int(res.n_inliers) <= 100
