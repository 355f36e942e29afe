"""Tests for the Schur-complement bundle adjuster on synthetic problems."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.se3 import se3_exp, se3_apply, se3_inverse, se3_log
from orb_slam2_test_tpu.geometry.camera import project, project_stereo
from orb_slam2_test_tpu.solvers.ba_core import BAProblem, bundle_adjust
from orb_slam2_test_tpu.utils.synthetic import default_camera, make_landmarks


def make_ba_problem(rng, n_cams=6, n_pts=120, stereo=False, noise=0.4,
                    pose_noise=0.02, pt_noise=0.05, outlier_frac=0.0,
                    n_fixed=1):
    cam = default_camera(640, 480)
    if stereo:
        cam = cam._replace(bf=0.08 * cam.fx)
    X_true = jnp.asarray(make_landmarks(rng, n_pts, spread=2.0))
    poses_true = []
    for i in range(n_cams):
        xi = jnp.asarray(
            np.array([0.12, 0.01, 0.0, 0.002, 0.01, 0.0]) * i, jnp.float32
        )
        poses_true.append(se3_exp(xi))
    T_true = jnp.stack(poses_true)

    obs_cam, obs_pt, obs_uvr = [], [], []
    for c in range(n_cams):
        pc = se3_apply(T_true[c], X_true)
        if stereo:
            uvr, z = project_stereo(cam, pc)
        else:
            uv, z = project(cam, pc)
            uvr = jnp.concatenate([uv, -jnp.ones((n_pts, 1))], axis=-1)
        for p in range(n_pts):
            obs_cam.append(c)
            obs_pt.append(p)
            obs_uvr.append(np.asarray(uvr[p]))
    obs_cam = jnp.asarray(obs_cam, jnp.int32)
    obs_pt = jnp.asarray(obs_pt, jnp.int32)
    obs_uvr = jnp.asarray(np.stack(obs_uvr), jnp.float32)
    obs_uvr = obs_uvr.at[:, :2].add(
        jnp.asarray(rng.normal(0, noise, (len(obs_cam), 2)), jnp.float32)
    )
    n_out = int(len(obs_cam) * outlier_frac)
    if n_out:
        sel = rng.choice(len(obs_cam), n_out, replace=False)
        obs_uvr = obs_uvr.at[jnp.asarray(sel), :2].add(
            jnp.asarray(rng.uniform(15, 60, (n_out, 2)), jnp.float32)
        )

    # perturb initial state; the first n_fixed cams stay at truth (gauge:
    # mono BA needs 2 fixed cams to pin scale, stereo needs only 1)
    T_init = []
    for c in range(n_cams):
        if c < n_fixed:
            T_init.append(np.asarray(T_true[c]))
        else:
            d = jnp.asarray(rng.normal(0, pose_noise, 6), jnp.float32)
            T_init.append(np.asarray(se3_exp(d) @ T_true[c]))
    X_init = X_true + jnp.asarray(
        rng.normal(0, pt_noise, X_true.shape), jnp.float32
    )

    prob = BAProblem(
        cam_Tcw=jnp.asarray(np.stack(T_init)),
        cam_fixed=jnp.arange(n_cams) < n_fixed,
        pt_xyz=X_init,
        pt_valid=jnp.ones(n_pts, bool),
        obs_cam=obs_cam,
        obs_pt=obs_pt,
        obs_uvr=obs_uvr,
        obs_isig2=jnp.ones(len(obs_cam)),
        obs_valid=jnp.ones(len(obs_cam), bool),
    )
    return cam, prob, T_true, X_true


class TestBundleAdjust:
    def test_mono_converges(self, rng):
        cam, prob, T_true, X_true = make_ba_problem(rng, n_fixed=2)
        res = bundle_adjust(prob, cam)
        # pose error vs ground truth (gauge fixed by cams 0, 1)
        for c in range(1, T_true.shape[0]):
            err = se3_log(res.cam_Tcw[c] @ se3_inverse(T_true[c]))
            assert float(jnp.linalg.norm(err[:3])) < 0.01, c
        # point accuracy is limited by depth uncertainty along rays:
        # sigma_z ~ z^2/(f*b) * sigma_px ~ 0.05 for this geometry
        pt_err = jnp.linalg.norm(res.pt_xyz - X_true, axis=-1)
        assert float(jnp.median(pt_err)) < 0.08
        assert float(res.obs_inlier.mean()) > 0.97

    def test_stereo_converges(self, rng):
        cam, prob, T_true, X_true = make_ba_problem(rng, stereo=True)
        res = bundle_adjust(prob, cam)
        for c in range(1, T_true.shape[0]):
            err = se3_log(res.cam_Tcw[c] @ se3_inverse(T_true[c]))
            assert float(jnp.linalg.norm(err[:3])) < 0.02, c

    def test_outliers_rejected(self, rng):
        cam, prob, T_true, X_true = make_ba_problem(rng, outlier_frac=0.1, n_fixed=2)
        res = bundle_adjust(prob, cam)
        for c in range(1, T_true.shape[0]):
            err = se3_log(res.cam_Tcw[c] @ se3_inverse(T_true[c]))
            assert float(jnp.linalg.norm(err[:3])) < 0.02, c
        # ~10% of observations should be flagged outliers
        frac_out = 1.0 - float(res.obs_inlier.mean())
        assert 0.05 < frac_out < 0.15

    def test_fixed_camera_stays(self, rng):
        cam, prob, T_true, X_true = make_ba_problem(rng)
        res = bundle_adjust(prob, cam)
        np.testing.assert_allclose(
            np.asarray(res.cam_Tcw[0]), np.asarray(prob.cam_Tcw[0]), atol=1e-6
        )

    def test_cost_decreases(self, rng):
        cam, prob, T_true, X_true = make_ba_problem(
            rng, pose_noise=0.05, pt_noise=0.1, n_fixed=2
        )
        from orb_slam2_test_tpu.solvers.ba_core import _robust_cost

        c0 = float(_robust_cost(prob, cam))
        res = bundle_adjust(prob, cam)
        assert float(res.cost) < 0.1 * c0


class TestCGSolver:
    def test_cg_matches_dense(self, rng):
        """The implicit-Schur CG path must reach the same optimum as the
        dense Schur path (global-BA solver correctness)."""
        cam, prob, T_true, X_true = make_ba_problem(rng, n_fixed=2)
        r_dense = bundle_adjust(prob, cam)
        r_cg = bundle_adjust(prob, cam, solver="cg", cg_iters=40)
        np.testing.assert_allclose(
            np.asarray(r_cg.cam_Tcw), np.asarray(r_dense.cam_Tcw), atol=2e-3
        )
        assert float(r_cg.cost) < 1.2 * float(r_dense.cost) + 1.0

    def test_cg_stereo(self, rng):
        cam, prob, T_true, X_true = make_ba_problem(rng, stereo=True)
        res = bundle_adjust(prob, cam, solver="cg", cg_iters=40)
        for c in range(1, T_true.shape[0]):
            err = se3_log(res.cam_Tcw[c] @ se3_inverse(T_true[c]))
            assert float(jnp.linalg.norm(err[:3])) < 0.02, c
