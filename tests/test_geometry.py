"""Unit tests for SE3/Sim3/camera/triangulation math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_test_tpu.geometry import (
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
    se3_inverse,
    se3_apply,
    quat_from_rotmat,
    rotmat_from_quat,
    sim3_exp,
    sim3_log,
    sim3_inverse,
    sim3_compose,
    sim3_apply,
    sim3_from_se3,
    se3_from_sim3,
    PinholeCamera,
    project,
    project_stereo,
    backproject,
    undistort_points,
    distort_points,
    triangulate_dlt,
    triangulation_checks,
)
from orb_slam2_test_tpu.geometry.se3 import rt_to_mat
from orb_slam2_test_tpu.geometry.sim3 import sim3_make, sim3_scale, sim3_rotation


def random_twists(rng, n, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 6)) * scale, dtype=jnp.float32)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(64, 3)), dtype=jnp.float32)
        w = jnp.clip(w, -1.5, 1.5)
        R = so3_exp(w)
        w2 = so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-4)

    def test_orthonormal(self, rng):
        w = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
        R = so3_exp(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(
            np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.det(R)), np.ones(16), atol=1e-5
        )

    def test_small_angle(self):
        w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]], dtype=jnp.float32)
        R = so3_exp(w)
        assert np.all(np.isfinite(np.asarray(R)))
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = random_twists(rng, 64, scale=0.8)
        T = se3_exp(xi)
        xi2 = se3_log(T)
        # fp32 conditioning of arccos/J_l^-1 dominates; exact in f64.
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=5e-3)

    def test_inverse(self, rng):
        xi = random_twists(rng, 16)
        T = se3_exp(xi)
        TT = T @ se3_inverse(T)
        np.testing.assert_allclose(
            np.asarray(TT), np.broadcast_to(np.eye(4), TT.shape), atol=1e-5
        )

    def test_apply_matches_matmul(self, rng):
        xi = random_twists(rng, 8)
        T = se3_exp(xi)
        x = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
        xh = jnp.concatenate([x, jnp.ones((8, 1))], axis=-1)
        expected = jnp.einsum("nij,nj->ni", T, xh)[..., :3]
        np.testing.assert_allclose(
            np.asarray(se3_apply(T, x)), np.asarray(expected), atol=1e-5
        )

    def test_jit_grad(self, rng):
        xi = random_twists(rng, 4)

        def loss(xi):
            return jnp.sum(se3_exp(xi)[..., :3, 3] ** 2)

        g = jax.jit(jax.grad(loss))(xi)
        assert np.all(np.isfinite(np.asarray(g)))


class TestQuat:
    def test_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(64, 3)), dtype=jnp.float32)
        R = so3_exp(w)
        q = quat_from_rotmat(R)
        R2 = rotmat_from_quat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_large_rotations(self, rng):
        # exercise all four Shepperd branches
        axes = jnp.eye(3, dtype=jnp.float32)
        for i in range(3):
            w = axes[i] * 3.1
            R = so3_exp(w)
            q = quat_from_rotmat(R)
            np.testing.assert_allclose(
                np.asarray(rotmat_from_quat(q)), np.asarray(R), atol=1e-5
            )


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 7)) * 0.5, dtype=jnp.float32)
        S = sim3_exp(xi)
        xi2 = sim3_log(S)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=3e-3)

    def test_scale_recovery(self, rng):
        w = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
        R = so3_exp(w)
        s = jnp.asarray(rng.uniform(0.5, 2.0, size=(8,)), dtype=jnp.float32)
        t = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
        S = sim3_make(s, R, t)
        np.testing.assert_allclose(np.asarray(sim3_scale(S)), np.asarray(s), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sim3_rotation(S)), np.asarray(R), atol=1e-5
        )

    def test_inverse_compose(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 7)) * 0.5, dtype=jnp.float32)
        S = sim3_exp(xi)
        I = sim3_compose(S, sim3_inverse(S))
        np.testing.assert_allclose(
            np.asarray(I), np.broadcast_to(np.eye(4), I.shape), atol=1e-5
        )

    def test_se3_lift_project(self, rng):
        xi = random_twists(rng, 8)
        T = se3_exp(xi)
        S = sim3_from_se3(T)
        T2 = se3_from_sim3(S)
        np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-6)

    def test_apply_scales(self):
        S = sim3_make(
            jnp.array(2.0), jnp.eye(3, dtype=jnp.float32), jnp.zeros(3)
        )
        x = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(sim3_apply(S, x)), [2.0, 4.0, 6.0])


CAM = PinholeCamera(
    fx=517.3, fy=516.5, cx=318.6, cy=255.3,
    k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0026, k3=1.1633,
    bf=40.0, width=640, height=480,
)  # TUM1.yaml values (reference: Examples/RGB-D/TUM1.yaml)


class TestCamera:
    def test_project_backproject(self, rng):
        x = jnp.asarray(
            rng.uniform(size=(32, 3)) * [2, 2, 4] + [-1, -1, 1], dtype=jnp.float32
        )
        uv, z = project(CAM, x)
        x2 = backproject(CAM, uv, z)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4)

    def test_stereo_disparity(self):
        x = jnp.array([[0.5, 0.2, 2.0]])
        uvr, z = project_stereo(CAM, x)
        disparity = uvr[0, 0] - uvr[0, 2]
        np.testing.assert_allclose(float(disparity), CAM.bf / 2.0, rtol=1e-5)

    def test_undistort_roundtrip(self, rng):
        # points well inside the image where distortion is invertible
        uv = jnp.asarray(
            rng.uniform(size=(64, 2)) * [300, 220] + [170, 130], dtype=jnp.float32
        )
        uv_dist = distort_points(CAM, uv)
        uv_un = undistort_points(CAM, uv_dist, num_iters=10)
        np.testing.assert_allclose(np.asarray(uv_un), np.asarray(uv), atol=0.1)


class TestTriangulation:
    def test_perfect_triangulation(self, rng):
        n = 128
        x_w = jnp.asarray(
            rng.uniform(size=(n, 3)) * [4, 4, 6] + [-2, -2, 4], dtype=jnp.float32
        )
        T1 = jnp.eye(4, dtype=jnp.float32)
        T2 = se3_exp(jnp.array([0.5, 0.05, 0.02, 0.01, 0.08, 0.02], dtype=jnp.float32))
        uv1, _ = project(CAM, se3_apply(T1, x_w))
        uv2, _ = project(CAM, se3_apply(T2, x_w))
        K = CAM.K
        P1 = K @ T1[:3, :]
        P2 = K @ T2[:3, :]
        P1 = jnp.broadcast_to(P1, (n, 3, 4))
        P2 = jnp.broadcast_to(P2, (n, 3, 4))
        x_tri = triangulate_dlt(P1, P2, uv1, uv2)
        np.testing.assert_allclose(np.asarray(x_tri), np.asarray(x_w), atol=2e-2)

        checks = triangulation_checks(
            CAM, jnp.broadcast_to(T1, (n, 4, 4)), jnp.broadcast_to(T2, (n, 4, 4)),
            x_tri, uv1, uv2,
        )
        assert np.asarray(checks.ok).mean() > 0.95

    def test_behind_camera_rejected(self):
        T1 = jnp.eye(4, dtype=jnp.float32)
        T2 = se3_exp(jnp.array([0.5, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=jnp.float32))
        x_bad = jnp.array([[0.0, 0.0, -3.0]])
        checks = triangulation_checks(
            CAM, T1[None], T2[None], x_bad,
            jnp.array([[320.0, 240.0]]), jnp.array([[300.0, 240.0]]),
        )
        assert not bool(checks.ok[0])
