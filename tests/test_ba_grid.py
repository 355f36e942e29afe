"""Dense-grid local BA (solvers/ba_grid.py) vs the flat-observation LM
core, and closed-form DLT vs the reference SVD formulation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.geometry.linalg import inv3x3, inv6x6_spd
from orb_slam2_test_tpu.geometry.se3 import se3_apply
from orb_slam2_test_tpu.geometry.triangulation import (
    triangulate_dlt,
    triangulate_dlt_svd,
)
from orb_slam2_test_tpu.solvers.ba_core import BAProblem, bundle_adjust
from orb_slam2_test_tpu.solvers.ba_grid import (
    GridBAProblem,
    grid_bundle_adjust,
)

CAM = PinholeCamera(
    fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480, bf=0.0
)


def _make_problem(rng, C=6, Q=64, noise=0.02):
    """Ground-truth scene + perturbed initial guess; every camera sees
    every point (grid-dense)."""
    Tcw = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    Tcw[:, 0, 3] = np.linspace(0, 0.5, C)
    X = rng.uniform([-2, -2, 4], [2, 2, 8], (Q, 3)).astype(np.float32)

    obs = np.zeros((Q, C, 3), np.float32)
    for c in range(C):
        pc = (Tcw[c, :3, :3] @ X.T).T + Tcw[c, :3, 3]
        obs[:, c, 0] = 500.0 * pc[:, 0] / pc[:, 2] + 320.0
        obs[:, c, 1] = 500.0 * pc[:, 1] / pc[:, 2] + 240.0
        obs[:, c, 2] = -1.0  # monocular

    Tcw0 = Tcw.copy()
    Tcw0[2:, :3, 3] += rng.normal(0, noise, (C - 2, 3)).astype(np.float32)
    X0 = X + rng.normal(0, noise, X.shape).astype(np.float32)
    # fix TWO cameras: mono observations leave a 7-dof similarity gauge,
    # so one fixed camera still lets the scene scale about its center
    fixed = np.zeros(C, bool)
    fixed[0] = fixed[1] = True
    return Tcw, X, Tcw0, X0, obs, fixed


def test_grid_ba_converges(rng):
    Tcw_gt, X_gt, Tcw0, X0, obs, fixed = _make_problem(rng)
    Q, C = obs.shape[:2]
    prob = GridBAProblem(
        cam_Tcw=jnp.asarray(Tcw0),
        cam_fixed=jnp.asarray(fixed),
        pt_xyz=jnp.asarray(X0),
        pt_valid=jnp.ones(Q, bool),
        obs_uvr=jnp.asarray(obs),
        obs_isig2=jnp.ones((Q, C), jnp.float32),
        obs_valid=jnp.ones((Q, C), bool),
    )
    res = grid_bundle_adjust(prob, CAM, iters1=4, iters2=6)
    # reprojection cost collapses to ~zero (noise-free observations;
    # f32 roundoff leaves ~1e-2 px^2 total across 384 edges)
    assert float(res.cost) < 0.1
    assert np.allclose(np.asarray(res.cam_Tcw[0]), Tcw_gt[0])
    err = np.linalg.norm(np.asarray(res.pt_xyz) - X_gt, axis=-1)
    assert float(np.median(err)) < 1e-3
    assert bool(jnp.all(res.obs_inlier))


def test_grid_matches_flat_ba(rng):
    """Grid and flat cores agree on the same problem (same schedule)."""
    _, _, Tcw0, X0, obs, fixed = _make_problem(rng, C=5, Q=48)
    Q, C = obs.shape[:2]
    gprob = GridBAProblem(
        cam_Tcw=jnp.asarray(Tcw0),
        cam_fixed=jnp.asarray(fixed),
        pt_xyz=jnp.asarray(X0),
        pt_valid=jnp.ones(Q, bool),
        obs_uvr=jnp.asarray(obs),
        obs_isig2=jnp.ones((Q, C), jnp.float32),
        obs_valid=jnp.ones((Q, C), bool),
    )
    oc = np.broadcast_to(np.arange(C, dtype=np.int32)[None, :], (Q, C))
    op = np.broadcast_to(np.arange(Q, dtype=np.int32)[:, None], (Q, C))
    fprob = BAProblem(
        cam_Tcw=jnp.asarray(Tcw0),
        cam_fixed=jnp.asarray(fixed),
        pt_xyz=jnp.asarray(X0),
        pt_valid=jnp.ones(Q, bool),
        obs_cam=jnp.asarray(oc.reshape(-1)),
        obs_pt=jnp.asarray(op.reshape(-1)),
        obs_uvr=jnp.asarray(obs.reshape(-1, 3)),
        obs_isig2=jnp.ones((Q * C,), jnp.float32),
        obs_valid=jnp.ones((Q * C,), bool),
    )
    gres = grid_bundle_adjust(gprob, CAM, iters1=3, iters2=4)
    fres = bundle_adjust(fprob, CAM, iters1=3, iters2=4)
    assert float(gres.cost) < 1e-2 and float(fres.cost) < 1e-2
    assert np.allclose(
        np.asarray(gres.cam_Tcw), np.asarray(fres.cam_Tcw), atol=1e-3
    )


def test_grid_ba_ignores_invalid_cells(rng):
    """Garbage in obs_valid=False cells must not perturb the solution."""
    _, _, Tcw0, X0, obs, fixed = _make_problem(rng, C=4, Q=32)
    Q, C = obs.shape[:2]
    valid = rng.uniform(size=(Q, C)) < 0.7
    valid[:, 0] = True
    obs_bad = obs.copy()
    obs_bad[~valid] = 1e6  # poison invalid cells

    def run(o, v):
        prob = GridBAProblem(
            cam_Tcw=jnp.asarray(Tcw0),
            cam_fixed=jnp.asarray(fixed),
            pt_xyz=jnp.asarray(X0),
            pt_valid=jnp.ones(Q, bool),
            obs_uvr=jnp.asarray(o),
            obs_isig2=jnp.ones((Q, C), jnp.float32),
            obs_valid=jnp.asarray(v),
        )
        return grid_bundle_adjust(prob, CAM, iters1=3, iters2=3)

    r1 = run(obs, valid)
    r2 = run(obs_bad, valid)
    assert np.allclose(
        np.asarray(r1.cam_Tcw), np.asarray(r2.cam_Tcw), atol=1e-5
    )


def test_dlt_closed_form_matches_svd(rng):
    N = 200
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    T1 = np.eye(4)
    T2 = np.eye(4)
    T2[:3, 3] = [-0.3, 0.05, 0.02]
    P1 = (K @ T1[:3]).astype(np.float32)
    P2 = (K @ T2[:3]).astype(np.float32)
    X = rng.uniform([-2, -2, 3], [2, 2, 10], (N, 3))
    h = np.concatenate([X, np.ones((N, 1))], axis=1)
    uv1 = (P1 @ h.T).T
    uv1 = uv1[:, :2] / uv1[:, 2:3]
    uv2 = (P2 @ h.T).T
    uv2 = uv2[:, :2] / uv2[:, 2:3]
    P1b = jnp.broadcast_to(jnp.asarray(P1), (N, 3, 4))
    P2b = jnp.broadcast_to(jnp.asarray(P2), (N, 3, 4))
    Xc = np.asarray(triangulate_dlt(
        P1b, P2b, jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32)
    ))
    Xs = np.asarray(triangulate_dlt_svd(
        P1b, P2b, jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32)
    ))
    assert np.allclose(Xc, X, atol=5e-2)
    assert np.allclose(Xc, Xs, atol=5e-2)


def test_inv6x6_spd(rng):
    A = rng.normal(size=(16, 6, 6)).astype(np.float32)
    A = A @ np.swapaxes(A, -1, -2) + 6 * np.eye(6, dtype=np.float32)
    Ainv = np.asarray(inv6x6_spd(jnp.asarray(A)))
    eye = np.einsum("bij,bjk->bik", A, Ainv)
    assert np.allclose(eye, np.eye(6)[None], atol=1e-2)


def test_inv3x3(rng):
    A = rng.normal(size=(32, 3, 3)).astype(np.float32)
    A = A @ np.swapaxes(A, -1, -2) + 3 * np.eye(3, dtype=np.float32)
    Ainv = np.asarray(inv3x3(jnp.asarray(A)))
    assert np.allclose(
        np.einsum("bij,bjk->bik", A, Ainv), np.eye(3)[None], atol=1e-3
    )
