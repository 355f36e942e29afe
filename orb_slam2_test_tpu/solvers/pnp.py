"""PnP RANSAC for relocalization.

Replaces src/PnPsolver.cc (EPnP + Gauss-Newton inside adaptive RANSAC,
used only by Tracking::Relocalization). TPU-native redesign: a batched
DLT-P6P hypothesis sweep — every RANSAC sample solves the 6-point DLT
projection system with one batched SVD, extracts [R|t] with
orthogonalization, and all hypotheses are scored against all points in
one [S, M] reprojection pass. The winner is polished by the standard
motion-only GN (solvers/pose_opt). Functionally equivalent to EPnP
RANSAC (minimal-sample pose from 2D-3D matches); chosen because DLT
batches into pure matmul/SVD ops.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
from orb_slam2_test_tpu.utils.precision import f32_matmuls
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.geometry.se3 import rt_to_mat


class PnPResult(NamedTuple):
    success: jax.Array  # [] bool
    Tcw: jax.Array  # [4, 4]
    inliers: jax.Array  # [M] bool
    n_inliers: jax.Array  # [] int32


def _solve_p6p_dlt(X: jax.Array, uvn: jax.Array) -> jax.Array:
    """Batched DLT: X [S, 6, 3] world pts, uvn [S, 6, 2] normalized image
    coords -> P [S, 3, 4] projection matrices (up to scale)."""
    S = X.shape[0]
    ones = jnp.ones_like(X[..., :1])
    Xh = jnp.concatenate([X, ones], axis=-1)  # [S, 6, 4]
    zeros = jnp.zeros_like(Xh)
    u = uvn[..., 0:1]
    v = uvn[..., 1:2]
    r1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=-1)  # [S, 6, 12]
    r2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)  # [S, 12, 12]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[:, 11, :].reshape(S, 3, 4)


def _extract_rt(P: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[S, 3, 4] -> (R [S, 3, 3], t [S, 3]) with R orthogonalized via
    SVD and the scale fixed so det(R) = +1."""
    M = P[:, :, :3]
    U, d, Vt = jnp.linalg.svd(M)
    detUV = jnp.linalg.det(U @ Vt)
    # proper rotation
    D = jnp.broadcast_to(jnp.eye(3), U.shape).at[:, 2, 2].set(
        jnp.sign(detUV)
    )
    R = U @ D @ Vt
    scale = jnp.mean(d, axis=-1) * jnp.sign(detUV)
    t = P[:, :, 3] / jnp.where(jnp.abs(scale) > 1e-12, scale, 1e-12)[:, None]
    return R, t


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("cam", "n_iters"))
def pnp_ransac(
    cam: PinholeCamera,
    X: jax.Array,  # [M, 3] world points
    uv: jax.Array,  # [M, 2] observed pixels
    valid: jax.Array,  # [M]
    key: jax.Array,
    n_iters: int = 200,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
) -> PnPResult:
    """Batched-hypothesis PnP RANSAC (PnPsolver::iterate equivalent)."""
    M = X.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, M, shape=(n_iters, 6), replace=True, p=p)

    # normalized image coords for conditioning
    uvn = jnp.stack(
        [(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], axis=-1
    )
    P = _solve_p6p_dlt(X[idx], uvn[idx])
    R, t = _extract_rt(P)

    # score: reprojection chi2 per hypothesis x point
    pc = jnp.einsum("sij,mj->smi", R, X) + t[:, None, :]  # [S, M, 3]
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    up = cam.fx * pc[..., 0] / zs + cam.cx
    vp = cam.fy * pc[..., 1] / zs + cam.cy
    e2 = (up - uv[None, :, 0]) ** 2 + (vp - uv[None, :, 1]) ** 2
    inl = (e2 < chi2_th) & (z > 0.0) & valid[None, :]
    scores = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(scores)
    Tcw = rt_to_mat(R[best], t[best])
    cur_inl = inl[best]

    # GN polish on the consensus set + inlier re-estimation (the
    # reference's EPnP solver refines with gauss_newton the same way)
    from orb_slam2_test_tpu.geometry.se3 import se3_exp
    from orb_slam2_test_tpu.solvers.reprojection import project_residual

    obs = jnp.concatenate([uv, -jnp.ones((M, 1))], axis=-1)
    isig2 = jnp.ones((M,))

    def refine_round(carry, _):
        Tcw, cur_inl = carry

        def gn(T, _):
            res = project_residual(cam, T, X, obs, isig2)
            w = (cur_inl & valid & res.depth_ok).astype(jnp.float32)
            JT = jnp.swapaxes(res.Jc, -1, -2)
            Hm = jnp.einsum("oij,ojk->ik", JT * w[:, None, None], res.Jc)
            bm = -jnp.einsum("oij,oj->i", JT * w[:, None, None], res.r)
            Hm = Hm + 1e-6 * jnp.eye(6)
            dx = jnp.linalg.solve(Hm, bm)
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)
            return se3_exp(dx) @ T, None

        Tcw, _ = jax.lax.scan(gn, Tcw, None, length=5)
        res = project_residual(cam, Tcw, X, obs, isig2)
        cur_inl = (res.chi2 < chi2_th) & res.depth_ok & valid
        return (Tcw, cur_inl), None

    (Tcw, cur_inl), _ = jax.lax.scan(
        refine_round, (Tcw, cur_inl), None, length=2
    )
    n_inl = jnp.sum(cur_inl.astype(jnp.int32))
    return PnPResult(
        success=n_inl >= min_inliers,
        Tcw=Tcw,
        inliers=cur_inl,
        n_inliers=n_inl,
    )
