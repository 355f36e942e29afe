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
def _pnp_round(
    cam: PinholeCamera,
    X: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    n_iters: int,
    chi2_th: float,
):
    """One batch of n_iters DLT-P6P hypotheses, scored against all
    points. Returns (best_score, best_Tcw, best_inliers)."""
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

    # per-hypothesis GN on its own minimal sample (the reference EPnP's
    # gauss_newton step). The raw 6-point DLT solves an unconstrained
    # projective P; orthogonalizing it back onto SE(3) under pixel
    # noise yields poses too loose to capture the consensus set (at 25%
    # inlier ratio, measured: 32k raw hypotheses often score < 5/40
    # true inliers; 3 GN sweeps on the sample fix that)
    from orb_slam2_test_tpu.geometry.linalg import inv6x6_spd
    from orb_slam2_test_tpu.geometry.se3 import se3_exp
    from orb_slam2_test_tpu.solvers.reprojection import project_residual

    Xs = X[idx]  # [S, 6, 3]
    obs_s = jnp.concatenate(
        [uv[idx], -jnp.ones_like(uv[idx][..., :1])], axis=-1
    )  # [S, 6, 3]
    Tcw_h = rt_to_mat(R, t)  # [S, 4, 4]

    def gn_sample(T, _):
        res = project_residual(
            cam, T[:, None, :, :], Xs, obs_s, jnp.ones(Xs.shape[:2])
        )
        ok = res.depth_ok[..., None, None].astype(jnp.float32)
        Jc = res.Jc * ok  # [S, 6, 3, 6]
        H = jnp.einsum("snki,snkj->sij", Jc, Jc) + 1e-5 * jnp.eye(6)
        b = -jnp.einsum("snki,snk->si", Jc, res.r * ok[..., 0])
        dx = jnp.einsum(
            "sij,sj->si", inv6x6_spd(H), b
        )
        dx = jnp.where(
            jnp.all(jnp.isfinite(dx), axis=-1, keepdims=True), dx, 0.0
        )
        return jax.vmap(lambda d, Ti: se3_exp(d) @ Ti)(dx, T), None

    Tcw_h, _ = jax.lax.scan(gn_sample, Tcw_h, None, length=3)
    R = Tcw_h[:, :3, :3]
    t = Tcw_h[:, :3, 3]

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
    return scores[best], rt_to_mat(R[best], t[best]), inl[best]


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("cam", "min_inliers"))
def _pnp_polish(
    cam: PinholeCamera,
    X: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
    Tcw: jax.Array,
    cur_inl: jax.Array,
    chi2_th: float,
    min_inliers: int,
) -> PnPResult:
    """GN polish on the consensus set + inlier re-estimation (the
    reference's EPnP solver refines with gauss_newton the same way)."""
    from orb_slam2_test_tpu.geometry.se3 import se3_exp
    from orb_slam2_test_tpu.solvers.reprojection import project_residual

    M = X.shape[0]
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
    """Fixed-budget batched-hypothesis PnP RANSAC (one round)."""
    score, Tcw, inl = _pnp_round(
        cam, X, uv, valid, key, n_iters, chi2_th
    )
    return _pnp_polish(
        cam, X, uv, valid, Tcw, inl, chi2_th, min_inliers
    )


def pnp_ransac_adaptive(
    cam: PinholeCamera,
    X: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    batch: int = 256,
    max_hypotheses: int = 16384,
    confidence: float = 0.99,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
) -> tuple[PnPResult, jax.Array]:
    """Adaptive-iteration PnP RANSAC (PnPsolver::SetRansacParameters:
    nIterations = log(1-p) / log(1 - w^s) from the running inlier
    ratio). The TPU idiom is batched ROUNDS: each round scores `batch`
    hypotheses in one program; the host updates the required-trials
    bound from the best consensus so far and stops when the executed
    trials exceed it (or the cap). At healthy inlier ratios (~50%+)
    this exits after one round like the fixed version; at the 20-30%
    ratios of hard relocalizations it keeps sampling where the fixed
    200-hypothesis budget would miss the consensus set entirely
    (w=0.25: ~18.9k trials needed for 99% confidence).

    Returns (PnPResult, next_key)."""
    import math

    import numpy as np

    n_valid = max(int(jax.device_get(jnp.sum(valid))), 1)
    best_score = 0
    best_Tcw = None
    best_inl = None
    done = 0
    required = max_hypotheses
    while done < min(required, max_hypotheses):
        key, sub = jax.random.split(key)
        score, Tcw, inl = _pnp_round(
            cam, X, uv, valid, sub, batch, chi2_th
        )
        score = int(jax.device_get(score))
        done += batch
        if score > best_score:
            best_score, best_Tcw, best_inl = score, Tcw, inl
            w = min(max(score / n_valid, 1e-3), 0.999)
            denom = math.log(max(1.0 - w ** 6, 1e-12))
            required = int(math.ceil(math.log(1.0 - confidence) / denom))
    if best_Tcw is None or best_score < 6:
        M = X.shape[0]
        res = PnPResult(
            success=jnp.asarray(False),
            Tcw=jnp.eye(4),
            inliers=jnp.zeros((M,), bool),
            n_inliers=jnp.asarray(0, jnp.int32),
        )
        return res, key
    res = _pnp_polish(
        cam, X, uv, valid, best_Tcw, best_inl, chi2_th, min_inliers
    )
    return res, key
