"""Sim(3) RANSAC between two keyframes' matched map points.

Replaces src/Sim3Solver.cc: Horn's (1987) closed-form absolute
orientation on 3-point samples inside RANSAC, solving the similarity
(s, R, t) between the camera-frame point sets of two keyframes, with
inliers checked by reprojection in both images. Fixed scale = 1 for
stereo/RGB-D (reference bFixScale).

TPU formulation: all RANSAC hypotheses solved as one batched Horn
(3x3 SVD batch), all inlier checks as one [S, M] reprojection pass.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
from orb_slam2_test_tpu.utils.precision import f32_matmuls
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.geometry.sim3 import sim3_make


class Sim3Result(NamedTuple):
    success: jax.Array
    S12: jax.Array  # [4, 4] sim3 mapping cam2-frame points into cam1 frame
    inliers: jax.Array  # [M]
    n_inliers: jax.Array


def _horn_batch(
    p1: jax.Array, p2: jax.Array, fix_scale: bool
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched Horn absolute orientation: p1, p2 [S, k, 3] ->
    (s [S], R [S, 3, 3], t [S, 3]) with p1 ~ s R p2 + t."""
    c1 = jnp.mean(p1, axis=1, keepdims=True)
    c2 = jnp.mean(p2, axis=1, keepdims=True)
    q1 = p1 - c1
    q2 = p2 - c2
    H = jnp.einsum("ski,skj->sij", q1, q2)  # [S, 3, 3]
    U, d, Vt = jnp.linalg.svd(H)
    detUV = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    D = jnp.broadcast_to(jnp.eye(3), U.shape).at[:, 2, 2].set(
        jnp.sign(detUV)
    )
    R = U @ D @ Vt
    if fix_scale:
        s = jnp.ones(p1.shape[0])
    else:
        # s = sum(q1 . (R q2)) / sum(|q2|^2)
        Rq2 = jnp.einsum("sij,skj->ski", R, q2)
        num = jnp.sum(q1 * Rq2, axis=(1, 2))
        den = jnp.maximum(jnp.sum(q2 * q2, axis=(1, 2)), 1e-12)
        s = num / den
    t = c1[:, 0, :] - s[:, None] * jnp.einsum("sij,sj->si", R, c2[:, 0, :])
    return s, R, t


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("cam", "n_iters", "fix_scale"))
def sim3_ransac(
    cam: PinholeCamera,
    pc1: jax.Array,  # [M, 3] matched points in camera-1 frame
    pc2: jax.Array,  # [M, 3] same points in camera-2 frame
    valid: jax.Array,  # [M]
    key: jax.Array,
    n_iters: int = 128,
    fix_scale: bool = False,
    min_inliers: int = 20,
    chi2_1: float = 9.210,  # reference mvnMaxError1 ~ 9.21 sigma^2
    chi2_2: float = 9.210,
) -> Sim3Result:
    """Sim3Solver::iterate equivalent. Returns S12 with
    pc1 ~ s12 R12 pc2 + t12."""
    M = pc1.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, M, shape=(n_iters, 3), replace=True, p=p)

    s, R, t = _horn_batch(pc1[idx], pc2[idx], fix_scale)

    # check: project pc2 through S12 into image 1, and pc1 through S21
    # into image 2 (reference CheckInliers does both projections)
    def proj(p3):  # [..., 3] -> [..., 2]
        z = jnp.where(jnp.abs(p3[..., 2]) > 1e-6, p3[..., 2], 1e-6)
        return jnp.stack(
            [cam.fx * p3[..., 0] / z + cam.cx, cam.fy * p3[..., 1] / z + cam.cy],
            axis=-1,
        )

    uv1_obs = proj(pc1)  # [M, 2]
    uv2_obs = proj(pc2)

    p2in1 = (
        s[:, None, None] * jnp.einsum("sij,mj->smi", R, pc2) + t[:, None, :]
    )
    Rt = jnp.swapaxes(R, 1, 2)
    inv_s = 1.0 / jnp.maximum(s, 1e-12)
    p1in2 = inv_s[:, None, None] * jnp.einsum(
        "sij,smj->smi", Rt, pc1[None, :, :] - t[:, None, :]
    )
    e1 = jnp.sum((proj(p2in1) - uv1_obs[None]) ** 2, axis=-1)
    e2 = jnp.sum((proj(p1in2) - uv2_obs[None]) ** 2, axis=-1)
    inl = (e1 < chi2_1) & (e2 < chi2_2) & valid[None, :]
    scores = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(scores)
    n = scores[best]
    return Sim3Result(
        success=n >= min_inliers,
        S12=sim3_make(s[best], R[best], t[best]),
        inliers=inl[best],
        n_inliers=n,
    )


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("cam", "iters", "fix_scale"))
def optimize_sim3(
    cam: PinholeCamera,
    S12: jax.Array,  # [4, 4] initial sim3
    pc1: jax.Array,  # [M, 3]
    pc2: jax.Array,
    valid: jax.Array,
    iters: int = 10,
    fix_scale: bool = False,
    chi2_th: float = 9.210,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Gauss-Newton refinement of the relative Sim3 with bidirectional
    reprojection residuals (Optimizer::OptimizeSim3 equivalent, with
    autodiff Jacobians instead of g2o's hand-written ones).

    Returns (S12 refined, inliers [M], n_inliers)."""
    from orb_slam2_test_tpu.geometry.sim3 import sim3_exp, sim3_inverse

    def proj(p3):
        z = jnp.where(jnp.abs(p3[..., 2]) > 1e-6, p3[..., 2], 1e-6)
        return jnp.stack(
            [cam.fx * p3[..., 0] / z + cam.cx, cam.fy * p3[..., 1] / z + cam.cy],
            axis=-1,
        )

    uv1_obs = proj(pc1)
    uv2_obs = proj(pc2)

    def residuals(xi, S):
        Sc = sim3_exp(xi) @ S
        p2in1 = pc2 @ (Sc[:3, :3]).T + Sc[:3, 3]
        Sinv = sim3_inverse(Sc)
        p1in2 = pc1 @ (Sinv[:3, :3]).T + Sinv[:3, 3]
        r = jnp.concatenate(
            [proj(p2in1) - uv1_obs, proj(p1in2) - uv2_obs], axis=0
        )  # [2M, 2]
        return r

    w_valid = jnp.concatenate([valid, valid]).astype(jnp.float32)

    from orb_slam2_test_tpu.geometry.robust import huber_weight

    def gn_step(S, _):
        xi0 = jnp.zeros(7)
        J = jax.jacfwd(lambda xi: residuals(xi, S))(xi0)  # [2M, 2, 7]
        r = residuals(xi0, S)
        chi2 = jnp.sum(r * r, axis=-1)
        # Huber robust weighting (reference uses RobustKernelHuber with
        # delta = sqrt(chi2_th)); a hard gate would zero every residual
        # when the initial guess is a few pixels off.
        w = w_valid * huber_weight(chi2, chi2_th**0.5)
        Jw = J * w[:, None, None]
        H = jnp.einsum("mki,mkj->ij", Jw, J)
        b = -jnp.einsum("mki,mk->i", Jw, r)
        if fix_scale:
            H = H.at[6, 6].add(1e12)  # freeze sigma
        H = H + 1e-6 * jnp.eye(7)
        dx = jnp.linalg.solve(H, b)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)
        return sim3_exp(dx) @ S, None

    S, _ = jax.lax.scan(gn_step, S12, None, length=iters)
    r = residuals(jnp.zeros(7), S)
    chi2 = jnp.sum(r * r, axis=-1)
    inl = (chi2[: pc1.shape[0]] < chi2_th) & (
        chi2[pc1.shape[0]:] < chi2_th
    ) & valid
    return S, inl, jnp.sum(inl.astype(jnp.int32))
