"""Monocular map initialization: parallel H/F RANSAC + reconstruction.

Replaces src/Initializer.cc. The reference runs homography and
fundamental RANSAC in two std::threads, 200 iterations each, picks the
model by RH = SH/(SH+SF) > 0.40, then decomposes (Faugeras's 8 motion
hypotheses for H, 4 for E) with cheirality/parallax checks.

TPU formulation: both model families are *vmapped hypothesis batches* —
one [S, 8]-sample tensor each, one batched SVD for the DLT solves, one
[S, M] scoring pass. Decomposition candidates (8 for H, 4 for F) are
likewise scored as a batch; everything is a fixed-shape program under
jit, and jax.random keys make RANSAC fully reproducible (an improvement
over the reference's thread-timing nondeterminism).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
from orb_slam2_test_tpu.utils.precision import f32_matmuls
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.geometry.se3 import rt_to_mat
from orb_slam2_test_tpu.geometry.triangulation import triangulate_dlt

# reference Initializer: mSigma = 1.0, 200 RANSAC iterations, 8-pt samples
SIGMA = 1.0
RANSAC_ITERS = 200
SAMPLE = 8
TH_H = 5.991  # 2-dof transfer error
TH_F = 3.841  # 1-dof epipolar distance
TH_SCORE = 5.991
MIN_TRIANGULATED = 50
MIN_PARALLAX_DEG = 1.0


class InitResult(NamedTuple):
    success: jax.Array  # [] bool
    used_homography: jax.Array  # [] bool
    Tcw2: jax.Array  # [4, 4] second-camera pose (first camera = identity)
    points: jax.Array  # [M, 3] triangulated points
    good: jax.Array  # [M] bool — triangulated & all gates passed
    n_good: jax.Array  # [] int32


def _normalize(uv: jax.Array, valid: jax.Array):
    """Zero-mean / unit-mean-abs-dev normalization (reference
    Initializer::Normalize). Returns (normalized uv, T [3, 3])."""
    w = valid.astype(uv.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(uv * w[:, None], axis=0) / n
    d = jnp.abs(uv - mean) * w[:, None]
    meandev = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(meandev, 1e-8)
    uvn = (uv - mean) * s
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=uv.dtype
    )
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return uvn, T


def _sample_indices(key, valid: jax.Array, n_iters: int, k: int) -> jax.Array:
    """[n_iters, k] random indices drawn (with replacement across
    hypotheses) from valid entries."""
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    return jax.random.choice(
        key, valid.shape[0], shape=(n_iters, k), replace=True, p=p
    )


def _solve_h_dlt(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Batched homography DLT: x1, x2 [S, 8, 2] -> H [S, 3, 3] with
    x2 ~ H x1."""
    S, k, _ = x1.shape
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    row1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    row2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([row1, row2], axis=1)  # [S, 16, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[:, 8, :].reshape(S, 3, 3)


def _solve_f_8pt(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Batched 8-point fundamental: [S, 8, 2] pairs -> F [S, 3, 3],
    rank-2 enforced."""
    S = x1.shape[0]
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
    )  # [S, 8, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[:, 8, :].reshape(S, 3, 3)
    # rank-2 projection
    uF, dF, vFt = jnp.linalg.svd(F)
    dF = dF.at[:, 2].set(0.0)
    return uF @ (dF[..., None] * vFt)


def _refit_f(uv1n: jax.Array, uv2n: jax.Array, mask: jax.Array) -> jax.Array:
    """Least-squares re-fit of F on the full inlier set (masked rows
    zeroed). Improvement over the reference, which keeps the best
    minimal-sample model; the refit shrinks model error to noise level
    before reconstruction."""
    u1, v1 = uv1n[:, 0], uv1n[:, 1]
    u2, v2 = uv2n[:, 0], uv2n[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
    )
    A = A * mask[:, None].astype(A.dtype)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[8].reshape(3, 3)
    uF, dF, vFt = jnp.linalg.svd(F)
    dF = dF.at[2].set(0.0)
    return uF @ (dF[:, None] * vFt)


def _refit_h(uv1n: jax.Array, uv2n: jax.Array, mask: jax.Array) -> jax.Array:
    """Least-squares re-fit of H on the full inlier set."""
    u1, v1 = uv1n[:, 0], uv1n[:, 1]
    u2, v2 = uv2n[:, 0], uv2n[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    row1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    row2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([row1, row2], axis=0)
    m2 = jnp.concatenate([mask, mask], axis=0)
    A = A * m2[:, None].astype(A.dtype)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[8].reshape(3, 3)


def _score_h(H, H_inv, uv1, uv2, valid):
    """Symmetric transfer score (Initializer::CheckHomography)."""
    ones = jnp.ones_like(uv1[..., :1])
    p1 = jnp.concatenate([uv1, ones], axis=-1)  # [M, 3]
    p2 = jnp.concatenate([uv2, ones], axis=-1)

    q2 = jnp.einsum("sij,mj->smi", H, p1)
    q2 = q2[..., :2] / jnp.where(
        jnp.abs(q2[..., 2:]) > 1e-12, q2[..., 2:], 1e-12
    )
    d2 = jnp.sum((uv2[None] - q2) ** 2, axis=-1) / (SIGMA * SIGMA)

    q1 = jnp.einsum("sij,mj->smi", H_inv, p2)
    q1 = q1[..., :2] / jnp.where(
        jnp.abs(q1[..., 2:]) > 1e-12, q1[..., 2:], 1e-12
    )
    d1 = jnp.sum((uv1[None] - q1) ** 2, axis=-1) / (SIGMA * SIGMA)

    in1 = (d1 < TH_H) & valid[None]
    in2 = (d2 < TH_H) & valid[None]
    score = jnp.sum(
        jnp.where(in1, TH_H - d1, 0.0) + jnp.where(in2, TH_H - d2, 0.0),
        axis=-1,
    )
    return score, in1 & in2


def _score_f(F, uv1, uv2, valid):
    """Epipolar-distance score (Initializer::CheckFundamental)."""
    ones = jnp.ones_like(uv1[..., :1])
    p1 = jnp.concatenate([uv1, ones], axis=-1)
    p2 = jnp.concatenate([uv2, ones], axis=-1)

    l2 = jnp.einsum("sij,mj->smi", F, p1)  # epiline in image 2
    num2 = jnp.einsum("mi,smi->sm", p2, l2) ** 2
    den2 = l2[..., 0] ** 2 + l2[..., 1] ** 2
    d2 = num2 / jnp.maximum(den2, 1e-12) / (SIGMA * SIGMA)

    l1 = jnp.einsum("sji,mj->smi", F, p2)  # epiline in image 1 (F^T p2)
    num1 = jnp.einsum("mi,smi->sm", p1, l1) ** 2
    den1 = l1[..., 0] ** 2 + l1[..., 1] ** 2
    d1 = num1 / jnp.maximum(den1, 1e-12) / (SIGMA * SIGMA)

    in1 = (d1 < TH_F) & valid[None]
    in2 = (d2 < TH_F) & valid[None]
    score = jnp.sum(
        jnp.where(in1, TH_SCORE - d1, 0.0) + jnp.where(in2, TH_SCORE - d2, 0.0),
        axis=-1,
    )
    return score, in1 & in2


def _decompose_E(E: jax.Array) -> tuple[jax.Array, jax.Array]:
    """E [3, 3] -> (R [4, 3, 3], t [4, 3]) candidate motions."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _decompose_H(H: jax.Array, K: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Faugeras SVD-based homography decomposition -> 8 (R, t) candidates
    (reference Initializer::ReconstructH)."""
    Kinv = jnp.linalg.inv(K)
    A = Kinv @ H @ K
    U, d, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]
    V = Vt.T

    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    aux1 = jnp.sqrt(jnp.maximum(d1 * d1 - d2 * d2, 0.0) / denom)
    aux3 = jnp.sqrt(jnp.maximum(d2 * d2 - d3 * d3, 0.0) / denom)
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs, ts = [], []
    # case d' = +d2
    aux_st = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    st_signs = jnp.array([1.0, -1.0, -1.0, 1.0])
    for i in range(4):
        st = st_signs[i] * aux_st
        Rp = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        )
        Rp = Rp.at[0, 0].set(ct).at[0, 2].set(-st)
        Rp = Rp.at[2, 0].set(st).at[2, 2].set(ct)
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    # case d' = -d2
    aux_sp = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sp_signs = jnp.array([1.0, -1.0, -1.0, 1.0])
    for i in range(4):
        sp = sp_signs[i] * aux_sp
        Rp = jnp.zeros((3, 3))
        Rp = Rp.at[0, 0].set(cp).at[0, 2].set(sp)
        Rp = Rp.at[1, 1].set(-1.0)
        Rp = Rp.at[2, 0].set(sp).at[2, 2].set(-cp)
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    return jnp.stack(Rs), jnp.stack(ts)


def _check_rt(
    R: jax.Array,  # [3, 3]
    t: jax.Array,  # [3]
    K: jax.Array,
    uv1: jax.Array,  # [M, 2]
    uv2: jax.Array,
    inliers: jax.Array,  # [M] bool
):
    """Initializer::CheckRT — triangulate all inlier matches for one
    (R, t) hypothesis; count good points. Returns
    (n_good, parallax_cos50, points [M, 3], good [M])."""
    M = uv1.shape[0]
    P1 = K @ jnp.eye(4)[:3, :]
    T2 = rt_to_mat(R, t)
    P2 = K @ T2[:3, :]
    pts = triangulate_dlt(
        jnp.broadcast_to(P1, (M, 3, 4)), jnp.broadcast_to(P2, (M, 3, 4)),
        uv1, uv2,
    )
    finite = jnp.all(jnp.isfinite(pts), axis=-1)
    pts = jnp.where(finite[:, None], pts, 0.0)

    z1 = pts[:, 2]
    pc2 = pts @ R.T + t
    z2 = pc2[:, 2]

    O2 = -R.T @ t
    r1 = pts
    r2 = pts - O2
    cos_par = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    e1u = fx * pts[:, 0] / jnp.where(jnp.abs(z1) > 1e-9, z1, 1e-9) + cx
    e1v = fy * pts[:, 1] / jnp.where(jnp.abs(z1) > 1e-9, z1, 1e-9) + cy
    d1 = (e1u - uv1[:, 0]) ** 2 + (e1v - uv1[:, 1]) ** 2
    e2u = fx * pc2[:, 0] / jnp.where(jnp.abs(z2) > 1e-9, z2, 1e-9) + cx
    e2v = fy * pc2[:, 1] / jnp.where(jnp.abs(z2) > 1e-9, z2, 1e-9) + cy
    d2 = (e2u - uv2[:, 0]) ** 2 + (e2v - uv2[:, 1]) ** 2

    th2 = 4.0 * SIGMA * SIGMA
    good = (
        inliers
        & finite
        & (z1 > 0.0)
        & (z2 > 0.0)
        & (cos_par < 0.99998)
        & (d1 < th2)
        & (d2 < th2)
    )
    n_good = jnp.sum(good.astype(jnp.int32))
    # parallax statistic: 50th-best parallax angle like the reference
    # (it takes min(50, n)-th); approximate with the 50th largest angle.
    ang = jnp.where(good, jnp.arccos(jnp.clip(cos_par, -1.0, 1.0)), 0.0)
    top50 = jax.lax.top_k(ang, 50)[0]
    nth = jnp.clip(jnp.minimum(n_good, 50) - 1, 0, 49)
    parallax_deg = jnp.degrees(top50[nth])
    return n_good, parallax_deg, pts, good


@f32_matmuls
@functools.partial(
    jax.jit, static_argnames=("n_iters", "min_triangulated")
)
def initialize_mono(
    cam: PinholeCamera,
    uv1: jax.Array,  # [M, 2] undistorted keypoints in frame 1
    uv2: jax.Array,  # [M, 2] matched keypoints in frame 2
    valid: jax.Array,  # [M] bool — match exists
    key: jax.Array,
    n_iters: int = RANSAC_ITERS,
    min_triangulated: int = MIN_TRIANGULATED,
) -> InitResult:
    """Full monocular initialization (Initializer::Initialize)."""
    kh, kf = jax.random.split(key)
    K = cam.K

    uv1n, T1 = _normalize(uv1, valid)
    uv2n, T2 = _normalize(uv2, valid)
    T2inv = jnp.linalg.inv(T2)

    # --- homography hypotheses ---
    idx_h = _sample_indices(kh, valid, n_iters, SAMPLE)
    Hn = _solve_h_dlt(uv1n[idx_h], uv2n[idx_h])
    H = T2inv[None] @ Hn @ T1[None]  # denormalize
    H = H / jnp.where(
        jnp.abs(H[:, 2:3, 2:3]) > 1e-12, H[:, 2:3, 2:3], 1e-12
    )
    score_h, in_h = _score_h(H, jnp.linalg.inv(H), uv1, uv2, valid)
    best_h = jnp.argmax(score_h)
    # refit on the consensus set, then rescore with the refined model
    Hn_refit = _refit_h(uv1n, uv2n, in_h[best_h])
    H_refit = T2inv @ Hn_refit @ T1
    H_refit = H_refit / jnp.where(
        jnp.abs(H_refit[2, 2]) > 1e-12, H_refit[2, 2], 1e-12
    )
    score_hr, in_hr = _score_h(
        H_refit[None], jnp.linalg.inv(H_refit)[None], uv1, uv2, valid
    )
    H_best = H_refit
    in_h_best = in_hr[0]
    SH = score_hr[0]

    # --- fundamental hypotheses ---
    idx_f = _sample_indices(kf, valid, n_iters, SAMPLE)
    Fn = _solve_f_8pt(uv1n[idx_f], uv2n[idx_f])
    F = jnp.swapaxes(T2, 0, 1)[None] @ Fn @ T1[None]
    score_f, in_f = _score_f(F, uv1, uv2, valid)
    best_f = jnp.argmax(score_f)
    Fn_refit = _refit_f(uv1n, uv2n, in_f[best_f])
    F_refit = jnp.swapaxes(T2, 0, 1) @ Fn_refit @ T1
    score_fr, in_fr = _score_f(F_refit[None], uv1, uv2, valid)
    F_best = F_refit
    in_f_best = in_fr[0]
    SF = score_fr[0]

    RH = SH / jnp.maximum(SH + SF, 1e-12)
    use_h = RH > 0.40  # reference threshold

    # --- reconstruct both, select by use_h (cheap enough to do both) ---
    Rs_h, ts_h = _decompose_H(H_best, K)
    E = jnp.swapaxes(K, 0, 1) @ F_best @ K
    Rs_f, ts_f = _decompose_E(E)
    # pad F's 4 candidates to 8 with degenerate (identity, zero-t)
    # hypotheses that can never win (zero parallax -> zero good points) —
    # duplicating real candidates would break the best-vs-second gate.
    Rs_pad = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    ts_pad = jnp.zeros((4, 3))
    Rs_f = jnp.concatenate([Rs_f, Rs_pad], axis=0)
    ts_f = jnp.concatenate([ts_f, ts_pad], axis=0)

    Rs = jnp.where(use_h, Rs_h, Rs_f)
    ts = jnp.where(use_h, ts_h, ts_f)
    inl = jnp.where(use_h, in_h_best, in_f_best)

    n_good, par, pts, good = jax.vmap(
        lambda R, t: _check_rt(R, t, K, uv1, uv2, inl)
    )(Rs, ts)

    order = jnp.argsort(-n_good)
    b0, b1 = order[0], order[1]
    n_best, n_second = n_good[b0], n_good[b1]
    n_inl = jnp.sum(inl.astype(jnp.int32))

    min_good = jnp.maximum(
        jnp.int32(min_triangulated),
        (0.9 * n_inl.astype(jnp.float32)).astype(jnp.int32),
    )
    ok = (
        (n_best >= min_good)
        & (n_second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32))
        & (par[b0] > MIN_PARALLAX_DEG)
    )

    Tcw2 = rt_to_mat(Rs[b0], ts[b0])
    return InitResult(
        success=ok,
        used_homography=use_h,
        Tcw2=Tcw2,
        points=pts[b0],
        good=good[b0],
        n_good=n_best,
    )
