"""Sim(3) similarity-transform operations, batched and jit-friendly.

TPU-native replacement for g2o::Sim3 (reference: Thirdparty/g2o/g2o/types/sim3.h)
used by loop closing (Sim3Solver, OptimizeSim3, OptimizeEssentialGraph).

Representation: a Sim3 is the tuple (s, R, t) stored as a dict-free flat
array [..., 8] = (t[3], omega-as-quat? no -> we store (s, R, t) explicitly):
we use a 4x4 matrix [[s*R, t], [0, 1]] plus helpers, mirroring how the
essential-graph optimizer manipulates them. Tangent vectors are 7-vectors
xi = (upsilon, omega, sigma): translation, rotation, log-scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.se3 import (
    hat,
    so3_exp,
    so3_log,
    rt_to_mat,
)

_EPS = 1e-8


def sim3_make(s: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """(s [...], R [..., 3, 3], t [..., 3]) -> S [..., 4, 4] = [[sR, t],[0,1]]."""
    return rt_to_mat(s[..., None, None] * R, t)


def sim3_scale(S: jax.Array) -> jax.Array:
    """Recover scale from S: s = det(sR)^(1/3) = ||first row|| (R orthonormal)."""
    return jnp.linalg.norm(S[..., 0, :3], axis=-1)


def sim3_rotation(S: jax.Array) -> jax.Array:
    s = sim3_scale(S)
    return S[..., :3, :3] / s[..., None, None]


def sim3_translation(S: jax.Array) -> jax.Array:
    return S[..., :3, 3]


def sim3_from_se3(T: jax.Array, s: jax.Array | None = None) -> jax.Array:
    """Lift SE3 to Sim3 with scale s (default 1) — reference LoopClosing
    builds g2o::Sim3(Rcw, tcw, 1.0) for non-corrected keyframes."""
    if s is None:
        s = jnp.ones(T.shape[:-2], dtype=T.dtype)
    return sim3_make(s, T[..., :3, :3], T[..., :3, 3])


def se3_from_sim3(S: jax.Array) -> jax.Array:
    """Project Sim3 back to SE3: T = [R | t/s] — the reference's
    CorrectLoop recovers SE3 as [sR|t] with t scaled by 1/s
    (LoopClosing.cc correctedSim3 -> SetPose)."""
    s = sim3_scale(S)
    R = sim3_rotation(S)
    t = sim3_translation(S) / s[..., None]
    return rt_to_mat(R, t)


def sim3_inverse(S: jax.Array) -> jax.Array:
    """S^-1 = [[ (1/s) R^T, -(1/s) R^T t ], [0, 1]]."""
    s = sim3_scale(S)
    R = sim3_rotation(S)
    t = sim3_translation(S)
    Rt = jnp.swapaxes(R, -1, -2)
    inv_s = 1.0 / s
    return sim3_make(
        inv_s, Rt, -inv_s[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)
    )


def sim3_compose(A: jax.Array, B: jax.Array) -> jax.Array:
    """Matrix product composes Sim3s: (sA RA, tA) * (sB RB, tB)."""
    return A @ B


def sim3_apply(S: jax.Array, x: jax.Array) -> jax.Array:
    """Apply S [..., 4, 4] to points x [..., 3]: s R x + t."""
    return (
        jnp.einsum("...ij,...j->...i", S[..., :3, :3], x) + S[..., :3, 3]
    )


def _sim3_W(omega: jax.Array, sigma: jax.Array) -> jax.Array:
    """The W matrix in the Sim(3) exponential: t = W @ upsilon.

    W = A*I + B*[w]_x + C*[w]_x^2 with the standard coefficients
    depending on (theta, sigma). Series-expanded for small values.
    """
    dtype = omega.dtype
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    s = jnp.exp(sigma)
    sigma2 = sigma * sigma

    small_sigma = jnp.abs(sigma) < 1e-4
    small_theta = theta < 1e-4

    # A = (s - 1)/sigma, series: 1 + sigma/2
    A_gen = (s - 1.0) / jnp.where(small_sigma, 1.0, sigma)
    A0 = 1.0 + sigma / 2.0 + sigma2 / 6.0
    coefA = jnp.where(small_sigma, A0, A_gen)

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    denom = sigma2 + theta2

    safe_theta = jnp.where(small_theta, 1.0, theta)
    safe_denom = jnp.where(denom < _EPS, 1.0, denom)

    a_ = s * sin_t
    b_ = s * cos_t

    # B (coefficient of [w]_x):
    #   general: B = ( a*sigma + (1 - b)*theta ) / (theta * (sigma^2 + theta^2))
    #   sigma ~ 0: B = (1 - cos)/theta^2
    B_gen = (a_ * sigma + (1.0 - b_) * safe_theta) / (safe_theta * safe_denom)
    B_sigma0 = jnp.where(
        small_theta, 0.5 - theta2 / 24.0, (1.0 - cos_t) / jnp.where(small_theta, 1.0, theta2)
    )
    coefB = jnp.where(small_sigma, B_sigma0, jnp.where(small_theta, 0.5 * coefA, B_gen))

    # C coefficient (of [w]^2):
    #   general: C = ( (s - 1)/sigma - ( (b - 1)*sigma + a*theta ) / (sigma^2+theta^2) ) / theta^2
    C_gen = (coefA - ((b_ - 1.0) * sigma + a_ * safe_theta) / safe_denom) / jnp.where(
        small_theta, 1.0, theta2
    )
    C_sigma0 = jnp.where(
        small_theta,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - sin_t) / jnp.where(small_theta, 1.0, theta2 * safe_theta),
    )
    coefC = jnp.where(small_sigma, C_sigma0, jnp.where(small_theta, coefA / 6.0, C_gen))

    K = hat(omega)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), K.shape)
    return (
        coefA[..., None, None] * eye
        + coefB[..., None, None] * K
        + coefC[..., None, None] * KK
    )


def sim3_exp(xi: jax.Array) -> jax.Array:
    """xi [..., 7] = (upsilon, omega, sigma) -> S [..., 4, 4]."""
    upsilon, omega, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(omega)
    s = jnp.exp(sigma)
    W = _sim3_W(omega, sigma)
    t = jnp.einsum("...ij,...j->...i", W, upsilon)
    return sim3_make(s, R, t)


def sim3_log(S: jax.Array) -> jax.Array:
    """S [..., 4, 4] -> xi [..., 7] = (upsilon, omega, sigma).

    Solves W upsilon = t with a 3x3 solve (W is well-conditioned for the
    pose-graph use case where relative transforms are moderate).
    """
    s = sim3_scale(S)
    R = sim3_rotation(S)
    t = sim3_translation(S)
    sigma = jnp.log(s)
    omega = so3_log(R)
    W = _sim3_W(omega, sigma)
    upsilon = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([upsilon, omega, sigma[..., None]], axis=-1)
