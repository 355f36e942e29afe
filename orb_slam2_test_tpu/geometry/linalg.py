"""Small batched linear-algebra kernels shared by the solvers.

TPU note: jnp.linalg.{inv,svd,solve} lower to LAPACK-style iterative /
blocked algorithms whose *latency* dominates at tiny block sizes — a
batch of 3x3 inverses via LU measures ~70x slower than the closed-form
adjugate, and a batch of 4x4 SVDs costs ~30 ms wall regardless of batch
size (one-sided Jacobi sweeps serialize). Every 3x3/6x6 block solve in
the hot paths uses these closed forms instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv3x3(A: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse (adjugate / determinant)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    adj = jnp.stack([
        jnp.stack([A11, A12, A13], axis=-1),
        jnp.stack([A21, A22, A23], axis=-1),
        jnp.stack([A31, A32, A33], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def inv6x6_spd(A: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Batched 6x6 inverse for symmetric positive-definite blocks via
    the 3x3-blockwise Schur formula — closed-form elementwise ops only
    (no LAPACK latency). Used for block-Jacobi preconditioners on the
    reduced camera system.

        A = [[P, B], [B^T, D]]
        S = D - B^T P^-1 B          (Schur complement)
        A^-1 = [[P^-1 + P^-1 B S^-1 B^T P^-1, -P^-1 B S^-1],
                [-S^-1 B^T P^-1,               S^-1        ]]
    """
    Pb = A[..., :3, :3]
    B = A[..., :3, 3:]
    D = A[..., 3:, 3:]
    eye3 = jnp.eye(3, dtype=A.dtype)
    Pinv = inv3x3(Pb + eps * eye3)
    PB = Pinv @ B
    S = D - jnp.swapaxes(B, -1, -2) @ PB
    Sinv = inv3x3(S + eps * eye3)
    TL = Pinv + PB @ Sinv @ jnp.swapaxes(PB, -1, -2)
    TR = -PB @ Sinv
    BL = jnp.swapaxes(TR, -1, -2)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Sinv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
