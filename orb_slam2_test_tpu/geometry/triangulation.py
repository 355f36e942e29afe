"""Linear triangulation + acceptance checks, batched.

Replaces the reference's per-point SVD triangulation
(reference: Initializer::Triangulate, LocalMapping::CreateNewMapPoints
linear-triangulation block) with a single batched SVD over all candidate
matches at once — the natural TPU formulation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.camera import PinholeCamera, project
from orb_slam2_test_tpu.geometry.se3 import se3_apply


def _dlt_system(P1, P2, uv1, uv2) -> jax.Array:
    """The 4x4 homogeneous DLT system A X_h = 0 (reference
    Initializer::Triangulate construction)."""
    return jnp.stack(
        [
            uv1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
            uv1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
            uv2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
            uv2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
        ],
        axis=-2,
    )


def triangulate_dlt(
    P1: jax.Array, P2: jax.Array, uv1: jax.Array, uv2: jax.Array
) -> jax.Array:
    """DLT triangulation, closed form.

    P1, P2: [..., 3, 4] projection matrices (K [R|t]).
    uv1, uv2: [..., 2] pixel observations.
    Returns world points [..., 3].

    Builds the 4x4 homogeneous system A X_h = 0 (reference
    Initializer::Triangulate) and solves the INHOMOGENEOUS form
    (w = 1): the 4x3 least squares A[:, :3] X = -A[:, 3] via 3x3
    normal equations and the closed-form adjugate inverse. The
    reference takes the SVD null vector instead; a batch of 4x4 SVDs
    costs ~30 ms wall on TPU (latency-bound Jacobi sweeps) and sat on
    the keyframe-insertion critical path — the closed form is
    sub-millisecond. The two solutions agree for any finite point; the
    w ~ 0 (near-infinity, near-zero-parallax) cases where they differ
    produce huge/non-finite coordinates here and are exactly the
    points the parallax/reprojection/cheirality gates reject.
    """
    A = _dlt_system(P1, P2, uv1, uv2)
    B = A[..., :, :3]
    c = A[..., :, 3]
    M = jnp.einsum("...ki,...kj->...ij", B, B)
    rhs = -jnp.einsum("...ki,...k->...i", B, c)
    from orb_slam2_test_tpu.geometry.linalg import inv3x3

    return jnp.einsum("...ij,...j->...i", inv3x3(M), rhs)


def triangulate_dlt_svd(
    P1: jax.Array, P2: jax.Array, uv1: jax.Array, uv2: jax.Array
) -> jax.Array:
    """SVD null-vector DLT (the reference's exact formulation). Kept
    for validation against the closed form; not used on hot paths."""
    _, _, vt = jnp.linalg.svd(
        _dlt_system(P1, P2, uv1, uv2), full_matrices=True
    )
    X = vt[..., 3, :]
    w = X[..., 3]
    w_safe = jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)
    return X[..., :3] / w_safe[..., None]


class TriangulationCheck(NamedTuple):
    ok: jax.Array  # [...] bool — passes all gates
    parallax_cos: jax.Array  # [...] cosine of parallax angle
    z1: jax.Array
    z2: jax.Array


def triangulation_checks(
    cam: PinholeCamera,
    Tcw1: jax.Array,
    Tcw2: jax.Array,
    x_world: jax.Array,
    uv1: jax.Array,
    uv2: jax.Array,
    reproj_chi2: float = 5.991,
    sigma2_1: jax.Array | float = 1.0,
    sigma2_2: jax.Array | float = 1.0,
    min_parallax_cos: float = 0.9998,
) -> TriangulationCheck:
    """Cheirality + parallax + reprojection gates for triangulated points.

    Mirrors the acceptance logic in LocalMapping::CreateNewMapPoints and
    Initializer::CheckRT: positive depth in both views, parallax angle
    above threshold (cos < min_parallax_cos), squared reprojection error
    below chi2 * sigma^2 in both views.
    """
    c1 = se3_apply(Tcw1, x_world)
    c2 = se3_apply(Tcw2, x_world)
    z1, z2 = c1[..., 2], c2[..., 2]

    # parallax between the two viewing rays (from camera centers)
    O1 = -jnp.einsum(
        "...ji,...j->...i", Tcw1[..., :3, :3], Tcw1[..., :3, 3]
    )
    O2 = -jnp.einsum(
        "...ji,...j->...i", Tcw2[..., :3, :3], Tcw2[..., :3, 3]
    )
    r1 = x_world - O1
    r2 = x_world - O2
    cos_par = jnp.sum(r1 * r2, axis=-1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1) + 1e-12
    )

    p1, _ = project(cam, c1)
    p2, _ = project(cam, c2)
    e1 = jnp.sum((p1 - uv1) ** 2, axis=-1)
    e2 = jnp.sum((p2 - uv2) ** 2, axis=-1)

    ok = (
        (z1 > 0.0)
        & (z2 > 0.0)
        & (cos_par < min_parallax_cos)
        & (e1 < reproj_chi2 * sigma2_1)
        & (e2 < reproj_chi2 * sigma2_2)
    )
    return TriangulationCheck(ok=ok, parallax_cos=cos_par, z1=z1, z2=z2)
