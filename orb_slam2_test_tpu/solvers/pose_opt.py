"""Motion-only bundle adjustment (pose optimization).

Replaces Optimizer::PoseOptimization (reference: src/Optimizer.cc:~240):
g2o Levenberg-Marquardt over a single VertexSE3Expmap with unary
EdgeSE3ProjectXYZOnlyPose edges, 4 rounds x 10 iterations, Huber kernel
with delta = sqrt(5.991) mono / sqrt(7.815) stereo, chi2 outlier gating
between rounds, robust kernel dropped after round 2.

TPU formulation: all observations batched; each GN/LM iteration reduces
[O, 3, 6] Jacobian blocks to one 6x6 system — a handful of fused
reductions. The whole 4x10-iteration schedule is one jitted program
(lax.fori_loop), zero host round-trips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
from orb_slam2_test_tpu.utils.precision import f32_matmuls
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.geometry.robust import (
    CHI2_MONO,
    CHI2_STEREO,
    HUBER_MONO,
    HUBER_STEREO,
    huber_weight,
)
from orb_slam2_test_tpu.geometry.se3 import se3_exp, se3_project
from orb_slam2_test_tpu.solvers.reprojection import project_residual


class PoseOptResult(NamedTuple):
    Tcw: jax.Array  # [4, 4] optimized pose
    inliers: jax.Array  # [O] bool — final inlier classification
    n_inliers: jax.Array  # [] int32
    chi2: jax.Array  # [O] final per-observation chi2


def pose_optimization(
    cam: PinholeCamera,
    Tcw0: jax.Array,
    X: jax.Array,
    obs: jax.Array,
    inv_sigma2: jax.Array,
    valid: jax.Array,
    rounds: int = 4,
    iters_per_round: int = 10,
    damping: float = 1e-3,
) -> "PoseOptResult":
    """Motion-only BA. On TPU backends, dispatches to the fused Pallas
    kernel (solvers/pose_opt_pallas.py: the full 4x10 LM schedule in one
    kernel, ~4x faster than the XLA op-by-op path it matches to ~1e-7)."""
    if jax.default_backend() == "tpu":
        from orb_slam2_test_tpu.solvers.pose_opt_pallas import (
            pose_optimization_tpu,
        )

        Tcw, inliers, chi2 = pose_optimization_tpu(
            cam, Tcw0, X, obs, inv_sigma2, valid,
            rounds=rounds, iters_per_round=iters_per_round, damping=damping,
        )
        inliers = inliers & valid
        return PoseOptResult(
            Tcw=Tcw,
            inliers=inliers,
            n_inliers=jnp.sum(inliers.astype(jnp.int32)),
            chi2=chi2,
        )
    return _pose_optimization_xla(
        cam, Tcw0, X, obs, inv_sigma2, valid,
        rounds=rounds, iters_per_round=iters_per_round, damping=damping,
    )


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("rounds", "iters_per_round"))
def _pose_optimization_xla(
    cam: PinholeCamera,
    Tcw0: jax.Array,  # [4, 4] initial pose
    X: jax.Array,  # [O, 3] world points
    obs: jax.Array,  # [O, 3] (u, v, u_r); u_r < 0 = mono
    inv_sigma2: jax.Array,  # [O]
    valid: jax.Array,  # [O] bool — observation exists
    rounds: int = 4,
    iters_per_round: int = 10,
    damping: float = 1e-3,
) -> PoseOptResult:
    """Batched motion-only BA. Mirrors the reference schedule:
    `rounds` optimization rounds; between rounds observations are
    re-classified inlier/outlier by chi2 (5.991 mono / 7.815 stereo);
    outliers are excluded from the next round but keep being re-tested
    (they can come back, as in the reference). Robust weighting is
    active for the first two rounds only.
    """
    is_stereo = obs[..., 2] >= 0.0
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    delta = jnp.where(is_stereo, HUBER_STEREO, HUBER_MONO)

    def gn_iteration(Tcw, inlier_mask, robust):
        res = project_residual(cam, Tcw, X, obs, inv_sigma2)
        w_huber = jnp.where(robust, huber_weight(res.chi2, delta), 1.0)
        w = jnp.where(
            inlier_mask & valid & res.depth_ok, w_huber * inv_sigma2, 0.0
        )
        # H = sum w Jc^T Jc ; b = -sum w Jc^T r   (3-dof residual rows)
        JT = jnp.swapaxes(res.Jc, -1, -2)  # [O, 6, 3]
        H = jnp.einsum("oij,ojk->ik", JT * w[:, None, None], res.Jc)
        b = -jnp.einsum("oij,oj->i", JT * w[:, None, None], res.r)
        H = H + damping * jnp.eye(6, dtype=H.dtype) * (1.0 + jnp.diag(H))
        dx = jnp.linalg.solve(H, b)
        # guard: keep pose unchanged if the solve went singular
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
        return se3_exp(dx) @ Tcw, res.chi2

    def round_body(ridx, carry):
        Tcw, inlier_mask = carry
        robust = ridx < 2  # reference drops the Huber kernel after round 2

        def iter_body(_, T):
            T, _ = gn_iteration(T, inlier_mask, robust)
            return T

        Tcw = jax.lax.fori_loop(0, iters_per_round, iter_body, Tcw)
        # reclassify using the latest pose
        res = project_residual(cam, Tcw, X, obs, inv_sigma2)
        inlier_mask = (res.chi2 <= chi2_th) & res.depth_ok
        return (Tcw, inlier_mask)

    inlier0 = jnp.ones(X.shape[0], dtype=bool)
    # keep the initial pose on the SE3 manifold (a scaled/skewed input
    # rotation would survive every exp-composed update below)
    Tcw0 = se3_project(Tcw0)
    Tcw, inliers = jax.lax.fori_loop(0, rounds, round_body, (Tcw0, inlier0))
    Tcw = se3_project(Tcw)

    res = project_residual(cam, Tcw, X, obs, inv_sigma2)
    inliers = inliers & valid
    return PoseOptResult(
        Tcw=Tcw,
        inliers=inliers,
        n_inliers=jnp.sum(inliers.astype(jnp.int32)),
        chi2=res.chi2,
    )
