"""Reprojection residuals + analytic Jacobians for SE3 BA edges.

The building blocks of every optimizer in the system — the JAX
equivalent of g2o's EdgeSE3ProjectXYZ / EdgeStereoSE3ProjectXYZ /
EdgeSE3ProjectXYZOnlyPose types (reference:
Thirdparty/g2o/g2o/types/types_six_dof_expmap.cpp, used throughout
src/Optimizer.cc).

Conventions:
- Pose update is LEFT-multiplicative in camera frame: T <- exp(xi) T,
  xi = (upsilon, omega) — matching g2o's SE3Quat::exp oplus.
- Residual r = observation - projection, so the GN step solves
  (J^T W J) dx = J^T W r and applies T <- exp(dx) T.
- Observations are 3-vectors (u, v, u_r); monocular edges carry
  u_r < 0 and a [2-dof] mask. This lets mono and stereo edges live in
  the same batched arrays (reference keeps separate edge types).

All functions are batched over leading dims and jit/vmap-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.geometry.se3 import se3_apply


class Residuals(NamedTuple):
    r: jax.Array  # [..., 3] residual (third component 0 for mono)
    chi2: jax.Array  # [...] weighted squared error r^T Omega r
    Jc: jax.Array  # [..., 3, 6] d r / d camera-update xi
    Jp: jax.Array  # [..., 3, 3] d r / d point position (world)
    depth_ok: jax.Array  # [...] positive-depth mask


def project_residual(
    cam: PinholeCamera,
    Tcw: jax.Array,  # [..., 4, 4]
    X: jax.Array,  # [..., 3] world points
    obs: jax.Array,  # [..., 3] (u, v, u_r); u_r < 0 => monocular
    inv_sigma2: jax.Array,  # [...] information scale (1/sigma^2 of level)
) -> Residuals:
    """Residual + Jacobians for one (pose, point, observation) triple."""
    pc = se3_apply(Tcw, X)
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z

    is_stereo = obs[..., 2] >= 0.0
    r = jnp.stack(
        [
            obs[..., 0] - u,
            obs[..., 1] - v,
            jnp.where(is_stereo, obs[..., 2] - ur, 0.0),
        ],
        axis=-1,
    )

    # d(proj)/d(pc): rows for u, v, ur
    zero = jnp.zeros_like(x)
    du = jnp.stack([cam.fx * inv_z, zero, -cam.fx * x * inv_z2], axis=-1)
    dv = jnp.stack([zero, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    dur = du + jnp.stack([zero, zero, cam.bf * inv_z2], axis=-1)
    dur = jnp.where(is_stereo[..., None], dur, 0.0)
    dproj = jnp.stack([du, dv, dur], axis=-2)  # [..., 3, 3]

    # d(pc)/d(xi) for left update exp(xi) T: [I | -[pc]_x]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    px = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    dpc_dxi = jnp.concatenate([eye, -px], axis=-1)  # [..., 3, 6]

    # residual = obs - proj => J = -dproj @ (...). The 3x6 / 3x3 block
    # products are written as broadcast-multiply-sums, NOT @ / einsum:
    # batched tiny matmuls lower to MXU dot_generals, which under the
    # float32 precision the solvers require run 3-6 hardware passes and
    # pad 3-wide operands to full tiles — measured ~6 ms per BA
    # linearization at [8192, 24] grid shapes vs sub-ms for the
    # elementwise VPU form (which is also exact f32, no bf16 passes).
    Jc = -jnp.sum(
        dproj[..., :, :, None] * dpc_dxi[..., None, :, :], axis=-2
    )  # [..., 3, 6]
    R = Tcw[..., :3, :3]
    Jp = -jnp.sum(
        dproj[..., :, :, None] * R[..., None, :, :], axis=-2
    )  # [..., 3, 3], d pc/d X_world = R

    chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
    return Residuals(r=r, chi2=chi2, Jc=Jc, Jp=Jp, depth_ok=z > 0.0)
