"""Motion-only BA as ONE Pallas TPU kernel.

The XLA version (solvers/pose_opt.py) runs the reference's 4x10
Levenberg/GN schedule as 40 dependent steps of ~10 small fused ops
each; on a TPU that is pure dispatch latency (~2.2 ms for 1000
observations — the compute is ~0.25 MFLOP/iter). This kernel keeps the
whole schedule on-chip: observations live in VMEM as [R, 128] planes,
each iteration is ~30 vector ops + 27 plane reductions, the 6x6
normal-equation solve and the SE3 exponential run unrolled on scalars.

Semantics mirror Optimizer::PoseOptimization (reference
src/Optimizer.cc:~240) exactly as pose_opt.pose_optimization does:
Huber weights for the first 2 rounds, chi2 reclassification between
rounds (5.991 mono / 7.815 stereo), outliers re-tested every round.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from orb_slam2_test_tpu.utils.precision import f32_matmuls
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.geometry.robust import (
    CHI2_MONO,
    CHI2_STEREO,
    HUBER_MONO,
    HUBER_STEREO,
)

LANES = 128


def _chol6_solve(H, rhs):
    """Unrolled scalar Cholesky solve of a 6x6 SPD system.

    H: tuple-of-tuples of scalars (symmetric, only [i][j] with j<=i
    used); rhs: tuple of 6 scalars. Returns tuple of 6 scalars."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = H[i][j] if i >= j else H[j][i]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    # forward: L y = rhs
    y = [None] * 6
    for i in range(6):
        s = rhs[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # backward: L^T x = y
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return tuple(x)


def _se3_exp_scalars(dx):
    """exp of xi=(upsilon, omega) as scalar tuples: returns (Re 3x3
    nested tuple, te 3-tuple). Small-angle-safe closed form."""
    ux, uy, uz, wx, wy, wz = dx
    th2 = wx * wx + wy * wy + wz * wz
    th = jnp.sqrt(th2)
    small = th2 < 1e-12
    th_safe = jnp.where(small, 1.0, th)
    # A = sin(th)/th, B = (1-cos th)/th^2, C = (th - sin th)/th^3
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th_safe) / th_safe)
    B = jnp.where(
        small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th_safe)) / (th_safe * th_safe)
    )
    C = jnp.where(
        small,
        1.0 / 6.0 - th2 / 120.0,
        (th_safe - jnp.sin(th_safe)) / (th_safe * th_safe * th_safe),
    )
    # [w]x and [w]x^2 entries
    W = ((0.0, -wz, wy), (wz, 0.0, -wx), (-wy, wx, 0.0))
    W2 = [[0.0] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            W2[i][j] = sum(W[i][k] * W[k][j] for k in range(3))
    Re = [[0.0] * 3 for _ in range(3)]
    V = [[0.0] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            eye = 1.0 if i == j else 0.0
            Re[i][j] = eye + A * W[i][j] + B * W2[i][j]
            V[i][j] = eye + B * W[i][j] + C * W2[i][j]
    u = (ux, uy, uz)
    te = tuple(sum(V[i][k] * u[k] for k in range(3)) for i in range(3))
    return Re, te


def _make_kernel(cam: PinholeCamera, rounds: int, iters_per_round: int,
                 damping: float):
    fx, fy, cx, cy, bf = cam.fx, cam.fy, cam.cx, cam.cy, cam.bf

    def kernel(T_ref, data_ref, T_out, inl_out, chi2_out):
        # data planes: 0 Xx, 1 Xy, 2 Xz, 3 ou, 4 ov, 5 our, 6 isig, 7 valid
        Xx = data_ref[0]
        Xy = data_ref[1]
        Xz = data_ref[2]
        ou = data_ref[3]
        ov = data_ref[4]
        our = data_ref[5]
        isig = data_ref[6]
        valid = data_ref[7]
        stereo = (our >= 0.0).astype(jnp.float32)
        chi2_th = jnp.where(stereo > 0, CHI2_STEREO, CHI2_MONO)
        delta = jnp.where(stereo > 0, HUBER_STEREO, HUBER_MONO)

        def residual_planes(P):
            """P = 12 pose scalars (r00..r22, t0..t2) -> per-obs planes."""
            (r00, r01, r02, r10, r11, r12, r20, r21, r22, t0, t1, t2) = P
            x = r00 * Xx + r01 * Xy + r02 * Xz + t0
            y = r10 * Xx + r11 * Xy + r12 * Xz + t1
            z = r20 * Xx + r21 * Xy + r22 * Xz + t2
            z_ok = z > 0.0
            z_safe = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
            iz = 1.0 / z_safe
            iz2 = iz * iz
            u = fx * x * iz + cx
            v = fy * y * iz + cy
            ur = u - bf * iz
            ru = ou - u
            rv = ov - v
            rur = stereo * (our - ur)
            chi2 = (ru * ru + rv * rv + rur * rur) * isig
            return x, y, z, iz, iz2, z_ok, ru, rv, rur, chi2

        def gn_step(P, inl, robust):
            x, y, z, iz, iz2, z_ok, ru, rv, rur, chi2 = residual_planes(P)
            rnorm = jnp.sqrt(jnp.maximum(chi2, 1e-20))
            w_h = jnp.where(robust & (rnorm > delta), delta / rnorm, 1.0)
            w = inl * valid * z_ok.astype(jnp.float32) * w_h * isig

            # Jacobian rows (see solvers/reprojection.py project_residual)
            xiz2 = x * iz2
            yiz2 = y * iz2
            a = (
                -fx * iz,
                jnp.zeros_like(x),
                fx * xiz2,
                fx * x * y * iz2,
                -fx * (1.0 + x * x * iz2),
                fx * y * iz,
            )
            b = (
                jnp.zeros_like(x),
                -fy * iz,
                fy * yiz2,
                fy * (1.0 + y * y * iz2),
                -fy * x * y * iz2,
                -fy * x * iz,
            )
            # stereo row: dur = du + [0, 0, bf iz2]; with e = [0,0,bf iz2],
            # J_extra = [-e, e @ [pc]x] = [0, 0, -bf iz2, -bf y iz2,
            # bf x iz2, 0]
            e3 = -bf * iz2
            e4 = -bf * y * iz2
            e5 = bf * x * iz2
            c = tuple(
                stereo * (ai + ei)
                for ai, ei in zip(
                    a,
                    (
                        jnp.zeros_like(x),
                        jnp.zeros_like(x),
                        e3,
                        e4,
                        e5,
                        jnp.zeros_like(x),
                    ),
                )
            )

            H = [[None] * 6 for _ in range(6)]
            for i in range(6):
                for j in range(i + 1):
                    H[i][j] = jnp.sum(
                        w * (a[i] * a[j] + b[i] * b[j] + c[i] * c[j])
                    )
            g = [
                jnp.sum(w * (a[i] * ru + b[i] * rv + c[i] * rur))
                for i in range(6)
            ]
            # b = -J^T W r; residual uses r = obs - proj and J as above
            g = [-gi for gi in g]
            for i in range(6):
                H[i][i] = H[i][i] + damping * (1.0 + H[i][i])
            dx = _chol6_solve(H, g)
            finite = jnp.isfinite(dx[0])
            for i in range(1, 6):
                finite = finite & jnp.isfinite(dx[i])
            dx = tuple(jnp.where(finite, d, 0.0) for d in dx)
            Re, te = _se3_exp_scalars(dx)
            (r00, r01, r02, r10, r11, r12, r20, r21, r22, t0, t1, t2) = P
            Rm = ((r00, r01, r02), (r10, r11, r12), (r20, r21, r22))
            newR = [
                [
                    sum(Re[i][k] * Rm[k][j] for k in range(3))
                    for j in range(3)
                ]
                for i in range(3)
            ]
            tm = (t0, t1, t2)
            newt = [
                sum(Re[i][k] * tm[k] for k in range(3)) + te[i]
                for i in range(3)
            ]
            return (
                newR[0][0], newR[0][1], newR[0][2],
                newR[1][0], newR[1][1], newR[1][2],
                newR[2][0], newR[2][1], newR[2][2],
                newt[0], newt[1], newt[2],
            )

        P0 = tuple(T_ref[i] for i in
                   (0, 1, 2, 4, 5, 6, 8, 9, 10, 3, 7, 11))
        inl0 = jnp.ones_like(Xx)

        n_iters = rounds * iters_per_round

        def body(it, carry):
            P = carry[:12]
            inl = carry[12]
            robust = it < 2 * iters_per_round
            P = gn_step(P, inl, robust)
            # reclassify at round boundaries using the fresh pose
            _, _, _, _, _, z_ok, _, _, _, chi2 = residual_planes(P)
            new_inl = ((chi2 <= chi2_th) & z_ok).astype(jnp.float32)
            boundary = (it + 1) % iters_per_round == 0
            inl = jnp.where(boundary, new_inl, inl)
            return P + (inl,)

        out = jax.lax.fori_loop(0, n_iters, body, P0 + (inl0,))
        P = out[:12]
        inl = out[12]

        # final classification with the final pose
        _, _, _, _, _, z_ok, _, _, _, chi2 = residual_planes(P)
        inl_out[...] = inl
        chi2_out[...] = chi2
        # pose back to row-major [16] SMEM
        (r00, r01, r02, r10, r11, r12, r20, r21, r22, t0, t1, t2) = P
        vals = (r00, r01, r02, t0, r10, r11, r12, t1,
                r20, r21, r22, t2, 0.0, 0.0, 0.0, 1.0)
        for k in range(16):
            T_out[k] = vals[k]

    return kernel


@f32_matmuls
@functools.partial(
    jax.jit, static_argnames=("cam", "rounds", "iters_per_round", "damping")
)
def pose_optimization_tpu(
    cam: PinholeCamera,
    Tcw0: jax.Array,
    X: jax.Array,
    obs: jax.Array,
    inv_sigma2: jax.Array,
    valid: jax.Array,
    rounds: int = 4,
    iters_per_round: int = 10,
    damping: float = 1e-3,
):
    """Pallas-kernel pose optimization. Returns (Tcw, inliers, chi2)
    with the same semantics as pose_opt.pose_optimization."""
    O = X.shape[0]
    OP = -(-O // LANES) * LANES
    R = OP // LANES

    def plane(v, fill=0.0):
        out = jnp.full((OP,), fill, jnp.float32)
        return out.at[:O].set(v.astype(jnp.float32)).reshape(R, LANES)

    data = jnp.stack(
        [
            plane(X[:, 0]), plane(X[:, 1]), plane(X[:, 2]),
            plane(obs[:, 0]), plane(obs[:, 1]),
            plane(obs[:, 2], fill=-1.0),
            plane(inv_sigma2), plane(valid),
        ]
    )
    from orb_slam2_test_tpu.geometry.se3 import se3_project

    T_flat = se3_project(jnp.asarray(Tcw0, jnp.float32)).reshape(16)

    kern = _make_kernel(cam, rounds, iters_per_round, damping)
    T_out, inl, chi2 = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16,), jnp.float32),
            jax.ShapeDtypeStruct((R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(T_flat, data)

    Tcw = se3_project(T_out.reshape(4, 4))
    inliers = inl.reshape(OP)[:O] > 0.5
    chi2 = chi2.reshape(OP)[:O]
    return Tcw, inliers, chi2
