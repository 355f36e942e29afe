"""SE(3) / SO(3) Lie-group operations, batched and jit-friendly.

TPU-native replacement for the reference's mix of cv::Mat pose algebra and
g2o::SE3Quat (reference: src/Converter.cc, Thirdparty/g2o types_six_dof_expmap).
Poses are 4x4 homogeneous float32/float64 matrices T = [[R, t], [0, 1]];
tangent vectors are 6-vectors xi = (upsilon, omega) with translation first,
matching g2o's SE3Quat::exp convention used by ORB-SLAM2's optimizer.

All functions broadcast over leading batch dimensions, contain no Python
control flow on traced values, and are safe under jit/vmap/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(omega: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [omega]_x, batched over leading dims."""
    o0, o1, o2 = omega[..., 0], omega[..., 1], omega[..., 2]
    z = jnp.zeros_like(o0)
    return jnp.stack(
        [
            jnp.stack([z, -o2, o1], axis=-1),
            jnp.stack([o2, z, -o0], axis=-1),
            jnp.stack([-o1, o0, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(omega: jax.Array) -> jax.Array:
    """Rodrigues: omega [..., 3] -> R [..., 3, 3].

    Uses Taylor-safe coefficients so it is exact and differentiable at 0.
    """
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos(t))/t^2 with series fallback near 0.
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    K = hat(omega)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def so3_log(R: jax.Array) -> jax.Array:
    """Inverse Rodrigues: R [..., 3, 3] -> omega [..., 3].

    Via the quaternion: omega = 2 atan2(|v|, w) v/|v|, globally stable
    including theta near pi (pose-graph optimization after a large loop
    correction produces big relative rotations; the naive antisymmetric
    -part formula degenerates there and silently returns ~0).
    """
    q = quat_from_rotmat(R)
    v, w = q[..., :3], q[..., 3]
    # shortest rotation: flip to the w >= 0 hemisphere
    sgn = jnp.where(w < 0.0, -1.0, 1.0)
    v = v * sgn[..., None]
    w = w * sgn
    n = jnp.sqrt(jnp.sum(v * v, axis=-1) + _EPS * _EPS)
    # theta/|v| computed with the eps-padded norm: smooth 2/w limit at 0
    return (2.0 * jnp.arctan2(n, w) / n)[..., None] * v


def _left_jacobian(omega: jax.Array) -> jax.Array:
    """SO(3) left Jacobian J_l(omega), used in se3_exp translation part."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    c = jnp.where(
        theta2 > _EPS,
        (theta - jnp.sin(theta)) / (theta2 * theta),
        1.0 / 6.0 - theta2 / 120.0,
    )
    K = hat(omega)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * KK


def _left_jacobian_inv(omega: jax.Array) -> jax.Array:
    """Inverse SO(3) left Jacobian, used in se3_log."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    half = 0.5 * theta
    # coefficient of K^2: (1/theta^2)(1 - theta sin / (2(1-cos))) with series
    cot = jnp.where(
        theta2 > _EPS,
        (1.0 - half * jnp.cos(half) / (jnp.sin(half) + _EPS)) / (theta2 + _EPS),
        1.0 / 12.0 + theta2 / 720.0,
    )
    K = hat(omega)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye - 0.5 * K + cot[..., None, None] * KK


def se3_exp(xi: jax.Array) -> jax.Array:
    """xi [..., 6] = (upsilon, omega) -> T [..., 4, 4]."""
    upsilon, omega = xi[..., :3], xi[..., 3:]
    R = so3_exp(omega)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian(omega), upsilon)
    return rt_to_mat(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """T [..., 4, 4] -> xi [..., 6] = (upsilon, omega)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    omega = so3_log(R)
    upsilon = jnp.einsum("...ij,...j->...i", _left_jacobian_inv(omega), t)
    return jnp.concatenate([upsilon, omega], axis=-1)


def rt_to_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    """(R [..., 3, 3], t [..., 3]) -> T [..., 4, 4]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def so3_project(R: jax.Array) -> jax.Array:
    """Project a near-rotation onto SO(3) (Gram-Schmidt on columns).

    Iterated pose composition in f32 lets a tiny scale/skew creep into
    R; `se3_inverse`'s transpose-inverse then SQUARES that error, and
    the tracker's constant-velocity feedback (pose -> velocity ->
    predicted pose -> optimized pose) doubles it every frame until the
    motion model collapses. Optimizers must re-project onto the
    manifold after composing updates.
    """
    x = R[..., :, 0]
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = R[..., :, 1]
    y = y - jnp.sum(x * y, axis=-1, keepdims=True) * x
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    z = jnp.cross(x, y)
    return jnp.stack([x, y, z], axis=-1)


def se3_project(T: jax.Array) -> jax.Array:
    """Re-orthonormalize the rotation block of a rigid transform."""
    return rt_to_mat(so3_project(T[..., :3, :3]), T[..., :3, 3])


def se3_inverse(T: jax.Array) -> jax.Array:
    """Inverse of a rigid transform without generic matrix inversion."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def se3_compose(A: jax.Array, B: jax.Array) -> jax.Array:
    """A @ B for homogeneous transforms (broadcasting matmul)."""
    return A @ B


def se3_apply(T: jax.Array, x: jax.Array) -> jax.Array:
    """Apply T [..., 4, 4] to points x [..., 3]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", R, x) + t


def quat_from_rotmat(R: jax.Array) -> jax.Array:
    """R [..., 3, 3] -> unit quaternion [..., 4] as (x, y, z, w).

    TUM trajectory format ordering (reference: System::SaveTrajectoryTUM
    writes tx ty tz qx qy qz qw). Shepperd's branchless-by-select method.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate constructions, pick the numerically best
    qw_w = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    q_w = jnp.stack(
        [(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw_w * qw_w], axis=-1
    ) / (4.0 * qw_w[..., None])

    qx_x = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    q_x = jnp.stack(
        [4.0 * qx_x * qx_x, (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1
    ) / (4.0 * qx_x[..., None])

    qy_y = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    q_y = jnp.stack(
        [(m01 + m10), 4.0 * qy_y * qy_y, (m12 + m21), (m02 - m20)], axis=-1
    ) / (4.0 * qy_y[..., None])

    qz_z = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    q_z = jnp.stack(
        [(m02 + m20), (m12 + m21), 4.0 * qz_z * qz_z, (m10 - m01)], axis=-1
    ) / (4.0 * qz_z[..., None])

    cond_w = tr > 0.0
    cond_x = (m00 >= m11) & (m00 >= m22)
    cond_y = m11 >= m22
    q = jnp.where(
        cond_w[..., None],
        q_w,
        jnp.where(cond_x[..., None], q_x, jnp.where(cond_y[..., None], q_y, q_z)),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotmat_from_quat(q: jax.Array) -> jax.Array:
    """Unit quaternion [..., 4] (x, y, z, w) -> R [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
