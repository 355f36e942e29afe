"""Camera models: pinhole projection with radial-tangential distortion,
stereo (virtual right) projection, undistortion.

Mirrors the reference's camera handling (reference: src/Frame.cc
UndistortKeyPoints / UnprojectStereo; src/Tracking.cc builds K and
mDistCoef from YAML) but vectorized: every function maps over arrays of
points with no per-point loops.

Conventions (same as ORB-SLAM2):
  - Tcw maps world -> camera; x_cam = R x_w + t.
  - Pixel coords (u, v); u along width/x, v along height/y.
  - Stereo: u_right = u - bf / depth, bf = baseline * fx (YAML `Camera.bf`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    """Static camera intrinsics. Kept as a NamedTuple so it is a pytree
    and can be closed over or passed through jit without hashing issues."""

    fx: float
    fy: float
    cx: float
    cy: float
    # distortion: k1, k2, p1, p2, k3 (OpenCV ordering, as in the YAML files)
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    bf: float = 0.0  # baseline * fx, 0 for pure monocular
    width: int = 640
    height: int = 480

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def has_distortion(self) -> bool:
        return any(
            abs(float(d)) > 0.0
            for d in (self.k1, self.k2, self.p1, self.p2, self.k3)
        )

    @property
    def baseline(self) -> float:
        return self.bf / self.fx if self.bf else 0.0


def project(cam: PinholeCamera, x_cam: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Camera-frame points [..., 3] -> (uv [..., 2], depth [...]).

    No distortion: the SLAM pipeline operates on undistorted keypoints
    (reference undistorts once at Frame construction and all projection
    matching / BA uses the pinhole model on undistorted coords).
    """
    z = x_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = cam.fx * x_cam[..., 0] * inv_z + cam.cx
    v = cam.fy * x_cam[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1), z


def project_stereo(
    cam: PinholeCamera, x_cam: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Camera-frame points [..., 3] -> (uvr [..., 3] = (u, v, u_right), depth).

    u_right = u - bf/z (reference: Frame::UnprojectStereo inverse;
    Optimizer stereo edges use the 3-vector (u, v, u_r) observation).
    """
    uv, z = project(cam, x_cam)
    inv_z = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    ur = uv[..., 0] - cam.bf * inv_z
    return jnp.concatenate([uv, ur[..., None]], axis=-1), z


def backproject(cam: PinholeCamera, uv: jax.Array, depth: jax.Array) -> jax.Array:
    """Undistorted pixels [..., 2] + depth [...] -> camera-frame [..., 3].

    (reference: Frame::UnprojectStereo)
    """
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def distort_normalized(cam: PinholeCamera, xy: jax.Array) -> jax.Array:
    """Apply radial-tangential distortion to normalized coords [..., 2]."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xy_ = x * y
    x_d = x * radial + 2.0 * cam.p1 * xy_ + cam.p2 * (r2 + 2.0 * x * x)
    y_d = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * xy_
    return jnp.stack([x_d, y_d], axis=-1)


def distort_points(cam: PinholeCamera, uv: jax.Array) -> jax.Array:
    """Undistorted pixels [..., 2] -> distorted (raw) pixels [..., 2]."""
    xy = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    xy_d = distort_normalized(cam, xy)
    return jnp.stack(
        [xy_d[..., 0] * cam.fx + cam.cx, xy_d[..., 1] * cam.fy + cam.cy], axis=-1
    )


def undistort_points(
    cam: PinholeCamera, uv: jax.Array, num_iters: int = 5
) -> jax.Array:
    """Distorted (raw) pixels [..., 2] -> undistorted pixels [..., 2].

    Fixed-point iteration identical in spirit to cv::undistortPoints
    (which the reference calls in Frame::UndistortKeyPoints). num_iters=5
    matches OpenCV's default termination for typical distortion levels.
    Fixed iteration count keeps the computation jit-static.
    """
    x_dist = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    x = x_dist

    def body(_, x):
        xx, yy = x[..., 0], x[..., 1]
        r2 = xx * xx + yy * yy
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        dx = 2.0 * cam.p1 * xx * yy + cam.p2 * (r2 + 2.0 * xx * xx)
        dy = cam.p1 * (r2 + 2.0 * yy * yy) + 2.0 * cam.p2 * xx * yy
        un = (x_dist - jnp.stack([dx, dy], axis=-1)) / radial[..., None]
        return un

    x = jax.lax.fori_loop(0, num_iters, body, x)
    return jnp.stack(
        [x[..., 0] * cam.fx + cam.cx, x[..., 1] * cam.fy + cam.cy], axis=-1
    )
