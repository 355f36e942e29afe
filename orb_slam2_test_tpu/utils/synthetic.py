"""Synthetic scene/image generation for tests and benchmarks.

The reference has no test suite; its de-facto tests are TUM/KITTI/EuRoC
dataset runs (SURVEY.md section 4). Those datasets are not available in
this sandbox, so we build the test pyramid on synthetic scenes with
exact ground truth: random 3D landmarks rendered as smooth blobs,
viewed from known camera trajectories.
"""

from __future__ import annotations

import numpy as np

from orb_slam2_test_tpu.geometry.camera import PinholeCamera


def default_camera(width: int = 320, height: int = 240) -> PinholeCamera:
    return PinholeCamera(
        fx=0.8 * width,
        fy=0.8 * width,
        cx=width / 2.0,
        cy=height / 2.0,
        width=width,
        height=height,
    )


def make_landmarks(
    rng: np.random.Generator,
    n: int = 400,
    depth_range: tuple[float, float] = (4.0, 10.0),
    spread: float = 6.0,
) -> np.ndarray:
    """Random 3D landmarks in front of the origin (z in depth_range)."""
    xy = rng.uniform(-spread, spread, size=(n, 2))
    z = rng.uniform(*depth_range, size=(n, 1))
    return np.concatenate([xy, z], axis=1).astype(np.float32)


def render_frame(
    cam: PinholeCamera,
    Tcw: np.ndarray,
    landmarks: np.ndarray,
    intensities: np.ndarray,
    blob_sigma: float = 1.6,
    background: float = 16.0,
) -> np.ndarray:
    """Render landmarks as Gaussian blobs -> float32 [H, W] image.

    Each landmark has a distinctive intensity so that local patches are
    discriminative enough for BRIEF matching across views. Pure NumPy
    (host-side test utility, not part of the device pipeline).
    """
    h, w = cam.height, cam.width
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = landmarks @ R.T + t
    z = pc[:, 2]
    vis = z > 0.1
    u = cam.fx * pc[:, 0] / np.maximum(z, 0.1) + cam.cx
    v = cam.fy * pc[:, 1] / np.maximum(z, 0.1) + cam.cy
    vis &= (u >= -10) & (u < w + 10) & (v >= -10) & (v < h + 10)

    img = np.full((h, w), background, dtype=np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    r = int(np.ceil(blob_sigma * 4))
    for ui, vi, ii in zip(u[vis], v[vis], intensities[vis]):
        x0, x1 = int(ui) - r, int(ui) + r + 1
        y0, y1 = int(vi) - r, int(vi) + r + 1
        x0c, x1c = max(x0, 0), min(x1, w)
        y0c, y1c = max(y0, 0), min(y1, h)
        if x0c >= x1c or y0c >= y1c:
            continue
        gy = ys[y0c:y1c, x0c:x1c] - vi
        gx = xs[y0c:y1c, x0c:x1c] - ui
        blob = ii * np.exp(-(gx**2 + gy**2) / (2 * blob_sigma**2))
        img[y0c:y1c, x0c:x1c] = np.maximum(img[y0c:y1c, x0c:x1c], blob)
    return np.clip(img, 0.0, 255.0)


def make_sequence(
    rng: np.random.Generator,
    n_frames: int,
    cam: PinholeCamera | None = None,
    n_landmarks: int = 400,
    step: np.ndarray | None = None,
):
    """A simple lateral-translation trajectory with small rotations.

    Returns (cam, poses [n, 4, 4] Tcw, landmarks [m, 3], images list).
    """
    from orb_slam2_test_tpu.geometry.se3 import se3_exp
    import jax.numpy as jnp

    cam = cam or default_camera()
    landmarks = make_landmarks(rng, n_landmarks)
    intensities = rng.uniform(120.0, 255.0, size=(n_landmarks,)).astype(
        np.float32
    )
    if step is None:
        step = np.array([0.15, 0.01, 0.0, 0.001, 0.004, 0.001])

    poses = []
    images = []
    for i in range(n_frames):
        xi = jnp.asarray(step * i, dtype=jnp.float32)
        Tcw = np.asarray(se3_exp(xi))
        poses.append(Tcw)
        images.append(render_frame(cam, Tcw, landmarks, intensities))
    return cam, np.stack(poses), landmarks, images
