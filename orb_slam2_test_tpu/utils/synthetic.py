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


_PATCH_R = 15  # textured patch half-size; must cover BRIEF's 13-px
# pattern radius so descriptor bits compare texture, not background


def _landmark_patches(n: int, seed: int = 7) -> np.ndarray:
    """[n, 2R+1, 2R+1] deterministic random textured patches.

    Each landmark renders as a distinctive smoothed random texture so
    that BRIEF descriptors are discriminative and orientation is stable
    (pure Gaussian blobs are radially symmetric — unmatchable)."""
    rng = np.random.default_rng(seed)
    size = 2 * _PATCH_R + 1
    pat = rng.uniform(0.0, 255.0, size=(n, size, size)).astype(np.float32)
    # mild smoothing for subpixel stability (3x3 box, applied twice)
    for _ in range(2):
        p = np.pad(pat, ((0, 0), (1, 1), (1, 1)), mode="edge")
        pat = (
            p[:, :-2, :-2] + p[:, :-2, 1:-1] + p[:, :-2, 2:]
            + p[:, 1:-1, :-2] + p[:, 1:-1, 1:-1] + p[:, 1:-1, 2:]
            + p[:, 2:, :-2] + p[:, 2:, 1:-1] + p[:, 2:, 2:]
        ) / 9.0
    # radial window so the patch fades into the background
    yy, xx = np.mgrid[-_PATCH_R : _PATCH_R + 1, -_PATCH_R : _PATCH_R + 1]
    wnd = np.clip(1.3 - np.sqrt(yy**2 + xx**2) / _PATCH_R, 0.0, 1.0)
    return pat * wnd[None]


def render_frame(
    cam: PinholeCamera,
    Tcw: np.ndarray,
    landmarks: np.ndarray,
    intensities: np.ndarray,
    background: float = 16.0,
    patches: np.ndarray | None = None,
) -> np.ndarray:
    """Render landmarks as textured patches -> float32 [H, W] image.

    Patches are placed with bilinear subpixel shift so keypoint
    positions stay consistent across views. Pure NumPy (host-side test
    utility, not part of the device pipeline).
    """
    h, w = cam.height, cam.width
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = landmarks @ R.T + t
    z = pc[:, 2]
    vis = z > 0.1
    u = cam.fx * pc[:, 0] / np.maximum(z, 0.1) + cam.cx
    v = cam.fy * pc[:, 1] / np.maximum(z, 0.1) + cam.cy
    vis &= (u >= -10) & (u < w + 10) & (v >= -10) & (v < h + 10)

    if patches is None:
        patches = _landmark_patches(len(landmarks))
    gain = intensities / 255.0

    img = np.full((h, w), background, dtype=np.float32)
    r = _PATCH_R
    for li in np.nonzero(vis)[0]:
        ui, vi = u[li], v[li]
        iu, iv = int(np.floor(ui)), int(np.floor(vi))
        fu, fv = ui - iu, vi - iv
        # bilinear subpixel placement of the patch
        p = patches[li] * gain[li]
        pp = np.zeros((2 * r + 2, 2 * r + 2), np.float32)
        pp[:-1, :-1] += p * (1 - fv) * (1 - fu)
        pp[:-1, 1:] += p * (1 - fv) * fu
        pp[1:, :-1] += p * fv * (1 - fu)
        pp[1:, 1:] += p * fv * fu
        y0, x0 = iv - r, iu - r
        y1, x1 = y0 + 2 * r + 2, x0 + 2 * r + 2
        sy0, sx0 = max(y0, 0), max(x0, 0)
        sy1, sx1 = min(y1, h), min(x1, w)
        if sy0 >= sy1 or sx0 >= sx1:
            continue
        img[sy0:sy1, sx0:sx1] = np.maximum(
            img[sy0:sy1, sx0:sx1],
            pp[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0],
        )
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
    intensities = rng.uniform(140.0, 255.0, size=(n_landmarks,)).astype(
        np.float32
    )
    patches = _landmark_patches(n_landmarks)
    if step is None:
        step = np.array([0.15, 0.01, 0.0, 0.001, 0.004, 0.001])

    poses = []
    images = []
    for i in range(n_frames):
        xi = jnp.asarray(step * i, dtype=jnp.float32)
        Tcw = np.asarray(se3_exp(xi))
        poses.append(Tcw)
        images.append(
            render_frame(cam, Tcw, landmarks, intensities, patches=patches)
        )
    return cam, np.stack(poses), landmarks, images
