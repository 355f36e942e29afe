"""Oriented BRIEF descriptors + intensity-centroid orientation.

Replaces IC_Angle and computeOrbDescriptor (reference:
src/ORBextractor.cc). Two TPU-first design choices:

1. Orientation via *convolution*, not per-keypoint patch gathers: the
   circular-patch image moments m10/m01 are depthwise convolutions of
   the image with fixed 31x31 coordinate kernels — one MXU-friendly pass
   over the whole level instead of N x 961 random gathers; the angle map
   is then sampled at the (few) keypoint locations.
2. The 256-pair sampling pattern is *generated* (seeded Gaussian pairs,
   classic BRIEF construction) rather than copied from the reference's
   learned bit_pattern_31_ table. Descriptors are self-consistent within
   this framework (matching, BoW vocabulary, loop closure all use our
   pattern); cross-compatibility with OpenCV descriptors is a non-goal.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

PATCH_RADIUS = 15  # 31x31 patch, as reference HALF_PATCH_SIZE
PATTERN_RADIUS = 13  # sampling points stay in-patch under any rotation
N_BITS = 256
EDGE_MARGIN = 19  # reference EDGE_THRESHOLD


@functools.lru_cache()
def brief_pattern() -> np.ndarray:
    """[256, 2, 2] int32 — (point a, point b) as (dx, dy) offsets.

    Seeded Gaussian pairs (sigma = patch/5, the BRIEF paper's G-II
    construction), rejection-clipped to radius PATTERN_RADIUS.
    Deterministic: same pattern every process, ever.
    """
    rng = np.random.default_rng(31)
    pts = []
    while len(pts) < N_BITS * 2:
        cand = rng.normal(0.0, 31.0 / 5.0, size=(N_BITS * 4, 2))
        cand = np.round(cand).astype(np.int32)
        r2 = (cand**2).sum(axis=1)
        cand = cand[r2 <= PATTERN_RADIUS**2]
        pts.extend(cand.tolist())
    pts = np.asarray(pts[: N_BITS * 2], dtype=np.int32)
    return pts.reshape(N_BITS, 2, 2)


@functools.lru_cache()
def _moment_kernels() -> tuple[np.ndarray, np.ndarray]:
    """31x31 kernels for m10 (x-moment) and m01 (y-moment) over the
    circular patch — reference IC_Angle's umax circular mask."""
    r = PATCH_RADIUS
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (xs**2 + ys**2) <= r * r
    k10 = (xs * mask).astype(np.float32)
    k01 = (ys * mask).astype(np.float32)
    return k10, k01


def orientation_maps(img: jax.Array) -> jax.Array:
    """[H, W] angle map (radians): atan2(m01, m10) of the 31x31 circular
    patch centered at each pixel. Border handling: zero padding — only
    sampled at keypoints >= EDGE_MARGIN from the border."""
    k10, k01 = _moment_kernels()
    k = jnp.stack(
        [jnp.asarray(k10), jnp.asarray(k01)], axis=0
    )  # [2, 31, 31]
    p = img[None, None, :, :]
    out = jax.lax.conv_general_dilated(
        p, k[:, None, :, :], (1, 1), "SAME"
    )  # [1, 2, H, W]
    m10, m01 = out[0, 0], out[0, 1]
    return jnp.arctan2(m01, m10)


def compute_descriptors(
    blurred: jax.Array,  # [H, W] Gaussian-blurred level image
    xy: jax.Array,  # [N, 2] float (x, y) keypoint coords in level pixels
    angle: jax.Array,  # [N] radians
) -> jax.Array:
    """[N, 8] uint32 — rotated-BRIEF descriptors, 256 bits packed.

    bit k = 1 iff I(p + R(theta) a_k) < I(p + R(theta) b_k), with
    nearest-pixel sampling (reference computeOrbDescriptor uses the same
    rounded rotated-pattern lookup).
    """
    h, w = blurred.shape
    pat = jnp.asarray(brief_pattern(), dtype=jnp.float32)  # [256, 2, 2] (dx, dy)

    c, s = jnp.cos(angle), jnp.sin(angle)  # [N]
    # rotate pattern: for each kp, p' = (c*dx - s*dy, s*dx + c*dy)
    dx = pat[..., 0][None]  # [1, 256, 2]
    dy = pat[..., 1][None]
    rx = c[:, None, None] * dx - s[:, None, None] * dy  # [N, 256, 2]
    ry = s[:, None, None] * dx + c[:, None, None] * dy

    px = jnp.round(xy[:, 0][:, None, None] + rx).astype(jnp.int32)
    py = jnp.round(xy[:, 1][:, None, None] + ry).astype(jnp.int32)
    px = jnp.clip(px, 0, w - 1)
    py = jnp.clip(py, 0, h - 1)

    vals = blurred[py, px]  # [N, 256, 2] gather
    bits = vals[..., 0] < vals[..., 1]  # [N, 256]
    return pack_bits(bits)


def pack_bits(bits: jax.Array) -> jax.Array:
    """[..., 256] bool -> [..., 8] uint32 (little-endian within words)."""
    shape = bits.shape[:-1]
    b = bits.reshape(shape + (8, 32)).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)


def unpack_bits(words: jax.Array) -> jax.Array:
    """[..., 8] uint32 -> [..., 256] bool."""
    shape = words.shape[:-1]
    w = words[..., :, None]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (w >> shifts) & jnp.uint32(1)
    return bits.reshape(shape + (256,)).astype(bool)
