"""FAST-9/16 corner detection, fully vectorized over the image.

Replaces the per-cell cv::FAST calls in
ORBextractor::ComputeKeyPointsOctTree (reference: src/ORBextractor.cc).
Instead of running FAST per 30x30 cell with a threshold fallback
(iniThFAST=20 -> minThFAST=7), we compute dense response maps at the low
threshold once and record which pixels also pass the high threshold; the
keypoint selector then prefers high-threshold corners — the same
behavioral contract with one dense vectorized pass (ideal for VPU).

The segment test: a pixel is a corner if >= 9 contiguous pixels of the
16-pixel Bresenham circle are all brighter than center + t or all darker
than center - t. Contiguity is evaluated with a bit trick on a packed
16-bit mask — O(1) per pixel, no loops over arc start positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 as (dy, dx), clockwise from 12 o'clock —
# the standard FAST-16 ring.
CIRCLE_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

ARC_LENGTH = 9  # FAST-9: minimum contiguous run


def _ring_diffs(img: jax.Array) -> jax.Array:
    """[16, H, W] — neighbor minus center for each ring position.

    Uses jnp.roll; the 3-px border ring wraps around but border pixels
    are masked out by the caller (keypoints must be >= edge margin from
    the border anyway).
    """
    diffs = []
    for dy, dx in CIRCLE_OFFSETS:
        diffs.append(jnp.roll(img, (-dy, -dx), axis=(0, 1)) - img)
    return jnp.stack(diffs, axis=0)


def _contiguous_mask(bits: jax.Array) -> jax.Array:
    """bits [H, W] int32 with 16 flag bits -> bool: any run >= ARC_LENGTH
    (circular). Doubles the mask and ANDs 9 shifted copies."""
    doubled = bits | (bits << 16)
    m = doubled
    for k in range(1, ARC_LENGTH):
        m = m & (doubled >> k)
    return (m & 0xFFFF) != 0


@functools.partial(jax.jit, static_argnames=())
def fast_response(
    img: jax.Array, threshold: float
) -> tuple[jax.Array, jax.Array]:
    """Dense FAST-9/16 pass.

    Returns (is_corner [H, W] bool, score [H, W] float32). Score is the
    sum of |diff| - t over ring pixels exceeding the threshold on the
    dominant side — monotone in corner strength, used only for NMS and
    ranking (the reference's octree keeps per-cell maxima the same way).
    """
    d = _ring_diffs(img)  # [16, H, W]
    bright = d > threshold
    dark = d < -threshold

    weight = 1 << jnp.arange(16, dtype=jnp.int32)
    bright_bits = jnp.tensordot(
        bright.astype(jnp.int32), weight, axes=((0,), (0,))
    )
    dark_bits = jnp.tensordot(dark.astype(jnp.int32), weight, axes=((0,), (0,)))

    is_corner = _contiguous_mask(bright_bits) | _contiguous_mask(dark_bits)

    bright_score = jnp.sum(jnp.where(bright, d - threshold, 0.0), axis=0)
    dark_score = jnp.sum(jnp.where(dark, -d - threshold, 0.0), axis=0)
    score = jnp.maximum(bright_score, dark_score)
    return is_corner, jnp.where(is_corner, score, 0.0)


def nms_3x3(score: jax.Array) -> jax.Array:
    """3x3 non-maximum suppression; keeps a pixel's score iff it is the
    strict-or-first maximum of its neighborhood."""
    neigh_max = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= neigh_max, score, 0.0)


def border_mask(h: int, w: int, margin: int) -> jax.Array:
    """[H, W] bool — True inside the valid region (>= margin from edges).

    The reference uses EDGE_THRESHOLD=19 so orientation (31-patch) and
    rotated BRIEF sampling stay in bounds."""
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    return (
        (ys >= margin) & (ys < h - margin) & (xs >= margin) & (xs < w - margin)
    )
