"""Image pyramid + Gaussian blur as static matrix products.

Replaces ORBextractor::ComputePyramid + the GaussianBlur(7x7, sigma=2)
call (reference: src/ORBextractor.cc operator() / ComputePyramid).

TPU-first formulation: single-channel 2D convolutions and resizes do
NOT map onto the MXU (no channel dimension to contract), so XLA lowers
them to slow VPU/gather code. Instead, both bilinear resize and
separable Gaussian blur are expressed as banded matrix products with
precomputed static operators:

    resize:  out = Rh @ img @ Rw^T      (Rh [h2, h1], Rw [w2, w1])
    blur:    out = Bh @ img @ Bw^T      (band matrices, 7-tap rows)

One [H2, H1] x [H1, W1] and one [H2, W1] x [W1, W2] matmul per level —
exactly what the systolic array wants. Operators are built in NumPy at
trace time (shapes are static) and become XLA constants.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def level_shape(h: int, w: int, level: int, scale_factor: float) -> tuple[int, int]:
    """Rounded level size, matching cv::resize semantics used by the
    reference (round, not floor)."""
    inv = 1.0 / (scale_factor**level)
    return (int(round(h * inv)), int(round(w * inv)))


@functools.lru_cache(maxsize=None)
def _resize_operator(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation matrix (align_corners=False,
    cv::INTER_LINEAR convention)."""
    op = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        f = src - i0
        i0c = min(max(i0, 0), n_in - 1)
        i1c = min(max(i0 + 1, 0), n_in - 1)
        op[i, i0c] += 1.0 - f
        op[i, i1c] += f
    return op


@functools.lru_cache(maxsize=None)
def _blur_operator(n: int, sigma: float, ksize: int) -> np.ndarray:
    """[n, n] banded Gaussian operator with edge-replicated taps."""
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()
    op = np.zeros((n, n), np.float32)
    for i in range(n):
        for dj, kv in zip(range(-r, r + 1), k):
            j = min(max(i + dj, 0), n - 1)
            op[i, j] += kv
    return op


def resize_bilinear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize of [H, W] via two MXU matmuls."""
    h1, w1 = img.shape
    h2, w2 = out_hw
    Rh = jnp.asarray(_resize_operator(h1, h2))
    Rw = jnp.asarray(_resize_operator(w1, w2))
    return jax.lax.dot_general(
        jax.lax.dot_general(
            Rh, img, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
        Rw.T,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def gaussian_blur(img: jax.Array, sigma: float = 2.0, ksize: int = 7) -> jax.Array:
    """Separable Gaussian blur via two banded matmuls, [H, W] -> [H, W].

    Matches cv::GaussianBlur(Size(7,7), 2, 2) with replicated borders
    closely enough for descriptor stability."""
    h, w = img.shape
    Bh = jnp.asarray(_blur_operator(h, sigma, ksize))
    Bw = jnp.asarray(_blur_operator(w, sigma, ksize))
    return jax.lax.dot_general(
        jax.lax.dot_general(
            Bh, img, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
        Bw.T,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def build_pyramid(
    img: jax.Array, n_levels: int, scale_factor: float
) -> list[jax.Array]:
    """List of per-level images, level 0 = input. Static shapes per level.

    The reference resizes each level from the previous one
    (ORBextractor::ComputePyramid); chaining matches that and slightly
    low-passes higher levels, which FAST prefers.
    """
    h, w = img.shape
    levels = [img]
    for l in range(1, n_levels):
        prev = levels[-1]
        levels.append(resize_bilinear(prev, level_shape(h, w, l, scale_factor)))
    return levels
