"""Image pyramid + Gaussian blur (plain XLA — convs fuse well already).

Replaces ORBextractor::ComputePyramid + the GaussianBlur(7x7, sigma=2)
call before descriptor sampling (reference: src/ORBextractor.cc
operator() / ComputePyramid). Images are float32 [H, W] grayscale in
[0, 255]; all shapes static at trace time.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def level_shape(h: int, w: int, level: int, scale_factor: float) -> tuple[int, int]:
    """Rounded level size, matching cv::resize semantics used by the
    reference (round, not floor)."""
    inv = 1.0 / (scale_factor**level)
    return (int(round(h * inv)), int(round(w * inv)))


def resize_bilinear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize of [H, W] image (cv::INTER_LINEAR equivalent)."""
    return jax.image.resize(img, out_hw, method="linear")


@functools.partial(jax.jit, static_argnames=("ksize",))
def gaussian_blur(img: jax.Array, sigma: float = 2.0, ksize: int = 7) -> jax.Array:
    """Separable Gaussian blur with border replication, [H, W] -> [H, W].

    Matches cv::GaussianBlur(image, image, Size(7,7), 2, 2,
    BORDER_REFLECT_101) in ORBextractor::operator() closely enough for
    descriptor stability (exact border mode differences only affect the
    outer 3 px, which are outside the keypoint edge margin).
    """
    r = ksize // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)

    pad = jnp.pad(img, ((r, r), (r, r)), mode="edge")
    # horizontal then vertical 1D convs via conv_general_dilated
    p = pad[None, None, :, :]  # NCHW
    kh = k.reshape(1, 1, 1, ksize)
    kv = k.reshape(1, 1, ksize, 1)
    out = jax.lax.conv_general_dilated(p, kh, (1, 1), "VALID")
    out = jax.lax.conv_general_dilated(out, kv, (1, 1), "VALID")
    return out[0, 0]


def build_pyramid(
    img: jax.Array, n_levels: int, scale_factor: float
) -> list[jax.Array]:
    """List of per-level images, level 0 = input. Static shapes per level.

    The reference resizes each level from the previous one
    (ORBextractor::ComputePyramid); repeated bilinear from the previous
    level matches that chain and slightly low-passes higher levels,
    which FAST prefers.
    """
    h, w = img.shape
    levels = [img]
    for l in range(1, n_levels):
        prev = levels[-1]
        levels.append(resize_bilinear(prev, level_shape(h, w, l, scale_factor)))
    return levels
