"""Per-keypoint patch pipeline: Pallas gather + MXU matmul stages.

Replaces the three slowest stages of ORB extraction (reference:
src/ORBextractor.cc operator() — GaussianBlur, IC_Angle,
computeOrbDescriptor) with a TPU-native formulation:

1. `extract_raw_patches` — ONE Pallas kernel gathers a 38x38 raw patch
   per keypoint out of the level image held in VMEM (XLA's
   vmap(dynamic_slice) lowering costs ~0.9 ms for 217 keypoints; the
   kernel's dynamic-offset VMEM copies are ~20x cheaper). 38 = 32-px
   descriptor core + 2*3 blur margin; with EDGE_MARGIN=19 keypoints
   the slice never clips, so patch center is exact.
2. Orientation: circular-mask image moments as one [N, 1444] x
   [1444, 2] matmul (IC_Angle).
3. Blur: the 7-tap sigma-2 Gaussian applied IN PATCH SPACE as two
   banded matmuls [32, 38] — the 3-px margin makes this bit-identical
   to blurring the whole level image (no border effects reach the
   core), and skips blurring the ~97% of pixels that no descriptor
   samples.
4. Descriptors: all 30 rotation bins' BRIEF taps as one signed
   selection matrix D [1024, 30*256] (+1 at point a, -1 at point b),
   so the 512-tap random gather per keypoint becomes one MXU matmul
   `blurred_patches @ D`; each keypoint then keeps its own bin's 256
   columns. Patches are mean-centered first so the bf16 MXU pass only
   sees small-magnitude values (sign decisions stay stable).

The Pallas kernel needs a TPU; other backends (the CPU test mesh) use
an XLA fallback with identical semantics.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam2_test_tpu.ops.brief import (
    N_ANGLE_BINS,
    N_BITS,
    PATCH,
    PATCH_RADIUS,
    _binned_pattern_indices,
    pack_bits,
)

PATCH_EX = 38  # 32-px descriptor core + 3-px blur margin each side
CORE_OFF = 3  # core starts at (3, 3); core center = raw center (19, 19)
BLUR_SIGMA = 2.0
BLUR_K = 7
KP_BLOCK = 8  # keypoints per Pallas grid step


_SUP_H = 48  # aligned superset rows: 8 | 48, covers 38 + (y0 % 8)
_SUP_W = 256  # aligned superset lanes: 128 | 256, covers 38 + (x0 % 128)


def _patch_kernel(coords_ref, img_ref, out_ref):
    # Mosaic vector loads need tile-aligned offsets/shapes (8 sublanes x
    # 128 lanes); keypoints are arbitrary. Load an aligned 48x256
    # superset, circular-shift the residual away, keep the 38x38 corner.
    i = pl.program_id(0)
    for j in range(KP_BLOCK):
        y0 = coords_ref[i * KP_BLOCK + j, 0]
        x0 = coords_ref[i * KP_BLOCK + j, 1]
        ya = pl.multiple_of((y0 // 8) * 8, 8)
        xa = pl.multiple_of((x0 // 128) * 128, 128)
        sup = img_ref[pl.ds(ya, _SUP_H), pl.ds(xa, _SUP_W)]
        # pltpu.roll requires non-negative shifts (and silently
        # mis-rolls negative traced sublane shifts): roll by size - r
        sup = pltpu.roll(sup, (_SUP_H - y0 % 8) % _SUP_H, axis=0)
        sup = pltpu.roll(sup, (_SUP_W - x0 % 128) % _SUP_W, axis=1)
        out_ref[j] = sup[:PATCH_EX, :PATCH_EX]


def extract_raw_patches(
    img: jax.Array, xy: jax.Array, interpret: bool = False
) -> jax.Array:
    """[N, PATCH_EX, PATCH_EX] raw patches centered at rounded keypoint
    coords (top-left clipped into bounds)."""
    h, w = img.shape
    n = xy.shape[0]
    half = PATCH_EX // 2
    x0 = jnp.clip(
        jnp.round(xy[:, 0]).astype(jnp.int32) - half, 0, w - PATCH_EX
    )
    y0 = jnp.clip(
        jnp.round(xy[:, 1]).astype(jnp.int32) - half, 0, h - PATCH_EX
    )

    if jax.default_backend() != "tpu" and not interpret:
        def slice_one(yy, xx):
            return jax.lax.dynamic_slice(img, (yy, xx), (PATCH_EX, PATCH_EX))

        return jax.vmap(slice_one)(y0, x0)

    n_pad = -(-n // KP_BLOCK) * KP_BLOCK
    coords = jnp.zeros((n_pad, 2), jnp.int32)
    coords = coords.at[:n, 0].set(y0).at[:n, 1].set(x0)
    # pad so every aligned superset load stays in bounds
    hp = -(-h // 8) * 8 + _SUP_H
    wp = -(-w // 128) * 128 + _SUP_W
    img_p = jnp.zeros((hp, wp), img.dtype).at[:h, :w].set(img)
    out = pl.pallas_call(
        _patch_kernel,
        grid=(n_pad // KP_BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (hp, wp), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (KP_BLOCK, PATCH_EX, PATCH_EX), lambda i: (i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, PATCH_EX, PATCH_EX), img.dtype),
        interpret=interpret,
    )(coords, img_p)
    return out[:n]


@functools.lru_cache()
def _moment_operator_38() -> np.ndarray:
    """[PATCH_EX*PATCH_EX, 2] (m10, m01) circular-mask coordinate
    kernels, center (19, 19), radius PATCH_RADIUS (IC_Angle support)."""
    c = PATCH_EX // 2
    ys, xs = np.mgrid[0:PATCH_EX, 0:PATCH_EX]
    dx = (xs - c).astype(np.float32)
    dy = (ys - c).astype(np.float32)
    mask = (dx ** 2 + dy ** 2) <= PATCH_RADIUS * PATCH_RADIUS
    return np.stack([(dx * mask).reshape(-1), (dy * mask).reshape(-1)], 1)


@functools.lru_cache()
def _blur_band() -> np.ndarray:
    """[PATCH, PATCH_EX] banded Gaussian: core row o = taps over raw
    rows o..o+6 (interior-only — margin supplies the context)."""
    r = BLUR_K // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / BLUR_SIGMA) ** 2)
    k = (k / k.sum()).astype(np.float32)
    A = np.zeros((PATCH, PATCH_EX), np.float32)
    for o in range(PATCH):
        A[o, o : o + BLUR_K] = k
    return A


@functools.lru_cache()
def _selection_matrix() -> np.ndarray:
    """[PATCH*PATCH, N_ANGLE_BINS*N_BITS] float32 in {-1, 0, +1}: column
    (b*256+k) has +1 at bin-b tap a_k and -1 at tap b_k, so
    (patch @ D)[b*256+k] = I(a_k) - I(b_k); bit = result < 0."""
    idx = _binned_pattern_indices()  # [B, 256, 2]
    D = np.zeros((N_ANGLE_BINS * N_BITS, PATCH * PATCH), np.float32)
    rows = np.arange(N_ANGLE_BINS * N_BITS)
    np.add.at(D, (rows, idx[..., 0].reshape(-1)), 1.0)
    np.add.at(D, (rows, idx[..., 1].reshape(-1)), -1.0)
    return D.T  # [1024, 7680]


def orb_from_patches(raw: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Raw patches [N, 38, 38] -> (angle [N], desc [N, 8] uint32).

    Semantics match brief.patch_orientations + brief.compute_descriptors
    on a whole-image blur (the 3-px margin covers the 7-tap kernel)."""
    n = raw.shape[0]
    flat = raw.reshape(n, PATCH_EX * PATCH_EX)

    # IC_Angle moments
    mom = jax.lax.dot_general(
        flat, jnp.asarray(_moment_operator_38()),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    angle = jnp.arctan2(mom[:, 1], mom[:, 0])

    # patch-space separable blur -> [N, 32, 32]
    A = jnp.asarray(_blur_band())  # [32, 38]
    t = jnp.einsum("oi,nij->noj", A, raw)
    blurred = jnp.einsum("noj,pj->nop", t, A).reshape(n, PATCH * PATCH)

    # mean-center: comparisons are shift-invariant, and small magnitudes
    # keep the bf16 MXU pass's rounding below decision noise
    blurred = blurred - jnp.mean(blurred, axis=1, keepdims=True)

    # all-bin signed taps in one matmul, then keep each keypoint's bin
    vals = jax.lax.dot_general(
        blurred, jnp.asarray(_selection_matrix()),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(n, N_ANGLE_BINS, N_BITS)
    two_pi = 2.0 * jnp.pi
    bin_id = (
        jnp.round(jnp.mod(angle, two_pi) * (N_ANGLE_BINS / two_pi)).astype(
            jnp.int32
        )
        % N_ANGLE_BINS
    )
    sel = jnp.take_along_axis(vals, bin_id[:, None, None], axis=1)[:, 0]
    return angle, pack_bits(sel < 0.0)
