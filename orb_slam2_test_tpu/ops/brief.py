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
    patch centered at each pixel. Dense-conv variant kept for tests;
    the extractor uses the patch-matmul path (patch_orientations),
    which only evaluates at keypoints."""
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


@functools.lru_cache()
def _patch_moment_operator() -> np.ndarray:
    """[PATCH*PATCH, 2] — (x-moment, y-moment) coordinate kernels over
    the circular IC_Angle support, laid out for the PATCH x PATCH
    aligned patches of extract_patches (center at (PATCH//2, PATCH//2))."""
    half = 16  # PATCH // 2 (brief.PATCH defined below)
    ys, xs = np.mgrid[0:32, 0:32]
    dx = (xs - half).astype(np.float32)
    dy = (ys - half).astype(np.float32)
    mask = (dx**2 + dy**2) <= PATCH_RADIUS * PATCH_RADIUS
    k10 = (dx * mask).reshape(-1)
    k01 = (dy * mask).reshape(-1)
    return np.stack([k10, k01], axis=1)


def patch_orientations(patches: jax.Array) -> jax.Array:
    """[N, PATCH*PATCH] raw-image patches -> [N] IC_Angle orientations.

    One [N, 1024] x [1024, 2] matmul (MXU) replaces the reference's
    per-keypoint circular-moment loops (IC_Angle) and the dense
    31x31 convolution alternative — moments are only needed AT
    keypoints."""
    op = jnp.asarray(_patch_moment_operator())
    m = jax.lax.dot_general(
        patches, op, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, 2] = (m10, m01)
    return jnp.arctan2(m[:, 1], m[:, 0])


N_ANGLE_BINS = 30  # 12-degree rotation quantization (original ORB paper)
PATCH = 32  # aligned patch size for descriptor sampling


@functools.lru_cache()
def _binned_pattern_indices() -> "np.ndarray":
    """[N_ANGLE_BINS, 256, 2] int32 — linear indices into a flattened
    PATCH x PATCH patch (center at (PATCH//2, PATCH//2)) of the two
    sampling points of each bit, pre-rotated for each angle bin.

    This is the TPU-native trick: continuous per-keypoint pattern
    rotation needs a 512-point random image gather per keypoint (slow,
    scalar-unit bound, and pathological for XLA). Discretizing to 30
    bins makes every sampling index STATIC, so descriptor sampling
    compiles to constant-index selections from contiguous per-keypoint
    patches. Rotation error <= 6 deg, well inside BRIEF's tolerance.
    """
    pat = brief_pattern().astype(np.float32)  # [256, 2, 2] (dx, dy)
    half = PATCH // 2
    out = np.zeros((N_ANGLE_BINS, N_BITS, 2), np.int32)
    for b in range(N_ANGLE_BINS):
        th = 2.0 * np.pi * b / N_ANGLE_BINS
        c, s = np.cos(th), np.sin(th)
        rx = np.round(c * pat[..., 0] - s * pat[..., 1]).astype(np.int64)
        ry = np.round(s * pat[..., 0] + c * pat[..., 1]).astype(np.int64)
        px = np.clip(rx + half, 0, PATCH - 1)
        py = np.clip(ry + half, 0, PATCH - 1)
        out[b] = (py * PATCH + px).astype(np.int32)
    return out


def extract_patches(img: jax.Array, xy: jax.Array) -> jax.Array:
    """[N, PATCH*PATCH] — aligned patches centered at rounded keypoint
    positions (clipped to image bounds), via batched dynamic slices —
    contiguous reads, no random gather."""
    h, w = img.shape
    half = PATCH // 2
    x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - half, 0, w - PATCH)
    y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - half, 0, h - PATCH)

    def slice_one(yy, xx):
        return jax.lax.dynamic_slice(img, (yy, xx), (PATCH, PATCH))

    patches = jax.vmap(slice_one)(y0, x0)  # [N, PATCH, PATCH]
    return patches.reshape(-1, PATCH * PATCH)


def compute_descriptors(
    blurred: jax.Array,  # [H, W] Gaussian-blurred level image
    xy: jax.Array,  # [N, 2] float (x, y) keypoint coords in level pixels
    angle: jax.Array,  # [N] radians
) -> jax.Array:
    """[N, 8] uint32 — rotated-BRIEF descriptors, 256 bits packed.

    bit k = 1 iff I(p + R(theta) a_k) < I(p + R(theta) b_k), rotation
    quantized to N_ANGLE_BINS (reference computeOrbDescriptor rotates
    continuously; the 12-deg discretization is the original ORB
    formulation and is what makes this one MXU/VPU-friendly program).
    """
    patches = extract_patches(blurred, xy)  # [N, 1024]
    idx = jnp.asarray(_binned_pattern_indices())  # [B, 256, 2] static

    # for every bin: constant-index select + compare -> bits [B, N, 256]
    packed_all = []
    for b in range(N_ANGLE_BINS):
        va = patches[:, idx[b, :, 0]]  # [N, 256] static-index gather
        vb = patches[:, idx[b, :, 1]]
        packed_all.append(pack_bits(va < vb))  # [N, 8]
    packed = jnp.stack(packed_all)  # [B, N, 8]

    two_pi = 2.0 * jnp.pi
    bin_id = (
        jnp.round(jnp.mod(angle, two_pi) * (N_ANGLE_BINS / two_pi)).astype(
            jnp.int32
        )
        % N_ANGLE_BINS
    )
    # select each keypoint's bin: [B, N, 8] -> [N, 8]
    return jnp.take_along_axis(packed, bin_id[None, :, None], axis=0)[0]


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
