"""Stereo scanline matching: left/right ORB association + SAD subpixel.

Replaces Frame::ComputeStereoMatches (reference: src/Frame.cc:~450-600):
for every left keypoint, find the best right keypoint on the same
scanline (row band +-2 px scaled by octave) within the disparity range,
then refine the disparity to subpixel with an 11x11 SAD search (+-5 px
slide) on the pyramid-level images, and drop matches whose SAD exceeds
the robust median gate.

TPU formulation: candidate search is one [Nl, Nr] masked Hamming matrix
(MXU); the SAD refinement uses the same aligned-patch machinery as the
descriptors — per-keypoint 32x32 patches, with the 11 sliding windows
expressed as static slices of the patch, so the whole refine is a
batched elementwise reduction with no random gathers. Keypoint slots
are grouped by pyramid level in static ranges (extractor budgets), so
per-level processing needs no dynamic partitioning.
"""

from __future__ import annotations

import functools

import jax
from orb_slam2_test_tpu.utils.precision import f32_matmuls
import jax.numpy as jnp

from orb_slam2_test_tpu.ops.brief import extract_patches, PATCH
from orb_slam2_test_tpu.ops.extractor import Features, level_feature_budget
from orb_slam2_test_tpu.ops.matching import best_two, masked_hamming_matrix

TH_ORB = 75  # (TH_HIGH + TH_LOW) / 2, reference thOrbDist
SAD_W = 5  # 11x11 window
SAD_L = 5  # +-5 px slide


def _sad_refine(
    lpatch: jax.Array,  # [N, PATCH*PATCH] left patches (level coords)
    rpatch: jax.Array,  # [N, PATCH*PATCH] right patches at candidate
) -> tuple[jax.Array, jax.Array]:
    """Best slide offset + subpixel delta by SAD parabola.

    Returns (delta_r [N] — refinement to ADD to the right x coordinate,
    best_sad [N]). Windows are intensity-normalized by their center
    pixel like the reference (IL - IL_center vs IR - IR_center).
    """
    N = lpatch.shape[0]
    lp = lpatch.reshape(N, PATCH, PATCH)
    rp = rpatch.reshape(N, PATCH, PATCH)
    c = PATCH // 2
    lwin = jax.lax.dynamic_slice(
        lp, (0, c - SAD_W, c - SAD_W), (N, 2 * SAD_W + 1, 2 * SAD_W + 1)
    )
    lwin = lwin - lwin[:, SAD_W : SAD_W + 1, SAD_W : SAD_W + 1]

    sads = []
    for dx in range(-SAD_L, SAD_L + 1):
        rwin = jax.lax.dynamic_slice(
            rp,
            (0, c - SAD_W, c - SAD_W + dx),
            (N, 2 * SAD_W + 1, 2 * SAD_W + 1),
        )
        rwin = rwin - rwin[:, SAD_W : SAD_W + 1, SAD_W : SAD_W + 1]
        sads.append(jnp.sum(jnp.abs(lwin - rwin), axis=(1, 2)))
    sad = jnp.stack(sads, axis=1)  # [N, 11]

    best = jnp.argmin(sad, axis=1)
    best_c = jnp.clip(best, 1, 2 * SAD_L - 1)  # need neighbors for parabola
    n0 = jnp.take_along_axis(sad, (best_c - 1)[:, None], 1)[:, 0]
    n1 = jnp.take_along_axis(sad, best_c[:, None], 1)[:, 0]
    n2 = jnp.take_along_axis(sad, (best_c + 1)[:, None], 1)[:, 0]
    denom = jnp.maximum(n0 + n2 - 2.0 * n1, 1e-6)
    sub = (n0 - n2) / (2.0 * denom)
    sub = jnp.clip(sub, -1.0, 1.0)
    delta = (best_c - SAD_L).astype(jnp.float32) + sub
    best_sad = jnp.take_along_axis(sad, best_c[:, None], 1)[:, 0]
    return delta, best_sad


@f32_matmuls
@functools.partial(
    jax.jit,
    static_argnames=("bf", "n_features", "n_levels", "scale_factor", "min_z"),
)
def stereo_match(
    fl: Features,
    fr: Features,
    left_pyr: tuple,  # per-level left images (raw)
    right_pyr: tuple,  # per-level right images (raw)
    bf: float,
    n_features: int,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    min_z: float | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Associate left->right features and compute (ur [N], depth [N]);
    -1 where no stereo match."""
    if min_z is None:
        min_z = bf / left_pyr[0].shape[1]  # baseline (reference minZ = b)
    max_disp = bf / min_z
    scales = jnp.asarray(
        [scale_factor**l for l in range(n_levels)], jnp.float32
    )

    # --- candidate association on the [Nl, Nr] matrix ---
    d = masked_hamming_matrix(fl.desc, fr.desc, fl.valid, fr.valid)
    lvl_ok = jnp.abs(fl.level[:, None] - fr.level[None, :]) <= 1
    band = scales[jnp.clip(fr.level, 0, n_levels - 1)] * 2.0  # row band
    row_ok = (
        jnp.abs(fl.uv[:, None, 1] - fr.uv[None, :, 1]) <= band[None, :]
    )
    disp = fl.uv[:, None, 0] - fr.uv[None, :, 0]
    disp_ok = (disp >= -3.0) & (disp <= max_disp)
    mask = lvl_ok & row_ok & disp_ok
    d = jnp.where(mask, d, 512)

    best_idx, best, _ = best_two(d)
    matched = (best <= TH_ORB) & fl.valid
    j = jnp.clip(best_idx, 0)

    # --- per-level SAD subpixel refinement (static level slot ranges) ---
    budgets = level_feature_budget(n_features, n_levels, scale_factor)
    ur = jnp.full((n_features,), -1.0)
    depth = jnp.full((n_features,), -1.0)
    sad_all = jnp.full((n_features,), jnp.inf)

    start = 0
    for l, n_l in enumerate(budgets):
        if n_l == 0:
            continue
        sl = slice(start, start + n_l)
        inv_s = 1.0 / float(scale_factor**l)
        xy_l = fl.uv[sl] * inv_s  # left kp in level-l coords
        # right candidate position scaled to the LEFT keypoint's level
        xy_r = fr.uv[j[sl]] * inv_s
        lp = extract_patches(left_pyr[l], xy_l)
        rp = extract_patches(right_pyr[l], xy_r)
        delta, best_sad = _sad_refine(lp, rp)
        # refined right u in full-res coords
        ur_l = (jnp.round(xy_r[:, 0]) + delta) / inv_s
        ur = ur.at[sl].set(ur_l)
        sad_all = sad_all.at[sl].set(best_sad)
        start += n_l

    disp_final = fl.uv[:, 0] - ur
    ok = matched & (disp_final > 0.0) & (disp_final <= max_disp)
    # near-zero disparity clamp like the reference (disparity<=0 -> drop)
    depth = jnp.where(ok, bf / jnp.maximum(disp_final, 1e-6), -1.0)

    # robust SAD gate: keep sad <= 1.5 * 1.4 * median (reference)
    sad_valid = jnp.where(ok, sad_all, jnp.nan)
    med = jnp.nanmedian(sad_valid)
    keep = ok & (sad_all <= 2.1 * med)
    return jnp.where(keep, ur, -1.0), jnp.where(keep, depth, -1.0)
