"""ORB feature extraction — pyramid FAST + oriented BRIEF, end to end.

TPU-native rework of ORBextractor (reference: src/ORBextractor.cc
operator(), ComputeKeyPointsOctTree, DistributeOctTree). Key mapping:

- Per-cell FAST with threshold fallback (iniThFAST=20 / minThFAST=7)
  -> one dense low-threshold pass + a "passed high threshold" bonus in
  the ranking key (ops/fast.py).
- DistributeOctTree's spatially-uniform keypoint budget -> per-cell
  rank penalty: candidates are ordered lexicographically by
  (rank within cell, response), so cell-winners across the whole image
  are taken before any cell's runner-up — the same breadth-first
  spatial fill the quadtree produces, computed with two top_k calls.
- Per-level feature budgets follow the reference's geometric split:
  n_l ~ nfeatures * (1-f)/(1-f^L) * f^l with f = 1/scaleFactor.

Everything is static-shaped: each level yields exactly n_l keypoint
slots (masked where fewer corners exist), concatenated to n_features.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_test_tpu.ops.pyramid import build_pyramid
from orb_slam2_test_tpu.ops.fast import (
    fast_response,
    nms_3x3,
    border_mask,
)
from orb_slam2_test_tpu.ops.brief import EDGE_MARGIN
from orb_slam2_test_tpu.ops.patches import (
    extract_raw_patches,
    orb_from_patches,
)

HIGH_TH_BONUS = 1.0e5  # ranking bonus for corners passing iniThFAST
RANK_PENALTY = 1.0e6  # per-cell-rank lexicographic penalty
CELL = 32  # selection cell size (reference uses ~30 px cells)
CANDS_PER_CELL = 8  # per-cell candidates entering global selection


class Features(NamedTuple):
    """Extracted features, fixed capacity N (= nfeatures).

    uv       [N, 2] float32 — (x, y) in level-0 (full-res) pixel coords
    level    [N] int32      — pyramid level (octave)
    angle    [N] float32    — orientation, radians
    response [N] float32    — FAST response score
    desc     [N, 8] uint32  — packed 256-bit descriptors
    valid    [N] bool
    """

    uv: jax.Array
    level: jax.Array
    angle: jax.Array
    response: jax.Array
    desc: jax.Array
    valid: jax.Array


def level_feature_budget(
    n_features: int, n_levels: int, scale_factor: float
) -> list[int]:
    """Per-level feature counts (reference ORBextractor ctor:
    mnFeaturesPerLevel, geometric with remainder to the last level)."""
    f = 1.0 / scale_factor
    first = n_features * (1.0 - f) / (1.0 - f**n_levels)
    counts = []
    acc = 0
    for l in range(n_levels - 1):
        c = int(round(first * f**l))
        counts.append(c)
        acc += c
    counts.append(max(n_features - acc, 0))
    return counts


def _select_level_keypoints(
    score: jax.Array, n_keep: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Spatially-distributed top-n_keep selection from a response map.

    Returns (xy [n_keep, 2] float32, response [n_keep], valid [n_keep]).
    """
    h, w = score.shape
    ph = -(-h // CELL) * CELL
    pw = -(-w // CELL) * CELL
    padded = jnp.full((ph, pw), 0.0, score.dtype).at[:h, :w].set(score)

    ncy, ncx = ph // CELL, pw // CELL
    cells = padded.reshape(ncy, CELL, ncx, CELL).transpose(0, 2, 1, 3)
    cells = cells.reshape(ncy * ncx, CELL * CELL)

    # per-cell top candidates, rank = position in cell's ordering
    cvals, cidx = jax.lax.top_k(cells, CANDS_PER_CELL)  # [nc, cands]
    rank = jnp.arange(CANDS_PER_CELL, dtype=jnp.float32)[None, :]
    key = jnp.where(cvals > 0.0, cvals - rank * RANK_PENALTY, -jnp.inf)

    flat_key = key.reshape(-1)
    top_keys, flat_pos = jax.lax.top_k(flat_key, n_keep)
    cell_id = flat_pos // CANDS_PER_CELL
    slot = flat_pos % CANDS_PER_CELL
    inner = cidx[cell_id, slot]  # position within the cell
    cy, cx = cell_id // ncx, cell_id % ncx
    y = cy * CELL + inner // CELL
    x = cx * CELL + inner % CELL

    resp = cvals[cell_id, slot]
    valid = top_keys > -jnp.inf
    xy = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    return xy, jnp.where(valid, resp, 0.0), valid


@functools.partial(
    jax.jit, static_argnames=("n_features", "n_levels", "scale_factor",
                              "ini_th", "min_th")
)
def extract_orb(
    img: jax.Array,
    n_features: int = 1000,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    ini_th: float = 20.0,
    min_th: float = 7.0,
) -> Features:
    """Full ORB extraction on a float32 [H, W] grayscale image (0..255).

    Equivalent of ORBextractor::operator() — returns fixed-capacity
    Features with level-0 pixel coordinates (the reference also scales
    keypoints back to full resolution at the end).
    """
    pyr = build_pyramid(img, n_levels, scale_factor)
    budgets = level_feature_budget(n_features, n_levels, scale_factor)

    out_uv, out_level, out_angle, out_resp, out_desc, out_valid = (
        [], [], [], [], [], []
    )
    for l, (level_img, n_l) in enumerate(zip(pyr, budgets)):
        if n_l == 0:
            continue
        h, w = level_img.shape
        corner_lo, score_lo = fast_response(level_img, min_th)
        corner_hi, _ = fast_response(level_img, ini_th)
        eff = score_lo + jnp.where(corner_hi, HIGH_TH_BONUS, 0.0)
        eff = jnp.where(border_mask(h, w, EDGE_MARGIN), eff, 0.0)
        eff = nms_3x3(eff)

        xy, resp, valid = _select_level_keypoints(eff, n_l)

        # fused per-keypoint pipeline: Pallas patch gather + matmul
        # IC_Angle moments + patch-space blur + all-bin BRIEF taps
        # (ops/patches.py; replaces whole-image GaussianBlur + per-bin
        # gathers — see that module for the equivalence argument)
        raw = extract_raw_patches(level_img, xy)
        angle, desc = orb_from_patches(raw)

        scale = scale_factor**l
        out_uv.append(xy * scale)
        out_level.append(jnp.full((n_l,), l, jnp.int32))
        out_angle.append(angle)
        # strip the high-threshold bonus back out of reported response
        out_resp.append(jnp.where(resp >= HIGH_TH_BONUS, resp - HIGH_TH_BONUS, resp))
        out_desc.append(desc)
        out_valid.append(valid)

    return Features(
        uv=jnp.concatenate(out_uv, axis=0),
        level=jnp.concatenate(out_level, axis=0),
        angle=jnp.concatenate(out_angle, axis=0),
        response=jnp.concatenate(out_resp, axis=0),
        desc=jnp.concatenate(out_desc, axis=0),
        valid=jnp.concatenate(out_valid, axis=0),
    )
