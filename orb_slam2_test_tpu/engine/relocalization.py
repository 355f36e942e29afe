"""Relocalization: recover the camera pose after tracking loss.

Replaces Tracking::Relocalization (reference: src/Tracking.cc:~1160):
query the keyframe database for place candidates, match the current
frame's descriptors against each candidate keyframe's map points
(reference does SearchByBoW; ours is the same NN + ratio logic with the
MXU matcher), solve PnP RANSAC, and accept after motion-only BA reaches
50 inliers.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_test_tpu.engine.frame import FrameData
from orb_slam2_test_tpu.engine.matchers import (
    match_by_descriptor_to_map,
    search_by_projection,
)
from orb_slam2_test_tpu.solvers.pnp import pnp_ransac_adaptive
from orb_slam2_test_tpu.solvers.pose_opt import pose_optimization


def relocalize(
    frame: FrameData,
    m,  # MapState
    cam,
    candidates: list[int],
    key,
    level_sigma2: np.ndarray,
    min_matches: int = 15,
    min_inliers: int = 50,
    max_candidates: int = 5,
):
    """Try each candidate keyframe; returns (ok, Tcw, feat_pt, key)."""
    for kf in candidates[:max_candidates]:
        row = m.kf_pt_idx[kf]
        has = row >= 0
        pm = match_by_descriptor_to_map(
            frame,
            m.pt_desc[jnp.clip(row, 0)],
            has & m.kf_kp_valid[kf],
            jnp.where(has, row, -1),
        )
        if int(pm.n_matches) < min_matches:
            continue
        feat_pt = pm.feat_pt
        sel = feat_pt >= 0
        X = m.pt_xyz[jnp.clip(feat_pt, 0)]
        key, sub = jax.random.split(key)
        # adaptive iteration count (reference SetRansacParameters):
        # exits after one batch at healthy inlier ratios, keeps
        # sampling at the 20-30% ratios of hard relocalizations
        res, _ = pnp_ransac_adaptive(
            cam, X, frame.uv, sel & frame.valid, sub, min_inliers=10
        )
        if not bool(res.success):
            continue
        # motion-only BA on the PnP pose
        uvr = jnp.concatenate([frame.uv, frame.ur[:, None]], axis=-1)
        isig2 = 1.0 / jnp.asarray(level_sigma2)[frame.level]
        po = pose_optimization(
            cam, res.Tcw, X, uvr, isig2,
            sel & frame.valid & res.inliers,
        )
        n = int(po.n_inliers)
        if n < min_inliers:
            # widen with a projection search around the estimated pose
            # (reference does SearchByProjection widening loops)
            pm2 = search_by_projection(
                cam, po.Tcw,
                m.pt_xyz, m.pt_desc, m.pt_valid,
                m.pt_normal, m.pt_min_dist, m.pt_max_dist,
                jnp.arange(m.pt_valid.shape[0], dtype=jnp.int32),
                frame, radius=10.0, check_view_cos=False,
                max_candidates=min(int(m.pt_valid.shape[0]), 8192),
            )
            feat_pt = jnp.where(feat_pt >= 0, feat_pt, pm2.feat_pt)
            sel = feat_pt >= 0
            X = m.pt_xyz[jnp.clip(feat_pt, 0)]
            po = pose_optimization(
                cam, po.Tcw, X, uvr, isig2, sel & frame.valid
            )
            n = int(po.n_inliers)
        if n >= min_inliers:
            return True, np.asarray(po.Tcw), jnp.where(
                po.inliers, feat_pt, -1
            ), key
    return False, None, None, key
