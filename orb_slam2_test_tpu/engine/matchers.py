"""High-level matchers: projection search, initialization search,
triangulation search — the ORBmatcher API surface as masked MXU matrices.

Replaces src/ORBmatcher.cc's SearchByProjection (x4 overloads),
SearchForInitialization and SearchForTriangulation. Instead of the
reference's grid-hash candidate lists + per-keypoint loops, every search
builds one [P, N] Hamming matrix (a 256-deep matmul) and applies the
geometric gates as masks — window radius, predicted octave, epipolar
distance — then resolves point-vs-feature assignments with scatter-min.
Constants follow ORBmatcher.h: TH_LOW=50, TH_HIGH=100, ratio tests and
rotation-histogram filtering identical in spirit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
from orb_slam2_test_tpu.utils.precision import f32_matmuls
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.engine.frame import FrameData
from orb_slam2_test_tpu.ops.matching import (
    TH_HIGH,
    TH_LOW,
    best_two,
    masked_hamming_matrix,
    rotation_consistency,
)


class ProjectionMatch(NamedTuple):
    feat_pt: jax.Array  # [N] int32 — point id matched to each feature (-1)
    pt_feat: jax.Array  # [P] int32 — feature id matched to each point (-1)
    n_matches: jax.Array  # [] int32


def _resolve_conflicts(
    best_feat: jax.Array,  # [P] best feature per point (-1 none)
    best_dist: jax.Array,  # [P]
    n_features: int,
    pt_ids: jax.Array | None = None,  # [P] global point ids (defaults to arange)
) -> tuple[jax.Array, jax.Array]:
    """Many points may select the same feature; keep the best distance.

    Returns (feat_pt [N] winning point per feature, pt_feat [P] feature
    per point after losing points are dropped).
    """
    P = best_feat.shape[0]
    if pt_ids is None:
        pt_ids = jnp.arange(P, dtype=jnp.int32)
    has = best_feat >= 0
    tgt = jnp.where(has, best_feat, n_features)  # OOB drops
    # encode (dist, point-row) for tie-broken scatter-min
    enc = jnp.where(has, best_dist * (P + 1) + jnp.arange(P), jnp.iinfo(jnp.int32).max)
    feat_best = jnp.full((n_features,), jnp.iinfo(jnp.int32).max, jnp.int32)
    feat_best = feat_best.at[tgt].min(enc, mode="drop")
    win_row = jnp.where(
        feat_best < jnp.iinfo(jnp.int32).max, feat_best % (P + 1), -1
    )
    feat_pt = jnp.where(win_row >= 0, pt_ids[jnp.clip(win_row, 0)], -1)
    # a point keeps its match only if it won the feature
    won = has & (win_row[jnp.clip(best_feat, 0)] == jnp.arange(P))
    pt_feat = jnp.where(won, best_feat, -1)
    return feat_pt, pt_feat


@f32_matmuls
@functools.partial(
    jax.jit,
    static_argnames=(
        "cam", "n_levels", "ratio", "check_view_cos", "max_candidates",
    ),
)
def search_by_projection(
    cam: PinholeCamera,
    Tcw: jax.Array,  # [4, 4] predicted pose
    pts_xyz: jax.Array,  # [P, 3]
    pts_desc: jax.Array,  # [P, 8]
    pts_valid: jax.Array,  # [P]
    pts_normal: jax.Array,  # [P, 3]
    pts_mindist: jax.Array,  # [P]
    pts_maxdist: jax.Array,  # [P]
    pt_ids: jax.Array,  # [P] global map ids (for output labeling)
    frame: FrameData,
    radius: float = 15.0,
    max_hamming: int = TH_HIGH,
    ratio: float = 1.0,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    check_view_cos: bool = True,
    max_candidates: int | None = None,
) -> ProjectionMatch:
    """Project map points into the frame and match to nearby features.

    Covers both SearchByProjection(Frame&, Frame&) [motion-model: the
    caller passes last-frame points, radius th*scale] and
    SearchByProjection(Frame&, vector<MapPoint*>) [local map: frustum +
    view-angle + scale gates, ratio 0.8] — reference ORBmatcher.cc.

    max_candidates: when set and smaller than P, the per-point gates
    (validity, frustum, distance range, view angle) run over all P
    points, then only the first max_candidates surviving points enter
    the dense [C, N] descriptor-distance matrix — the map can hold 100k+
    points while the matcher's matmul stays bounded (the reference's
    equivalent bound is the covisibility-local point set).
    """
    N = frame.uv.shape[0]
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    Ow = -R.T @ t

    pc = pts_xyz @ R.T + t
    z = pc[:, 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    u = cam.fx * pc[:, 0] / z_safe + cam.cx
    v = cam.fy * pc[:, 1] / z_safe + cam.cy

    in_img = (
        (z > 0.0)
        & (u >= 0)
        & (u < cam.width)
        & (v >= 0)
        & (v < cam.height)
    )
    view = pts_xyz - Ow
    dist = jnp.linalg.norm(view, axis=-1)
    dist_ok = (dist >= pts_mindist * 0.8) & (dist <= pts_maxdist * 1.2)
    if check_view_cos:
        ncos = jnp.sum(view * pts_normal, axis=-1) / jnp.maximum(dist, 1e-9)
        view_ok = ncos > 0.5  # reference: viewCos > 0.5 (60 deg)
    else:
        view_ok = jnp.ones_like(dist_ok)

    # predicted octave from distance (MapPoint::PredictScale)
    log_scale = jnp.log(scale_factor)
    pred_level = jnp.clip(
        jnp.ceil(
            jnp.log(jnp.maximum(pts_maxdist, 1e-9) / jnp.maximum(dist, 1e-9))
            / log_scale
        ).astype(jnp.int32),
        0,
        n_levels - 1,
    )
    level_scale = scale_factor ** pred_level.astype(jnp.float32)

    usable = pts_valid & in_img & dist_ok & view_ok

    P = pts_xyz.shape[0]
    sel = None
    if max_candidates is not None and max_candidates < P:
        # compact the surviving candidates so the dense matrix is [C, N]
        score, sel = jax.lax.top_k(usable.astype(jnp.int32), max_candidates)
        sel_ok = score > 0
        u, v = u[sel], v[sel]
        usable = sel_ok
        level_scale = level_scale[sel]
        pred_level = pred_level[sel]
        pts_desc = pts_desc[sel]
        pt_ids = pt_ids[sel]

    # geometric masks on the [C, N] matrix
    du = u[:, None] - frame.uv[None, :, 0]
    dv = v[:, None] - frame.uv[None, :, 1]
    r_eff = radius * level_scale
    win = (du * du + dv * dv) <= (r_eff * r_eff)[:, None]
    lvl_ok = (frame.level[None, :] >= pred_level[:, None] - 1) & (
        frame.level[None, :] <= pred_level[:, None] + 1
    )
    mask = win & lvl_ok & usable[:, None] & frame.valid[None, :]

    d = masked_hamming_matrix(
        pts_desc, frame.desc, jnp.ones_like(usable), frame.valid
    )
    d = jnp.where(mask, d, 512)

    best_idx, best, second = best_two(d)
    ok = (best <= max_hamming) & usable
    if ratio < 1.0:
        ok = ok & (
            best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
        )
    best_feat = jnp.where(ok, best_idx, -1)

    feat_pt, pt_feat = _resolve_conflicts(best_feat, best, N, pt_ids)
    if sel is not None:
        # scatter the per-candidate feature assignment back to [P]
        pt_feat = jnp.full((P,), -1, jnp.int32).at[
            jnp.where(usable, sel, P)
        ].set(pt_feat, mode="drop")
    return ProjectionMatch(
        feat_pt=feat_pt,
        pt_feat=pt_feat,
        n_matches=jnp.sum((feat_pt >= 0).astype(jnp.int32)),
    )


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("window", "max_hamming"))
def search_for_initialization(
    f1: FrameData,
    f2: FrameData,
    window: int = 100,
    max_hamming: int = TH_LOW,
    ratio: float = 0.9,
) -> tuple[jax.Array, jax.Array]:
    """Window-constrained matching between the two init frames
    (ORBmatcher::SearchForInitialization: level-0 features, window 100,
    ratio 0.9, rotation histogram). Returns (match12 [N1] -> idx2 or -1,
    n_matches)."""
    lvl0_1 = (f1.level == 0) & f1.valid
    lvl0_2 = (f2.level == 0) & f2.valid
    d = masked_hamming_matrix(f1.desc, f2.desc, lvl0_1, lvl0_2)
    du = f1.uv[:, None, 0] - f2.uv[None, :, 0]
    dv = f1.uv[:, None, 1] - f2.uv[None, :, 1]
    win = (jnp.abs(du) <= window) & (jnp.abs(dv) <= window)
    d = jnp.where(win, d, 512)

    best_idx, best, second = best_two(d)
    ok = (best <= max_hamming) & (
        best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    )
    m12 = jnp.where(ok, best_idx, -1)
    m12 = rotation_consistency(m12, f1.angle, f2.angle)

    # cross-check: best match of chosen f2 feature must be this f1 feature
    neg_t = -jnp.swapaxes(d, 0, 1)
    best21 = jnp.argmax(neg_t, axis=-1)
    agree = best21[jnp.clip(m12, 0)] == jnp.arange(m12.shape[0])
    m12 = jnp.where((m12 >= 0) & agree, m12, -1)
    return m12, jnp.sum((m12 >= 0).astype(jnp.int32))


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("cam",))
def search_for_triangulation(
    cam: PinholeCamera,
    kf1_uv: jax.Array, kf1_desc: jax.Array, kf1_level: jax.Array,
    kf1_free: jax.Array,  # [N] bool — feature has no map point yet
    kf2_uv: jax.Array, kf2_desc: jax.Array, kf2_level: jax.Array,
    kf2_free: jax.Array,
    Tcw1: jax.Array, Tcw2: jax.Array,
    max_hamming: int = TH_LOW,
) -> tuple[jax.Array, jax.Array]:
    """Epipolar-constrained matching of unassociated features between two
    keyframes (ORBmatcher::SearchForTriangulation). The reference
    narrows candidates via shared BoW nodes; here the [N, N] matrix is
    cheap enough to take all pairs and gate by the epipolar distance in
    the second image. Returns (match12 [N1] -> idx2 or -1, n_matches)."""
    # fundamental from relative pose: F = K^-T [t]x R K^-1 (1 -> 2)
    T21 = Tcw2 @ jnp.linalg.inv(Tcw1)
    R21, t21 = T21[:3, :3], T21[:3, 3]
    tx = jnp.array(
        [
            [0.0, -t21[2], t21[1]],
            [t21[2], 0.0, -t21[0]],
            [-t21[1], t21[0], 0.0],
        ]
    )
    K = cam.K
    Kinv = jnp.linalg.inv(K)
    F12 = Kinv.T @ tx @ R21 @ Kinv

    ones1 = jnp.ones_like(kf1_uv[:, :1])
    p1 = jnp.concatenate([kf1_uv, ones1], axis=-1)  # [N1, 3]
    lines = p1 @ F12.T  # epipolar lines in image 2 [N1, 3]
    p2 = jnp.concatenate([kf2_uv, jnp.ones_like(kf2_uv[:, :1])], axis=-1)
    num = jnp.einsum("mi,ni->mn", lines, p2)  # [N1, N2]
    den = lines[:, 0] ** 2 + lines[:, 1] ** 2
    d_epi2 = (num * num) / jnp.maximum(den, 1e-12)[:, None]

    # gate: 3.84 sigma^2 of the *second* keyframe's octave
    sigma2_2 = (1.2 ** kf2_level.astype(jnp.float32)) ** 2
    epi_ok = d_epi2 < 3.84 * sigma2_2[None, :]

    d = masked_hamming_matrix(kf1_desc, kf2_desc, kf1_free, kf2_free)
    d = jnp.where(epi_ok, d, 512)

    best_idx = jnp.argmin(d, axis=-1)
    best = jnp.min(d, axis=-1)
    ok = best <= max_hamming
    m12 = jnp.where(ok, best_idx, -1)

    # mutual check
    best21 = jnp.argmin(d, axis=0)
    agree = best21[jnp.clip(m12, 0)] == jnp.arange(m12.shape[0])
    m12 = jnp.where((m12 >= 0) & agree, m12, -1)
    return m12, jnp.sum((m12 >= 0).astype(jnp.int32))


@f32_matmuls
@functools.partial(jax.jit, static_argnames=())
def search_by_bow(
    frame: FrameData,
    frame_nodes: jax.Array,  # [N] vocabulary node ids (-1 invalid)
    pts_desc: jax.Array,  # [P, 8] candidate map-point descriptors
    pts_valid: jax.Array,  # [P]
    pt_ids: jax.Array,  # [P] global map ids
    pts_nodes: jax.Array,  # [P] vocabulary node ids of the candidates
    pts_angle: jax.Array,  # [P] keypoint angle in the source keyframe
    max_hamming: int = TH_LOW,
    ratio: float = 0.7,
) -> ProjectionMatch:
    """BoW-accelerated keyframe<->frame matching
    (ORBmatcher::SearchByBoW, reference :~150): candidate pairs are
    restricted to features that fall in the SAME vocabulary tree node at
    the FeatureVector level. The reference walks the two FeatureVectors
    in lockstep to prune comparisons for CPU speed; on the MXU the full
    Hamming matrix is one matmul, so the node constraint is applied as a
    mask — same accepted-match semantics (node equality + TH_LOW + ratio
    0.7 + rotation histogram), different execution.
    """
    d = masked_hamming_matrix(pts_desc, frame.desc, pts_valid, frame.valid)
    node_ok = (
        (pts_nodes[:, None] == frame_nodes[None, :])
        & (pts_nodes[:, None] >= 0)
        & (frame_nodes[None, :] >= 0)
    )
    d = jnp.where(node_ok, d, 512)

    best_idx, best, second = best_two(d)
    ok = (best <= max_hamming) & (
        best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    )
    pt_feat_raw = jnp.where(ok & pts_valid, best_idx, -1)
    # rotation-consistency over point->feature matches (the reference
    # histograms kp_ref.angle - kp_cur.angle)
    pt_feat_raw = rotation_consistency(
        pt_feat_raw, pts_angle, frame.angle
    )
    feat_pt, pt_feat = _resolve_conflicts(
        jnp.where(pt_feat_raw >= 0, pt_feat_raw, -1),
        best,
        frame.uv.shape[0],
        pt_ids,
    )
    return ProjectionMatch(
        feat_pt=feat_pt,
        pt_feat=pt_feat,
        n_matches=jnp.sum((feat_pt >= 0).astype(jnp.int32)),
    )


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("cam",))
def search_by_sim3(
    cam: PinholeCamera,
    f1: FrameData,
    pc1: jax.Array,  # [N1, 3] camera-1-frame positions of f1's map points
    has1: jax.Array,  # [N1] feature has a map point
    f2: FrameData,
    pc2: jax.Array,  # [N2, 3]
    has2: jax.Array,
    S12: jax.Array,  # [4, 4] sim3: pc1 ~ S12 * pc2
    radius: float = 7.5,
    max_hamming: int = TH_HIGH,
) -> tuple[jax.Array, jax.Array]:
    """Widen keyframe<->keyframe matches with a known relative Sim3
    (ORBmatcher::SearchBySim3, reference :~960): project each side's
    map points into the other image through S12/S21, match descriptors
    inside a scale-dependent window, and keep mutually-agreeing pairs.

    Returns (match12 [N1] -> feature index in f2 or -1, n_matches).
    """
    def proj(p3):
        z = jnp.where(jnp.abs(p3[..., 2]) > 1e-6, p3[..., 2], 1e-6)
        return jnp.stack(
            [cam.fx * p3[..., 0] / z + cam.cx,
             cam.fy * p3[..., 1] / z + cam.cy],
            axis=-1,
        ), p3[..., 2]

    sR = S12[:3, :3]
    t12 = S12[:3, 3]
    s = jnp.maximum(jnp.linalg.norm(sR[:, 0]), 1e-12)
    R = sR / s
    # S21 = inverse sim3
    sR21 = (1.0 / s) * R.T
    t21 = -(R.T @ t12) / s

    p2_in1, z1 = proj(pc2 @ sR.T + t12)  # [N2, 2]
    p1_in2, z2 = proj(pc1 @ sR21.T + t21)  # [N1, 2]

    r1 = radius * (1.2 ** f1.level.astype(jnp.float32))  # [N1]
    r2 = radius * (1.2 ** f2.level.astype(jnp.float32))  # [N2]

    d = masked_hamming_matrix(
        f1.desc, f2.desc, has1 & f1.valid, has2 & f2.valid
    )  # [N1, N2]

    # direction A: point j of f2 lands near feature i of f1
    duA = p2_in1[None, :, 0] - f1.uv[:, None, 0]
    dvA = p2_in1[None, :, 1] - f1.uv[:, None, 1]
    winA = (duA * duA + dvA * dvA) <= (r1[:, None] ** 2)
    winA = winA & (z1[None, :] > 0)
    dA = jnp.where(winA, d, 512)
    m21 = jnp.argmin(dA, axis=0)  # [N2] best f1 feature per f2 point
    okA = jnp.min(dA, axis=0) <= max_hamming

    # direction B: point i of f1 lands near feature j of f2
    duB = p1_in2[:, None, 0] - f2.uv[None, :, 0]
    dvB = p1_in2[:, None, 1] - f2.uv[None, :, 1]
    winB = (duB * duB + dvB * dvB) <= (r2[None, :] ** 2)
    winB = winB & (z2[:, None] > 0)
    dB = jnp.where(winB, d, 512)
    m12 = jnp.argmin(dB, axis=1)  # [N1] best f2 feature per f1 point
    okB = jnp.min(dB, axis=1) <= max_hamming

    # mutual agreement (reference: accept when both searches pick the
    # same pair)
    agree = (
        okB
        & (m21[jnp.clip(m12, 0)] == jnp.arange(m12.shape[0]))
        & okA[jnp.clip(m12, 0)]
    )
    out = jnp.where(agree, m12, -1)
    return out, jnp.sum((out >= 0).astype(jnp.int32))


@f32_matmuls
@functools.partial(jax.jit, static_argnames=())
def match_by_descriptor_to_map(
    frame: FrameData,
    pts_desc: jax.Array,  # [P, 8]
    pts_valid: jax.Array,  # [P]
    pt_ids: jax.Array,  # [P]
    max_hamming: int = TH_LOW,
    ratio: float = 0.7,
) -> ProjectionMatch:
    """Brute-force descriptor match frame <- point set, no geometry.
    Stand-in for SearchByBoW(KeyFrame*, Frame&) used by
    TrackReferenceKeyFrame / relocalization (the BoW FeatureVector only
    accelerates this; accuracy-wise it is a descriptor NN with ratio
    0.7 + rotation check, which is what this computes)."""
    d = masked_hamming_matrix(pts_desc, frame.desc, pts_valid, frame.valid)
    best_idx, best, second = best_two(d)
    ok = (best <= max_hamming) & (
        best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    )
    best_feat = jnp.where(ok, best_idx, -1)
    feat_pt, pt_feat = _resolve_conflicts(
        best_feat, best, frame.uv.shape[0], pt_ids
    )
    return ProjectionMatch(
        feat_pt=feat_pt,
        pt_feat=pt_feat,
        n_matches=jnp.sum((feat_pt >= 0).astype(jnp.int32)),
    )
