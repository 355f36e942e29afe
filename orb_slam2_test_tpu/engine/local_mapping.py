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
from orb_slam2_test_tpu.engine.matchers import search_for_triangulation
from orb_slam2_test_tpu.slam_map.mapstate import (
    MapCapacity,
    MapState,
    add_points,
)
from orb_slam2_test_tpu.slam_map.covisibility import (
    best_covisible,
    observation_counts,
)
from orb_slam2_test_tpu.solvers.ba_core import BAProblem, bundle_adjust


@dataclasses.dataclass(frozen=True)
class LocalBACaps:
    """Static capacities of the local BA window."""

    n_local: int = 16  # optimizable keyframes (reference: all covisible)
    n_fixed: int = 8  # boundary keyframes held fixed
    n_points: int = 4096  # optimizable points


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
@functools.partial(jax.jit, static_argnames=("cam", "cap", "caps"))
def run_local_ba(
    m: MapState,
    cam: PinholeCamera,
    kf_id: jax.Array,
    cap: MapCapacity,
    caps: LocalBACaps = LocalBACaps(),
) -> MapState:
    """Covisibility-local bundle adjustment
    (Optimizer::LocalBundleAdjustment): optimize the current KF + its
    covisible KFs + all their points; keyframes observing those points
    but outside the local set are included fixed. Outlier observations
    are detached afterwards.
    """
    K_cap, N = m.kf_pt_idx.shape
    P = m.pt_valid.shape[0]

    # local keyframes: self + best covisible
    ids, w = best_covisible(m, kf_id, caps.n_local - 1)
    local_ids = jnp.concatenate([kf_id[None], jnp.where(w > 0, ids, -1)])
    local_mask = jnp.zeros((K_cap,), bool).at[
        jnp.where(local_ids >= 0, local_ids, K_cap)
    ].set(True, mode="drop")

    # points observed by local keyframes
    lids_safe = jnp.clip(local_ids, 0)
    lvalid = local_ids >= 0
    lpts = jnp.where(
        lvalid[:, None], m.kf_pt_idx[lids_safe], -1
    )  # [C_local, N]
    pt_mask = jnp.zeros((P,), bool).at[
        jnp.where(lpts >= 0, lpts, P)
    ].set(True, mode="drop")
    pt_mask = pt_mask & m.pt_valid
    sel_score, sel_pts = jax.lax.top_k(
        pt_mask.astype(jnp.int32), caps.n_points
    )
    sel_valid = sel_score > 0
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

    # observations: all features of the C cams that map to selected points
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

    prob = BAProblem(
        cam_Tcw=m.kf_Tcw[cam_safe],
        cam_fixed=cam_fixed,
        pt_xyz=m.pt_xyz[jnp.clip(sel_pts, 0)],
        pt_valid=sel_valid,
        obs_cam=jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[:, None], (C, N)
        ).reshape(-1),
        obs_pt=jnp.clip(q_idx, 0).reshape(-1),
        obs_uvr=uvr.reshape(-1, 3),
        obs_isig2=isig2.reshape(-1),
        obs_valid=obs_ok.reshape(-1),
    )
    res = bundle_adjust(prob, cam)

    # write back poses (local, valid, non-fixed) and points
    upd_cam = cam_ok & ~cam_fixed
    new_Tcw = m.kf_Tcw.at[jnp.where(upd_cam, cam_safe, K_cap)].set(
        res.cam_Tcw, mode="drop"
    )
    new_xyz = m.pt_xyz.at[jnp.where(sel_valid, sel_pts, P)].set(
        res.pt_xyz, mode="drop"
    )

    # detach outlier observations (reference erases chi2-outlier edges)
    inl = res.obs_inlier.reshape(C, N)
    detach = obs_ok & ~inl
    rows = m.kf_pt_idx[cam_safe]
    rows = jnp.where(detach, -1, rows)
    new_pt_idx = m.kf_pt_idx.at[jnp.where(cam_ok, cam_safe, K_cap)].set(
        rows, mode="drop"
    )
    return m._replace(kf_Tcw=new_Tcw, pt_xyz=new_xyz, kf_pt_idx=new_pt_idx)


@f32_matmuls
@functools.partial(jax.jit, static_argnames=())
def cull_points(m: MapState, current_kf: jax.Array) -> MapState:
    """MapPointCulling: drop points with found-ratio < 0.25 or points
    that are >= 2 keyframes old but observed by fewer than 2 keyframes
    (mono thresholds; reference LocalMapping::MapPointCulling)."""
    obs_n = observation_counts(m)
    found_ratio = m.pt_found / jnp.maximum(m.pt_visible, 1.0)
    age = current_kf - m.pt_first_kf  # in keyframe ids (monotone)
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
