"""Loop closing: detect -> Sim3 -> correct -> pose graph -> global BA.

Replaces src/LoopClosing.cc. Pipeline per new keyframe (the reference
runs this in a third pthread at lower cadence; here it is invoked after
keyframe insertion, with every numeric stage jitted):

  DetectLoop      -> BoW candidates (slam_map/keyframe_db) + the
                     covisibility-consistency chain (>= 3 consecutive
                     detections, reference threshold).
  ComputeSim3     -> descriptor matching between current and candidate
                     keyframe map points, batched Horn Sim3 RANSAC
                     (solvers/sim3_solver), GN Sim3 refinement.
  CorrectLoop     -> propagate the corrected Sim3 to the current
                     keyframe's covisible group, transform their points,
                     fuse duplicates, optimize the essential graph
                     (solvers/pose_graph), then a CG global BA
                     (solvers/ba_core solver="cg").
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_test_tpu.bow.vocabulary import Vocabulary, transform
from orb_slam2_test_tpu.engine.frame import FrameData
from orb_slam2_test_tpu.engine.matchers import (
    search_by_bow,
    search_by_projection,
    search_by_sim3,
)
from orb_slam2_test_tpu.geometry.se3 import se3_inverse
from orb_slam2_test_tpu.geometry.sim3 import (
    se3_from_sim3,
    sim3_apply,
    sim3_compose,
    sim3_from_se3,
    sim3_inverse,
)
from orb_slam2_test_tpu.slam_map.covisibility import (
    add_loop_edge,
    covisibility_weights,
)
from orb_slam2_test_tpu.slam_map.keyframe_db import KeyFrameDatabase
from orb_slam2_test_tpu.slam_map.mapstate import MapState
from orb_slam2_test_tpu.solvers.ba_core import (
    BAProblem,
    _robust_cost,
    bundle_adjust,
)
from orb_slam2_test_tpu.solvers.pose_graph import optimize_essential_graph
from orb_slam2_test_tpu.solvers.sim3_solver import optimize_sim3, sim3_ransac

import functools


@functools.partial(jax.jit, static_argnames=("cam",))
def _gba_cost_device(prob, cam):
    """Pre-BA robust cost (for the convergence record in _global_ba)."""
    return _robust_cost(prob, cam)


# reference constants
MIN_KF_GAP = 10  # KFs since last loop before detecting again
CONSISTENCY_TH = 3
MIN_SIM3_MATCHES = 20
MIN_SIM3_INLIERS = 20
MIN_TOTAL_MATCHES = 40  # reference ComputeSim3 final acceptance gate
COVIS_EDGE_MIN = 100  # strong-covisibility essential-graph edges
EDGE_CAP = 4096


def _pad_edges(ei, ej, meas):
    """Pad the essential-graph edge arrays to the next power-of-two
    bucket >= EDGE_CAP. Round 1 silently TRUNCATED past EDGE_CAP —
    dropped edges = a wrong pose graph at KITTI scale (strong
    covisibility + tree edges exceed 4096). Power-of-two bucketing
    keeps jit recompiles of optimize_essential_graph rare (loop
    closures are rare events). Returns (ei, ej, meas, evalid, cap)."""
    E = int(ei.shape[0])
    cap = EDGE_CAP
    while cap < E:
        cap *= 2
    pad = cap - E
    ei = jnp.concatenate([ei, jnp.zeros(pad, jnp.int32)])
    ej = jnp.concatenate([ej, jnp.zeros(pad, jnp.int32)])
    meas = jnp.concatenate(
        [meas, jnp.tile(jnp.eye(4)[None], (pad, 1, 1))]
    )
    evalid = jnp.arange(cap) < E
    return ei, ej, meas, evalid, cap


def _kf_as_frame(m: MapState, kf: int) -> FrameData:
    return FrameData(
        uv=m.kf_uv[kf],
        uv_raw=m.kf_uv[kf],
        level=m.kf_level[kf],
        angle=m.kf_angle[kf],
        desc=m.kf_desc[kf],
        valid=m.kf_kp_valid[kf],
        ur=m.kf_ur[kf],
        depth=m.kf_depth[kf],
        timestamp=m.kf_timestamp[kf],
    )


class LoopCloser:
    def __init__(
        self,
        cam,
        voc: Vocabulary,
        fix_scale: bool = False,
        seed: int = 7,
        min_kf_gap: int = MIN_KF_GAP,
    ):
        self.cam = cam
        self.voc = voc
        self.db = KeyFrameDatabase(voc.word_weight)
        self.fix_scale = fix_scale
        self.key = jax.random.PRNGKey(seed)
        self.consistent_groups: list[tuple[set, int]] = []
        self.last_loop_kf = -1
        self.min_kf_gap = min_kf_gap
        self.n_loops_closed = 0
        # (cost_before, cost_after) device scalars of the last global BA
        self.last_gba_cost = None

    # ------------------------------------------------------------------
    def kf_words(self, m: MapState, kf: int) -> np.ndarray:
        w, _ = transform(self.voc, m.kf_desc[kf], m.kf_kp_valid[kf])
        return np.asarray(w)

    def on_new_keyframe(self, m: MapState, kf_id: int):
        """Returns (map, loop_closed: bool). Adds the KF to the database
        either way (reference DetectLoop adds at the end)."""
        words = self.kf_words(m, kf_id)

        covw = np.asarray(covisibility_weights(m, jnp.asarray([kf_id]))[0])
        connected = set(np.nonzero(covw >= 15)[0].tolist())

        loop_closed = False
        candidate = None
        if (
            len(self.db.words) >= 3
            and kf_id - self.last_loop_kf > self.min_kf_gap
        ):
            candidate = self._detect_loop(m, kf_id, words, connected)
        if candidate is not None:
            ok, m = self._compute_and_correct(m, kf_id, candidate)
            loop_closed = ok
            if ok:
                self.last_loop_kf = kf_id
                self.n_loops_closed += 1

        self.db.add(kf_id, words)
        return m, loop_closed

    def rebuild_from_map(self, m: MapState) -> None:
        """Recompute the keyframe database from a (restored) map: BoW
        word lists are derivable state, so checkpoints don't store them
        (io/checkpoint.py load_tracker)."""
        self.db = KeyFrameDatabase(self.voc.word_weight)
        self.consistent_groups = []
        for kf in np.nonzero(np.asarray(m.kf_valid))[0]:
            self.db.add(int(kf), self.kf_words(m, int(kf)))

    # ------------------------------------------------------------------
    def _detect_loop(self, m, kf_id, words, connected):
        # min reference score vs covisible keyframes (reference: minScore)
        qv_scores = []
        from orb_slam2_test_tpu.slam_map.keyframe_db import bow_vector, l1_score

        qv = bow_vector(words, self.db.word_weights)
        for c in connected:
            if c in self.db.bow:
                qv_scores.append(l1_score(qv, self.db.bow[c]))
        min_score = min(qv_scores) if qv_scores else 0.3

        # stage 1: inverted-index prefilter + score gate — O(shared
        # words); no covisibility work yet
        scored = self.db.query_loop_candidates(
            qv, words, set(connected) | {kf_id}, min_score
        )
        if not scored:
            # reference DetectLoop: no candidates -> clear the
            # consistency chains (otherwise stale groups linger and a
            # later unrelated candidate chains against them)
            self.consistent_groups = []
            return None

        # stage 2: covisibility groups for the FEW scored candidates
        # only (ONE [C, K] matmul; round 1 built groups for every
        # database keyframe — quadratic host time at 1000+ keyframes)
        cand_ids = [kf for kf, _ in scored]
        W = np.asarray(
            covisibility_weights(m, jnp.asarray(cand_ids, jnp.int32))
        )
        covis_groups = {
            k: set(np.nonzero(W[row] >= 15)[0].tolist()) | {k}
            for row, k in enumerate(cand_ids)
        }
        cands = self.db.accumulate_groups(scored, covis_groups)

        # covisibility-consistency chaining (reference: candidate's group
        # must intersect a group seen in >= 3 consecutive detections)
        new_groups: list[tuple[set, int]] = []
        enough: list[int] = []
        for cand in cands:
            group = covis_groups.get(cand, {cand})
            count = 0
            for prev_group, prev_count in self.consistent_groups:
                if group & prev_group:
                    count = max(count, prev_count + 1)
            new_groups.append((group, count))
            if count >= CONSISTENCY_TH - 1:
                enough.append(cand)
        self.consistent_groups = new_groups
        return enough[0] if enough else None

    # ------------------------------------------------------------------
    def _compute_and_correct(self, m: MapState, kf_id: int, cand: int):
        # ---- SearchByBoW: current KF features vs candidate KF's map
        # points, restricted to shared vocabulary nodes (reference
        # ComputeSim3 first stage)
        frame = _kf_as_frame(m, kf_id)
        row_c = m.kf_pt_idx[cand]
        has_c = (row_c >= 0) & m.kf_kp_valid[cand]
        _, nodes_cur = transform(
            self.voc, m.kf_desc[kf_id], m.kf_kp_valid[kf_id]
        )
        _, nodes_c = transform(self.voc, m.kf_desc[cand], has_c)
        pm = search_by_bow(
            frame, nodes_cur,
            m.pt_desc[jnp.clip(row_c, 0)],
            has_c,
            jnp.where(has_c, row_c, -1),
            nodes_c,
            m.kf_angle[cand],
        )
        # pairs: current feature n has own point AND matched candidate point
        own = m.kf_pt_idx[kf_id]
        pair_pt = pm.feat_pt  # [N] candidate point id per current feature
        pair_ok = (own >= 0) & (pair_pt >= 0)
        if int(jnp.sum(pair_ok)) < MIN_SIM3_MATCHES:
            return False, m

        T1 = m.kf_Tcw[kf_id]
        T2 = m.kf_Tcw[cand]

        def cam_pts(pt_ids, T):
            X = m.pt_xyz[jnp.clip(pt_ids, 0)]
            return X @ T[:3, :3].T + T[:3, 3]

        pc1 = cam_pts(own, T1)
        pc2 = cam_pts(pair_pt, T2)

        self.key, sub = jax.random.split(self.key)
        res = sim3_ransac(
            self.cam, pc1, pc2, pair_ok, sub,
            fix_scale=self.fix_scale, min_inliers=MIN_SIM3_INLIERS,
        )
        if not bool(res.success):
            return False, m

        # ---- SearchBySim3: widen the match set by mutual projection
        # through the RANSAC estimate (reference second stage)
        frame_c = _kf_as_frame(m, cand)
        cand_pc2 = cam_pts(row_c, T2)  # feature-aligned, N2 rows
        m12, _ = search_by_sim3(
            self.cam,
            frame, pc1, own >= 0,
            frame_c, cand_pc2, has_c,
            res.S12,
        )
        widened_pt = jnp.where(m12 >= 0, row_c[jnp.clip(m12, 0)], -1)
        pair_pt = jnp.where(pair_ok & res.inliers, pair_pt, widened_pt)
        pair_ok2 = (own >= 0) & (pair_pt >= 0)

        pc2 = cam_pts(pair_pt, T2)
        S12, inl, n = optimize_sim3(
            self.cam, res.S12, pc1, pc2, pair_ok2,
            fix_scale=self.fix_scale,
        )
        if int(n) < MIN_SIM3_INLIERS:
            return False, m

        # ---- final gate: project the loop neighborhood's map points
        # into the current KF through the corrected pose and require
        # enough total support (reference: SearchByProjection over
        # mvpLoopMapPoints, accept when nTotalMatches >= 40)
        S_cand_w = sim3_from_se3(T2)
        Scw = sim3_compose(S12, S_cand_w)
        Tcw_corr = se3_from_sim3(Scw)
        covw_c = np.asarray(
            covisibility_weights(m, jnp.asarray([cand]))[0]
        )
        loop_side = set(np.nonzero(covw_c >= 15)[0].tolist()) | {cand}
        P = m.pt_valid.shape[0]
        loop_pts_mask = np.zeros(P, bool)
        kf_pt_np = np.asarray(m.kf_pt_idx)
        for g in loop_side:
            pts = kf_pt_np[g]
            loop_pts_mask[pts[pts >= 0]] = True
        loop_pts = jnp.asarray(loop_pts_mask) & m.pt_valid
        pmw = search_by_projection(
            self.cam, Tcw_corr,
            m.pt_xyz, m.pt_desc, loop_pts,
            m.pt_normal, m.pt_min_dist, m.pt_max_dist,
            jnp.arange(P, dtype=jnp.int32),
            frame, radius=10.0, check_view_cos=False,
            max_candidates=min(P, 8192),
        )
        total = jnp.sum(
            ((pmw.feat_pt >= 0) | (inl & pair_ok2)).astype(jnp.int32)
        )
        if int(total) < MIN_TOTAL_MATCHES:
            return False, m

        m = self._correct_loop(m, kf_id, cand, S12)
        return True, m

    # ------------------------------------------------------------------
    def _correct_loop(self, m: MapState, kf_id: int, cand: int, S12):
        K = m.kf_valid.shape[0]
        P = m.pt_valid.shape[0]
        valid_np = np.asarray(m.kf_valid)

        # corrected Sim3 of the current KF: Scw = S_cur_cand * S_cand_w
        S_cand_w = sim3_from_se3(m.kf_Tcw[cand])
        Scw_corr = sim3_compose(S12, S_cand_w)

        # current KF's covisible group gets the same correction
        covw = np.asarray(covisibility_weights(m, jnp.asarray([kf_id]))[0])
        group = set(np.nonzero(covw >= 15)[0].tolist()) | {kf_id}
        group_mask_np = np.zeros(K, bool)
        for g in group:
            group_mask_np[g] = True
        group_mask = jnp.asarray(group_mask_np)

        T_cur_inv = se3_inverse(m.kf_Tcw[kf_id])
        S_old_all = sim3_from_se3(m.kf_Tcw)  # [K, 4, 4]
        S_i_cur = sim3_from_se3(m.kf_Tcw @ T_cur_inv[None])
        S_corr_all = jax.vmap(lambda s: sim3_compose(s, Scw_corr))(S_i_cur)
        S_new_all = jnp.where(
            group_mask[:, None, None], S_corr_all, S_old_all
        )

        # move the group's map points: X' = S_new^-1 * S_old * X, with
        # each point corrected through its reference keyframe if that
        # keyframe is in the group (reference corrects via mnCorrectedByKF)
        ref = jnp.clip(m.pt_ref_kf, 0)
        pt_in_group = group_mask[ref] & m.pt_valid & (m.pt_ref_kf >= 0)
        corr = jax.vmap(
            lambda a, b: sim3_compose(sim3_inverse(a), b)
        )(S_new_all, S_old_all)  # [K, 4, 4] point-correction per ref KF
        X_new = jax.vmap(sim3_apply)(corr[ref], m.pt_xyz)
        m = m._replace(
            pt_xyz=jnp.where(pt_in_group[:, None], X_new, m.pt_xyz),
            kf_Tcw=jnp.where(
                group_mask[:, None, None],
                jax.vmap(se3_from_sim3)(S_new_all),
                m.kf_Tcw,
            ),
        )

        # ---- SearchAndFuse: project loop-side points into the corrected
        # group keyframes and merge duplicate landmarks
        covw_c = np.asarray(covisibility_weights(m, jnp.asarray([cand]))[0])
        loop_side = set(np.nonzero(covw_c >= 15)[0].tolist()) | {cand}
        loop_pts_mask = np.zeros(P, bool)
        kf_pt_np = np.asarray(m.kf_pt_idx)
        for g in loop_side:
            pts = kf_pt_np[g]
            loop_pts_mask[pts[pts >= 0]] = True
        loop_pts = jnp.asarray(loop_pts_mask) & m.pt_valid

        for g in sorted(group):
            frame_g = _kf_as_frame(m, g)
            pmf = search_by_projection(
                self.cam, m.kf_Tcw[g],
                m.pt_xyz, m.pt_desc, loop_pts,
                m.pt_normal, m.pt_min_dist, m.pt_max_dist,
                jnp.arange(P, dtype=jnp.int32),
                frame_g, radius=4.0, check_view_cos=False,
                max_candidates=min(P, 8192),
            )
            # replace: features that matched a loop point adopt it
            row = m.kf_pt_idx[g]
            new_row = jnp.where(pmf.feat_pt >= 0, pmf.feat_pt, row)
            m = m._replace(kf_pt_idx=m.kf_pt_idx.at[g].set(new_row))

        # ---- essential graph optimization
        S_nodes = sim3_from_se3(m.kf_Tcw)  # post-correction poses
        edges_i, edges_j, meas = [], [], []
        valid_ids = np.nonzero(valid_np)[0]
        S_old_np = S_old_all  # pre-correction sim3 poses (device array)

        def rel(i, j, S_all):
            return sim3_compose(S_all[j], sim3_inverse(S_all[i]))

        # spanning-tree edges (reference: the essential graph's backbone
        # is parent->child edges; KeyFrame::GetParent)
        parent_np = np.asarray(m.kf_parent)
        seen_pairs = set()
        prev = -1
        for b in valid_ids:
            a = int(parent_np[b])
            if a < 0 or not valid_np[a]:
                # rootless node (e.g. map start or orphaned by culling):
                # chain to the previous keyframe so the graph stays
                # connected
                a = prev
            if a >= 0 and a != int(b):
                key = (min(a, int(b)), max(a, int(b)))
                if key not in seen_pairs:
                    seen_pairs.add(key)
                    edges_i.append(a)
                    edges_j.append(int(b))
            prev = int(b)
        # previous loop-closure edges (KeyFrame::mspLoopEdges)
        loop_np = np.asarray(m.kf_loop_edge)
        for a in valid_ids:
            b = int(loop_np[a])
            if b >= 0 and valid_np[b]:
                key = (min(int(a), b), max(int(a), b))
                if key not in seen_pairs:
                    seen_pairs.add(key)
                    edges_i.append(int(a))
                    edges_j.append(b)
        # strong covisibility edges
        Wfull = np.asarray(covisibility_weights(m))
        strong = np.argwhere(np.triu(Wfull, 1) >= COVIS_EDGE_MIN)
        for a, b in strong:
            key = (min(int(a), int(b)), max(int(a), int(b)))
            if key in seen_pairs:
                continue
            seen_pairs.add(key)
            edges_i.append(int(a))
            edges_j.append(int(b))
        n_pre = len(edges_i)
        # measurements from PRE-correction poses
        ei = jnp.asarray(edges_i, jnp.int32)
        ej = jnp.asarray(edges_j, jnp.int32)
        meas = jax.vmap(lambda a, b: rel(a, b, S_old_np))(ei, ej)
        # loop edge with the measured Sim3 (post-correction relative)
        loop_meas = rel(
            jnp.asarray(cand), jnp.asarray(kf_id), S_nodes
        )[None]
        ei = jnp.concatenate([ei, jnp.asarray([cand], jnp.int32)])
        ej = jnp.concatenate([ej, jnp.asarray([kf_id], jnp.int32)])
        meas = jnp.concatenate([meas, loop_meas])

        ei, ej, meas, evalid, cap = _pad_edges(ei, ej, meas)

        fixed = jnp.zeros(K, bool).at[cand].set(True)
        S_opt = optimize_essential_graph(
            S_nodes, m.kf_valid, fixed, ei, ej, meas, evalid,
            jnp.ones(cap), fix_scale=self.fix_scale,
        )

        # recover SE3 + correct every point through its reference KF
        corr2 = jax.vmap(
            lambda new, old: sim3_compose(sim3_inverse(new), old)
        )(S_opt, S_nodes)
        ref = jnp.clip(m.pt_ref_kf, 0)
        X2 = jax.vmap(sim3_apply)(corr2[ref], m.pt_xyz)
        ok_pt = m.pt_valid & (m.pt_ref_kf >= 0)
        m = m._replace(
            pt_xyz=jnp.where(ok_pt[:, None], X2, m.pt_xyz),
            kf_Tcw=jnp.where(
                m.kf_valid[:, None, None],
                jax.vmap(se3_from_sim3)(S_opt),
                m.kf_Tcw,
            ),
        )

        # record the loop edge for future essential-graph optimizations
        # (reference: mpCurrentKF->AddLoopEdge / mpMatchedKF->AddLoopEdge)
        m = add_loop_edge(
            m, jnp.asarray(kf_id, jnp.int32), jnp.asarray(cand, jnp.int32)
        )

        # ---- global BA (reference launches RunGlobalBundleAdjustment)
        m = self._global_ba(m)
        return m

    # ------------------------------------------------------------------
    def _global_ba(self, m: MapState, iters: int = 12):
        """Full-map BA after a loop closure (reference
        RunGlobalBundleAdjustment -> Optimizer::BundleAdjustment, 10-20
        LM iterations). Records the robust-cost reduction in
        `self.last_gba_cost` as convergence evidence (device futures —
        reading them does not force a sync here)."""
        K, N = m.kf_pt_idx.shape
        cam_ids = jnp.arange(K, dtype=jnp.int32)
        uvr = jnp.concatenate([m.kf_uv, m.kf_ur[..., None]], axis=-1)
        obs_ok = (m.kf_pt_idx >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
        level_sigma2 = 1.2 ** (
            2.0 * m.kf_level.astype(jnp.float32)
        )
        prob = BAProblem(
            cam_Tcw=m.kf_Tcw,
            cam_fixed=(jnp.arange(K) == 0) | ~m.kf_valid,
            pt_xyz=m.pt_xyz,
            pt_valid=m.pt_valid,
            obs_cam=jnp.broadcast_to(
                cam_ids[:, None], (K, N)
            ).reshape(-1),
            obs_pt=jnp.clip(m.kf_pt_idx, 0).reshape(-1),
            obs_uvr=uvr.reshape(-1, 3),
            obs_isig2=(1.0 / level_sigma2).reshape(-1),
            obs_valid=obs_ok.reshape(-1),
        )
        res = bundle_adjust(
            prob, self.cam, iters1=4, iters2=iters - 4, solver="cg",
            cg_iters=40,
        )
        cost_before = _gba_cost_device(prob, self.cam)
        self.last_gba_cost = (cost_before, res.cost)
        return m._replace(
            kf_Tcw=jnp.where(
                m.kf_valid[:, None, None], res.cam_Tcw, m.kf_Tcw
            ),
            pt_xyz=jnp.where(m.pt_valid[:, None], res.pt_xyz, m.pt_xyz),
        )
