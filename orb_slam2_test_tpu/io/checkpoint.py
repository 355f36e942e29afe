"""Map checkpoint / resume.

The reference has NO map save/load (a well-known gap of canonical
ORB-SLAM2 — SURVEY.md section 5.4; popular forks bolt on boost
serialization). Here the whole map is one pytree of arrays, so a
checkpoint is a single npz: every MapState leaf + host-side tracker
state. Sessions can be saved mid-run and resumed, including in
localization-only mode against a frozen map.
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from orb_slam2_test_tpu.slam_map.mapstate import MapCapacity, MapState

_FORMAT_VERSION = 2  # v2: spanning tree (kf_parent/kf_loop_edge/kf_Tcp)


def save_map(path: str, m: MapState, cap: MapCapacity, meta: dict | None = None):
    """Write a MapState (+ capacity + arbitrary JSON-able metadata)."""
    arrays = {f"map/{k}": np.asarray(v) for k, v in zip(m._fields, m)}
    header = {
        "version": _FORMAT_VERSION,
        "capacity": {
            "max_keyframes": cap.max_keyframes,
            "max_features": cap.max_features,
            "max_points": cap.max_points,
            "n_levels": cap.n_levels,
            "scale_factor": cap.scale_factor,
        },
        "meta": meta or {},
    }
    np.savez_compressed(
        path, __header__=np.frombuffer(
            json.dumps(header).encode(), dtype=np.uint8
        ), **arrays
    )


def load_map(path: str) -> tuple[MapState, MapCapacity, dict]:
    """Read back (MapState, MapCapacity, meta)."""
    with np.load(path) as z:
        header = json.loads(bytes(z["__header__"]).decode())
        if header["version"] != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported checkpoint version {header['version']}"
            )
        leaves = {}
        for f in MapState._fields:
            leaves[f] = jnp.asarray(z[f"map/{f}"])
    cap = MapCapacity(**header["capacity"])
    return MapState(**leaves), cap, header["meta"]


def save_tracker(path: str, tracker) -> None:
    """Checkpoint a full Tracker: map + host state + trajectory."""
    tracker.drain_backend()  # keyframe pipeline + pending GBA chunks
    cam = tracker.cam
    meta = {
        "camera": {
            "fx": float(cam.fx), "fy": float(cam.fy),
            "cx": float(cam.cx), "cy": float(cam.cy),
            "k1": float(cam.k1), "k2": float(cam.k2),
            "p1": float(cam.p1), "p2": float(cam.p2),
            "k3": float(cam.k3), "bf": float(cam.bf),
            "width": int(cam.width), "height": int(cam.height),
        },
        "state": tracker.state,
        "ts0": tracker._ts0,
        "ref_kf": int(tracker.ref_kf),
        "ref_kf_tracked": int(tracker.ref_kf_tracked),
        "frames_since_kf": int(tracker.frames_since_kf),
        "frame_id": int(tracker.frame_id),
        "stats": tracker.stats,
        "last_Tcw": np.asarray(tracker.last_Tcw).tolist(),
        "trajectory_t": [t for t, _ in tracker.trajectory],
        "trajectory_T": [np.asarray(T).tolist() for _, T in tracker.trajectory],
        # loop-consistent relative trajectory (Tracker.export_trajectory
        # recomputes absolute poses from these against optimized KF poses)
        "rel_t": [t for t, _, _ in tracker.rel_trajectory],
        "rel_ref": [int(r) for _, r, _ in tracker.rel_trajectory],
        "rel_T": [np.asarray(T).tolist() for _, _, T in tracker.rel_trajectory],
    }
    save_map(path, tracker.map, tracker.cap, meta)


def load_tracker(path: str, tracker) -> None:
    """Restore a Tracker in place from a checkpoint written by
    save_tracker. The tracker must be constructed with the same
    capacities (enforced)."""
    m, cap, meta = load_map(path)
    if cap != tracker.cap:
        # capacities may differ because maps grow at runtime
        # (power-of-two re-bucketing, mapstate.grow_map). Adopt the
        # elementwise-max capacity; only the feature/pyramid geometry
        # must match exactly.
        import dataclasses

        from orb_slam2_test_tpu.slam_map.mapstate import grow_map

        if (
            cap.max_features != tracker.cap.max_features
            or cap.n_levels != tracker.cap.n_levels
            or cap.scale_factor != tracker.cap.scale_factor
        ):
            raise ValueError(
                f"checkpoint capacity {cap} incompatible with tracker "
                f"capacity {tracker.cap} (feature/pyramid geometry)"
            )
        tracker.cfg = dataclasses.replace(
            tracker.cfg,
            max_keyframes=max(cap.max_keyframes, tracker.cap.max_keyframes),
            max_points=max(cap.max_points, tracker.cap.max_points),
        )
        tracker.cap = tracker.cfg.map_capacity
        if cap != tracker.cap:
            m = grow_map(m, cap, tracker.cap)
    tracker.map = m
    tracker._obs_bm = None  # covisibility index cache: rebuild lazily
    tracker._n_pt_host = int(np.sum(np.asarray(m.pt_valid)))
    tracker.n_live_kf = int(np.sum(np.asarray(m.kf_valid)))
    tracker.state = meta["state"]
    tracker._ts0 = meta.get("ts0")
    tracker.ref_kf = meta["ref_kf"]
    tracker.ref_kf_tracked = meta["ref_kf_tracked"]
    tracker.frames_since_kf = meta["frames_since_kf"]
    tracker.frame_id = meta["frame_id"]
    tracker.stats = meta["stats"]
    tracker.last_Tcw = np.asarray(meta["last_Tcw"])
    tracker._prev_Tcw = tracker.last_Tcw.copy()
    tracker.trajectory = [
        (t, np.asarray(T))
        for t, T in zip(meta["trajectory_t"], meta["trajectory_T"])
    ]
    tracker.rel_trajectory = [
        (t, r, np.asarray(T))
        for t, r, T in zip(meta["rel_t"], meta["rel_ref"], meta["rel_T"])
    ]
    tracker.velocity = None
    tracker.last_frame = None
    tracker.last_feat_pt = None
    tracker.cur_feat_pt = None
    # deferred-backend state belongs to the PREVIOUS map: a pending
    # (kf, culled) pair or a stale relative-pose anchor must not be
    # flushed against the restored one (wrong DB erase / loop-closing
    # target, mis-anchored first motion prediction)
    tracker._pending_kf = None
    tracker._T_cr_last = None
    tracker._ref_is_new_kf = False
    tracker._ref_Tcw_host = None
    tracker._warned_kf_capacity = False
    # the keyframe database must be rebuilt from the restored map when
    # place recognition is enabled (BoW word lists are derivable state)
    if tracker.loop_closer is not None:
        tracker.loop_closer.rebuild_from_map(m)
