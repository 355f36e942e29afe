"""Unit tests for the TrackLocalMap K1/K2 local keyframe set
(reference Tracking::UpdateLocalKeyFrames: K1 = keyframes sharing
points with the current frame, K2 = neighbors of K1; cap 80) and for
the tracker's keyframe-capacity guard."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_test_tpu.engine.tracking import (
    Tracker,
    TrackerConfig,
    _local_keyframe_point_set,
)
from orb_slam2_test_tpu.slam_map.mapstate import (
    MapCapacity,
    add_keyframe,
    make_empty_map,
)

CAP = MapCapacity(max_keyframes=8, max_features=32, max_points=64)


def _kf_frame(pts):
    N = CAP.max_features
    pt_idx = np.full((N,), -1, np.int32)
    pt_idx[: len(pts)] = pts
    return (
        jnp.zeros((N, 2)),
        jnp.zeros((N,), jnp.int32),
        jnp.zeros((N,)),
        jnp.full((N,), -1.0),
        jnp.full((N,), -1.0),
        jnp.zeros((N, 8), jnp.uint32),
        jnp.asarray(np.arange(N) < len(pts)),
        jnp.asarray(pt_idx),
    )


def test_local_keyframe_point_set_k1_k2():
    m = make_empty_map(CAP)
    # KF0: points 0..19. KF1: points 4..19 (16 shared with KF0) + 30..33
    # exclusive. KF2: points 15..19 (only 5 shared) + 40..43 exclusive.
    m, k0 = add_keyframe(m, jnp.eye(4), 0.0, 0, *_kf_frame(list(range(20))))
    m, k1 = add_keyframe(
        m, jnp.eye(4), 1.0, 1, *_kf_frame(list(range(4, 20)) + [30, 31, 32, 33])
    )
    m, k2 = add_keyframe(
        m, jnp.eye(4), 2.0, 2, *_kf_frame(list(range(15, 20)) + [40, 41, 42, 43])
    )
    live = list(range(20)) + [30, 31, 32, 33, 40, 41, 42, 43]
    m = m._replace(pt_valid=m.pt_valid.at[jnp.asarray(live)].set(True))

    # the current frame matched points 0..3 — observed by KF0 ONLY
    cur_feat_pt = jnp.full((CAP.max_features,), -1, jnp.int32)
    cur_feat_pt = cur_feat_pt.at[jnp.arange(4)].set(jnp.arange(4))

    from orb_slam2_test_tpu.slam_map.covisibility import (
        build_observer_bitmap,
    )

    obs_bm = build_observer_bitmap(m)
    vw, vkf, pmask = _local_keyframe_point_set(
        m, obs_bm, cur_feat_pt, 4, 4
    )
    vw, vkf, pmask = np.asarray(vw), np.asarray(vkf), np.asarray(pmask)

    # K1 = {KF0} (only it observes the frame's matched points)
    assert vkf[0] == 0 and vw[0] == 4
    assert (vw[1:] == 0).all()
    # K2 = {KF1}: 16 >= 15 shared landmarks with K1's point set; its
    # exclusive points 30..33 enter the local point set
    assert pmask[30] and pmask[31] and pmask[32] and pmask[33]
    # KF2 shares only 5 < 15 landmarks: its exclusive points stay out
    assert not pmask[40] and not pmask[41]
    # K1's own points are in
    assert pmask[:20].all()


@pytest.mark.slow
def test_tracker_keyframe_capacity_growth(rng):
    """Run a synthetic sequence with a keyframe capacity too small for
    it: the tracker must GROW the map (power-of-two re-bucketing —
    reference Map.cc is heap-unbounded) instead of refusing insertions,
    keep the gauge keyframe 0 alive, and keep tracking."""
    from orb_slam2_test_tpu.utils.synthetic import (
        default_camera,
        make_sequence,
    )

    cam = default_camera(320, 240)
    n_frames = 12
    cam, poses_gt, landmarks, images = make_sequence(
        rng, n_frames, cam=cam, n_landmarks=160,
        step=np.array([0.12, 0.01, 0.0, 0.001, 0.003, 0.001]),
    )
    cfg = TrackerConfig(
        n_features=400,
        max_keyframes=4,  # far below what the sequence wants
        max_points=4096,
        local_kf_cap=4,
        ba_fixed_cap=2,
        ba_pt_cap=1024,
        n_triangulate_neighbors=2,
        min_init_matches=40,
        min_init_triangulated=30,
        max_frames_between_kf=2,  # aggressive insertion cadence
        min_local_inliers=20,
        enable_kf_culling=False,  # growth must not rely on culling
    )
    tracker = Tracker(cam, cfg)
    for i, img in enumerate(images):
        tracker.process_image_mono(img, float(i) / 30.0)

    m = tracker.map
    assert bool(m.kf_valid[0])  # gauge anchor survived
    assert tracker.cfg.max_keyframes > 4  # capacity grew
    assert m.kf_valid.shape[0] == tracker.cfg.max_keyframes
    assert int(m.n_kf) > 4  # more keyframes than the original cap
    assert int(m.n_kf) == tracker.n_live_kf
    assert tracker.state == "OK"
    # frame 0's keyframe data intact (timestamp of the first keyframe
    # is from the init pair, not a late overwrite)
    assert float(m.kf_timestamp[0]) < 0.2
