"""Quick end-to-end tier (`pytest -m quick_e2e`, budget < 60 s).

VERDICT round 2 asked for an integration tier cheap enough to run on
every change: the full `slow` tier (mono/stereo/RGB-D e2e, loop ring,
2-process dist-BA) costs ~9 minutes on the CPU mesh, so regressions in
the integration path were only caught at round boundaries. This module
runs the SAME production pipeline (Tracker with the fused per-frame
program, keyframe insertion, triangulation, fusion, local BA, culling)
on deliberately tiny shapes: small images, few features, few frames —
compile time dominates, so everything here shares one configuration to
compile each program exactly once.
"""

import numpy as np
import pytest

from orb_slam2_test_tpu.engine.tracking import Tracker, TrackerConfig
from orb_slam2_test_tpu.utils.synthetic import default_camera, make_sequence

import sys, os

sys.path.insert(0, os.path.dirname(__file__))
from test_tracking_e2e import align_trajectory, centers_from_Tcw  # noqa: E402


CFG = dict(
    n_features=400,
    max_keyframes=16,
    max_points=2048,
    local_kf_cap=4,
    local_k2_cap=8,
    ba_fixed_cap=2,
    ba_pt_cap=512,
    n_triangulate_neighbors=2,
    min_init_matches=30,
    min_init_triangulated=25,
    max_frames_between_kf=3,
    min_local_inliers=15,
    min_track_matches=12,
)


@pytest.mark.quick_e2e
def test_quick_mono_pipeline(rng):
    """Mono init + fused tracking + keyframe pipeline + trajectory
    export, 8 frames at 320x240 / 400 features."""
    cam = default_camera(320, 240)
    n_frames = 8
    cam, poses_gt, landmarks, images = make_sequence(
        rng, n_frames, cam=cam, n_landmarks=160,
        step=np.array([0.12, 0.01, 0.0, 0.001, 0.003, 0.001]),
    )
    tracker = Tracker(cam, TrackerConfig(**CFG))
    for i, img in enumerate(images):
        tracker.process_image_mono(img, float(i) / 30.0)

    assert tracker.state == "OK", tracker.state
    assert tracker.stats["n_kf"] >= 3
    traj = tracker.export_trajectory()
    assert len(traj) >= n_frames - 4
    idx = [int(round(t * 30.0)) for t, _ in traj]
    est_c = centers_from_Tcw([T for _, T in traj])
    gt_c = centers_from_Tcw([poses_gt[i] for i in idx])
    _, ate = align_trajectory(est_c, gt_c)
    # path length ~0.84; the quick tier checks sanity, not accuracy
    assert ate < 0.15, f"ATE {ate}"

    # checkpoint round-trip stays wired into the quick tier (save ->
    # fresh tracker -> load -> map intact)
    import tempfile

    from orb_slam2_test_tpu.io.checkpoint import load_tracker, save_tracker

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_tracker(path, tracker)
        t2 = Tracker(cam, TrackerConfig(**CFG))
        load_tracker(path, t2)
        assert t2.n_live_kf == tracker.n_live_kf
        assert t2._pending_kf is None
        np.testing.assert_allclose(
            np.asarray(t2.map.kf_Tcw), np.asarray(tracker.map.kf_Tcw)
        )
