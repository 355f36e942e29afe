"""Deferred (async) keyframe-pipeline parity.

The tracker overlaps the keyframe insertion pipeline with tracking by
deferring the host sync of the insertion program to the next keyframe
decision (reference: LocalMapping runs in its own pthread). The device
programs are identical either way, so with no loop closure in flight
the trajectory must be bit-identical between the deferred and the
synchronous mode.
"""

import numpy as np
import pytest

from orb_slam2_test_tpu.engine.tracking import Tracker, TrackerConfig
from orb_slam2_test_tpu.utils.synthetic import default_camera, make_sequence


def _run(images, cam, async_backend):
    cfg = TrackerConfig(
        n_features=400,
        max_keyframes=32,
        max_points=4096,
        local_kf_cap=8,
        ba_fixed_cap=4,
        ba_pt_cap=1024,
        n_triangulate_neighbors=2,
        min_init_matches=40,
        min_init_triangulated=30,
        max_frames_between_kf=4,
        min_local_inliers=20,
        async_backend=async_backend,
    )
    tracker = Tracker(cam, cfg)
    for i, img in enumerate(images):
        tracker.process_image_mono(img, float(i) / 30.0)
    tracker.flush_backend()
    return tracker


@pytest.mark.slow
def test_async_backend_trajectory_parity(rng):
    cam = default_camera(320, 240)
    cam, poses_gt, landmarks, images = make_sequence(
        rng, 12, cam=cam, n_landmarks=160,
        step=np.array([0.12, 0.01, 0.0, 0.001, 0.003, 0.001]),
    )
    t_sync = _run(images, cam, async_backend=False)
    t_async = _run(images, cam, async_backend=True)

    assert t_sync.stats == t_async.stats
    traj_s = t_sync.export_trajectory()
    traj_a = t_async.export_trajectory()
    assert len(traj_s) == len(traj_a) and len(traj_s) >= 7
    for (ts, Ts), (ta, Ta) in zip(traj_s, traj_a):
        assert ts == ta
        np.testing.assert_array_equal(np.asarray(Ts), np.asarray(Ta))
    # map state parity as well (poses + points)
    np.testing.assert_array_equal(
        np.asarray(t_sync.map.kf_valid), np.asarray(t_async.map.kf_valid)
    )
    np.testing.assert_array_equal(
        np.asarray(t_sync.map.kf_Tcw), np.asarray(t_async.map.kf_Tcw)
    )
