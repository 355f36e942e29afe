"""System facade + io layer tests.

Covers the reference's L5/L6 surface (include/System.h, src/System.cc;
Examples/* drivers): settings YAML parsing (cv::FileStorage dialect),
trajectory export formats (SaveTrajectoryTUM/KITTI), the ATE evaluation
the reference delegates to the TUM benchmark tools, and — beyond the
reference — map checkpoint/resume and localization-only mode.
"""

import os

import numpy as np
import pytest

from orb_slam2_test_tpu.evaluation.ate import (
    absolute_trajectory_error,
    relative_pose_error,
    umeyama_alignment,
)
from orb_slam2_test_tpu.io.settings import (
    SlamSettings,
    load_settings,
    save_settings,
)
from orb_slam2_test_tpu.io import trajectory as traj_io
from orb_slam2_test_tpu.utils.synthetic import default_camera, make_sequence

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def random_trajectory(rng, n=20, c2w=False):
    """[(t, Tcw)] random smooth trajectory."""
    from orb_slam2_test_tpu.io.trajectory import quat_to_rot

    out = []
    for i in range(n):
        q = rng.normal(size=4)
        T = np.eye(4)
        T[:3, :3] = quat_to_rot(q)
        T[:3, 3] = rng.normal(size=3)
        out.append((float(i) * 0.1, T if not c2w else np.linalg.inv(T)))
    return out


# ----------------------------------------------------------------------
# Settings (reference Examples/*/TUM1.yaml etc., parsed like
# cv::FileStorage in Tracking::Tracking)
# ----------------------------------------------------------------------
def test_settings_tum1():
    s = load_settings(os.path.join(CONFIG_DIR, "TUM1.yaml"))
    assert abs(s.fx - 517.306408) < 1e-5
    assert abs(s.cy - 255.313989) < 1e-5
    assert s.n_features == 1000
    assert s.n_levels == 8
    assert s.ini_th_fast == 20 and s.min_th_fast == 7
    assert abs(s.depth_map_factor - 5000.0) < 1e-9
    assert s.width == 640 and s.height == 480
    cam = s.camera
    assert cam.fx == s.fx and cam.width == 640


def test_settings_kitti_stereo():
    s = load_settings(os.path.join(CONFIG_DIR, "KITTI00-02.yaml"))
    assert s.bf > 100.0  # baseline*fx
    assert s.n_features == 2000
    assert s.th_depth == 35.0


def test_settings_euroc_rectification():
    s = load_settings(os.path.join(CONFIG_DIR, "EuRoC.yaml"))
    assert s.rectification is not None
    # post-rectification intrinsics come from LEFT.P
    P = s.rectification["LEFT.P"]
    assert abs(s.fx - P[0, 0]) < 1e-9
    assert s.k1 == 0.0  # rectified stream is distortion-free
    assert s.rectification["LEFT.K"].shape == (3, 3)


def test_settings_roundtrip(tmp_path):
    s = SlamSettings(fx=321.5, bf=40.0, n_features=1234, max_keyframes=64)
    p = str(tmp_path / "s.yaml")
    save_settings(s, p)
    s2 = load_settings(p)
    assert s2.fx == s.fx and s2.bf == s.bf
    assert s2.n_features == 1234 and s2.max_keyframes == 64


# ----------------------------------------------------------------------
# Trajectory formats (reference System::SaveTrajectory{TUM,KITTI})
# ----------------------------------------------------------------------
def test_trajectory_tum_roundtrip(tmp_path, rng):
    traj = random_trajectory(rng, 15)
    p = str(tmp_path / "traj.txt")
    traj_io.save_trajectory_tum(p, traj)
    back = traj_io.load_trajectory_tum(p)  # returns Twc
    assert len(back) == 15
    for (t0, Tcw), (t1, Twc) in zip(traj, back):
        assert abs(t0 - t1) < 1e-6
        np.testing.assert_allclose(np.linalg.inv(Tcw), Twc, atol=1e-5)


def test_trajectory_kitti_roundtrip(tmp_path, rng):
    traj = random_trajectory(rng, 10)
    p = str(tmp_path / "traj_kitti.txt")
    traj_io.save_trajectory_kitti(p, traj)
    back = traj_io.load_trajectory_kitti(p)
    assert len(back) == 10
    for (_, Tcw), (_, Twc) in zip(traj, back):
        np.testing.assert_allclose(np.linalg.inv(Tcw)[:3], Twc[:3], atol=1e-6)


def test_quat_conversions(rng):
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = traj_io.quat_to_rot(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        q2 = traj_io._rot_to_quat(R)
        # q and -q are the same rotation
        assert min(np.linalg.norm(q2 - q), np.linalg.norm(q2 + q)) < 1e-9


# ----------------------------------------------------------------------
# ATE / RPE evaluation (reference: external TUM benchmark scripts)
# ----------------------------------------------------------------------
def test_ate_sim3_invariance(rng):
    gt = random_trajectory(rng, 30, c2w=True)  # [(t, Twc)]
    # estimate = ground truth mapped through a random similarity
    s = 2.3
    _, R, _ = umeyama_alignment(
        rng.normal(size=(4, 3)), rng.normal(size=(4, 3))
    )
    t = rng.normal(size=3)
    est = []
    for ts, Twc in gt:
        c = s * R @ Twc[:3, 3] + t
        T = np.eye(4)
        T[:3, :3] = R @ Twc[:3, :3]
        T[:3, 3] = c
        est.append((ts, np.linalg.inv(T)))  # est is Tcw
    res = absolute_trajectory_error(est, gt, with_scale=True)
    assert res["rmse"] < 1e-9
    assert abs(res["scale"] - 1.0 / s) < 1e-9
    # SE3 alignment cannot undo the scale
    res_se3 = absolute_trajectory_error(est, gt, with_scale=False)
    assert res_se3["rmse"] > 0.1


def test_rpe_identity(rng):
    gt = random_trajectory(rng, 20, c2w=True)
    est = [(t, np.linalg.inv(T)) for t, T in gt]
    res = relative_pose_error(est, gt, delta=2)
    assert res["trans_rmse"] < 1e-9
    assert res["rot_rmse_deg"] < 1e-6


def test_associate_skips_far_timestamps(rng):
    gt = random_trajectory(rng, 10, c2w=True)
    est = [(t + 5.0, np.linalg.inv(T)) for t, T in gt]  # all offset
    res = absolute_trajectory_error(est, gt)
    assert res["n_pairs"] < 2 and res["rmse"] == float("inf")


# ----------------------------------------------------------------------
# System facade end-to-end (reference Examples/Monocular main loop)
# ----------------------------------------------------------------------
@pytest.mark.slow
def test_system_mono_e2e_with_checkpoint(tmp_path, rng):
    from orb_slam2_test_tpu.system import System, MONOCULAR

    cam = default_camera(320, 240)
    n_frames = 10
    cam, poses_gt, landmarks, images = make_sequence(
        rng, n_frames, cam=cam, n_landmarks=160,
        step=np.array([0.12, 0.01, 0.0, 0.001, 0.003, 0.001]),
    )
    settings = SlamSettings(
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        width=cam.width, height=cam.height,
        n_features=400, max_keyframes=32, max_points=4096,
        local_kf_cap=8, ba_pt_cap=1024, fps=10.0,
    )
    # init thresholds scaled down for the small synthetic scene (the
    # defaults match the reference's constants at 1000-2000 features)
    overrides = dict(
        ba_fixed_cap=4, n_triangulate_neighbors=2, min_init_matches=40,
        min_init_triangulated=30, max_frames_between_kf=4,
        min_local_inliers=20,
    )
    sys_ = System(settings, sensor=MONOCULAR, **overrides)
    with pytest.raises(RuntimeError):
        sys_.track_stereo(images[0], images[0], 0.0)

    split = 7
    for i in range(split):
        sys_.track_monocular(images[i], 0.1 * i)
    assert sys_.tracking_state == "OK"
    st = sys_.timing_stats()
    assert st["n"] == split and st["median_s"] > 0

    # checkpoint mid-run, restore into a FRESH system, finish the run
    ckpt = str(tmp_path / "map.npz")
    sys_.save_checkpoint(ckpt)
    sys2 = System(settings, sensor=MONOCULAR, **overrides)
    sys2.load_checkpoint(ckpt)
    assert sys2.tracking_state == "OK"
    assert sys2.tracker.stats["n_kf"] == sys_.tracker.stats["n_kf"]
    for i in range(split, n_frames):
        sys2.track_monocular(images[i], 0.1 * i)
    assert sys2.tracking_state == "OK"
    sys2.shutdown()

    # exports
    traj_p = str(tmp_path / "CameraTrajectory.txt")
    kf_p = str(tmp_path / "KeyFrameTrajectory.txt")
    sys2.save_trajectory_tum(traj_p)
    sys2.save_keyframe_trajectory_tum(kf_p)
    est = traj_io.load_trajectory_tum(traj_p)
    # trajectory starts at mono initialization (needs parallax)
    assert len(est) >= n_frames - 5
    assert len(traj_io.load_trajectory_tum(kf_p)) >= 2

    # accuracy: mono → Sim3-aligned ATE vs ground truth
    gt = [(0.1 * i, np.linalg.inv(poses_gt[i])) for i in range(n_frames)]
    res = absolute_trajectory_error(
        sys2.tracker.export_trajectory(), gt, with_scale=True
    )
    assert res["n_pairs"] == len(est)
    # restore drops the motion model (velocity/last frame), so the first
    # post-restore frame re-tracks vs the reference KF — slightly looser
    # than the uninterrupted e2e bound (test_tracking_e2e: 0.1)
    assert res["rmse"] < 0.12, res

    # localization-only on the frozen map: no new keyframes
    sys2.activate_localization_mode()
    n_kf = sys2.tracker.stats["n_kf"]
    sys2.track_monocular(images[-1], 0.1 * n_frames)
    assert sys2.tracker.stats["n_kf"] == n_kf
    assert sys2.tracking_state == "OK"

    # reset clears everything (reference System::Reset)
    sys2.reset()
    assert sys2.tracking_state == "NOT_INITIALIZED"
    assert sys2.tracker.stats["n_kf"] == 0
    assert sys2.timing_stats()["n"] == 0
