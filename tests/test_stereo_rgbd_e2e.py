"""End-to-end stereo and RGB-D tracking on synthetic sequences."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_test_tpu.engine.tracking import Tracker, TrackerConfig
from orb_slam2_test_tpu.geometry.se3 import se3_exp
from orb_slam2_test_tpu.utils.synthetic import (
    _landmark_patches,
    default_camera,
    make_landmarks,
    render_frame,
)

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_tracking_e2e import align_trajectory, centers_from_Tcw  # noqa: E402


def _render_depth(cam, Tcw, landmarks, patch_r=15):
    """Depth image: nearest landmark depth at its patch footprint."""
    h, w = cam.height, cam.width
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = landmarks @ R.T + t
    z = pc[:, 2]
    u = cam.fx * pc[:, 0] / np.maximum(z, 0.1) + cam.cx
    v = cam.fy * pc[:, 1] / np.maximum(z, 0.1) + cam.cy
    depth = np.zeros((h, w), np.float32)
    zbuf = np.full((h, w), np.inf, np.float32)
    for ui, vi, zi in zip(u, v, z):
        if zi <= 0.1:
            continue
        x0, x1 = int(ui) - patch_r, int(ui) + patch_r + 1
        y0, y1 = int(vi) - patch_r, int(vi) + patch_r + 1
        x0, x1 = max(x0, 0), min(x1, w)
        y0, y1 = max(y0, 0), min(y1, h)
        if x0 >= x1 or y0 >= y1:
            continue
        sel = zbuf[y0:y1, x0:x1] > zi
        depth[y0:y1, x0:x1][sel] = zi
        zbuf[y0:y1, x0:x1][sel] = zi
    return depth


def _sequence(rng, n_frames, stereo=False):
    cam = default_camera(320, 240)
    if stereo:
        cam = cam._replace(bf=0.2 * cam.fx)  # 20 cm baseline
    landmarks = make_landmarks(rng, 160)
    inten = rng.uniform(140, 255, 160).astype(np.float32)
    patches = _landmark_patches(160)
    step = np.array([0.12, 0.01, 0.0, 0.001, 0.003, 0.001])
    frames = []
    poses = []
    baseline = cam.baseline
    for i in range(n_frames):
        Tcw = np.asarray(se3_exp(jnp.asarray(step * i, jnp.float32)))
        poses.append(Tcw)
        left = render_frame(cam, Tcw, landmarks, inten, patches=patches)
        if stereo:
            T_r = Tcw.copy()
            # right camera sits at +b on the left camera's x axis, so
            # camera-frame coordinates shift by -b: u_r = u_l - fx*b/z
            T_r[0, 3] -= baseline
            right = render_frame(cam, T_r, landmarks, inten, patches=patches)
            frames.append((left, right))
        else:
            depth = _render_depth(cam, Tcw, landmarks)
            frames.append((left, depth))
    return cam, np.stack(poses), frames


CFG = dict(
    n_features=400,
    max_keyframes=32,
    max_points=4096,
    local_kf_cap=8,
    ba_fixed_cap=4,
    ba_pt_cap=1024,
    n_triangulate_neighbors=2,
    min_depth_init_points=100,
    max_frames_between_kf=4,
    min_local_inliers=20,
    # the synthetic scene sits 4-10 m deep with an 0.08 m baseline; the
    # default ThDepth=35 (close < 2.8 m) would classify everything as
    # far and cap unmatched insertion at the 100 nearest (reference
    # CreateNewKeyFrame behavior) -- keep the whole scene "close" here
    th_depth=150.0,
)


@pytest.mark.slow
def test_rgbd_tracking(rng):
    cam, poses_gt, frames = _sequence(rng, 10, stereo=False)
    tracker = Tracker(cam._replace(bf=0.08 * cam.fx), TrackerConfig(**CFG))
    for i, (img, depth) in enumerate(frames):
        tracker.process_image_rgbd(img, depth, i / 30.0)
    assert tracker.state == "OK"
    traj = tracker.trajectory
    assert len(traj) >= 8
    idx = [int(round(t * 30.0)) for t, _ in traj]
    est_c = centers_from_Tcw([T for _, T in traj])
    gt_c = centers_from_Tcw([poses_gt[i] for i in idx])
    # RGB-D has metric scale: compare WITHOUT scale alignment
    err = np.linalg.norm(est_c - gt_c, axis=1)
    ate = np.sqrt((err**2).mean())
    assert ate < 0.06, f"ATE {ate}"


@pytest.mark.slow
def test_stereo_tracking(rng):
    cam, poses_gt, frames = _sequence(rng, 10, stereo=True)
    tracker = Tracker(cam, TrackerConfig(**CFG))
    for i, (left, right) in enumerate(frames):
        tracker.process_image_stereo(left, right, i / 30.0)
    assert tracker.state == "OK"
    traj = tracker.trajectory
    assert len(traj) >= 8
    idx = [int(round(t * 30.0)) for t, _ in traj]
    est_c = centers_from_Tcw([T for _, T in traj])
    gt_c = centers_from_Tcw([poses_gt[i] for i in idx])
    err = np.linalg.norm(est_c - gt_c, axis=1)
    ate = np.sqrt((err**2).mean())
    assert ate < 0.08, f"ATE {ate}"
