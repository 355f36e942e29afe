"""Integration tests: relocalization and loop closing on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_test_tpu.bow.vocabulary import build_vocabulary
from orb_slam2_test_tpu.engine.tracking import Tracker, TrackerConfig
from orb_slam2_test_tpu.geometry.se3 import se3_exp
from orb_slam2_test_tpu.utils.synthetic import (
    _landmark_patches,
    default_camera,
    make_landmarks,
    render_frame,
)

CFG = dict(
    n_features=400,
    max_keyframes=64,
    max_points=8192,
    local_kf_cap=8,
    ba_fixed_cap=4,
    ba_pt_cap=1024,
    n_triangulate_neighbors=2,
    min_depth_init_points=100,
    max_frames_between_kf=3,
    min_local_inliers=20,
    # synthetic scenes are meters deep with a tiny 0.08 m baseline; the
    # default ThDepth=35 would mark everything far and cap unmatched
    # insertion at 100 points per keyframe (see test_stereo_rgbd_e2e)
    th_depth=150.0,
    # the reference's 100/70 close-deficit constants assume 1000-2000
    # features; at 400 features they would insert a keyframe nearly
    # every frame, drowning the covisibility structure loop detection
    # keys on — scale them proportionally
    kf_close_tracked_max=40,
    kf_close_untracked_min=28,
)


def _rgbd_depth(cam, Tcw, landmarks, patch_r=15):
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
        x0, x1 = max(int(ui) - patch_r, 0), min(int(ui) + patch_r + 1, w)
        y0, y1 = max(int(vi) - patch_r, 0), min(int(vi) + patch_r + 1, h)
        if x0 >= x1 or y0 >= y1:
            continue
        sel = zbuf[y0:y1, x0:x1] > zi
        depth[y0:y1, x0:x1][sel] = zi
        zbuf[y0:y1, x0:x1][sel] = zi
    return depth


def _vocab_from_frames(tracker_cam, images, rng):
    """Train a vocabulary from the sequence's own descriptors
    (production would use a pre-trained vocabulary file). Samples
    frames across the whole sequence; a too-small vocabulary makes BoW
    retrieval noisy and loop candidates intermittent."""
    from orb_slam2_test_tpu.engine.frame import build_frame_mono

    descs = []
    step = max(len(images) // 6, 1)
    for img in images[::step][:6]:
        f = build_frame_mono(
            jnp.asarray(img, jnp.float32), 0.0, tracker_cam, n_features=400
        )
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    return build_vocabulary(np.concatenate(descs), k=10, depth=4, seed=0)


@pytest.mark.slow
def test_relocalization_after_blackout(rng):
    """Track, black out a few frames (tracking lost), then return to a
    previously seen view -> relocalization must recover the pose."""
    cam = default_camera(320, 240)
    cam = cam._replace(bf=0.08 * cam.fx)
    landmarks = make_landmarks(rng, 160)
    inten = rng.uniform(140, 255, 160).astype(np.float32)
    patches = _landmark_patches(160)
    step = np.array([0.10, 0.01, 0.0, 0.001, 0.003, 0.001])

    poses = [np.asarray(se3_exp(jnp.asarray(step * i, jnp.float32)))
             for i in range(8)]
    images = [render_frame(cam, T, landmarks, inten, patches=patches)
              for T in poses]
    depths = [_rgbd_depth(cam, T, landmarks) for T in poses]

    voc = _vocab_from_frames(cam, images, rng)
    # keyframe every frame: the map must exceed 5 keyframes before the
    # blackout, or losing tracking triggers the reference's
    # small-map auto-reset (Tracking::Track KeyFramesInMap()<=5 ->
    # Reset) instead of entering LOST/relocalization
    tracker = Tracker(
        cam, TrackerConfig(**{**CFG, "max_frames_between_kf": 1})
    )
    tracker.enable_place_recognition(voc, fix_scale=True)

    for i in range(6):
        tracker.process_image_rgbd(images[i], depths[i], i / 30.0)
    assert tracker.state == "OK"
    assert tracker.stats["n_kf"] > 5

    # blackout: two flat frames -> lost
    black = np.full_like(images[0], 16.0)
    for i in range(2):
        tracker.process_image_rgbd(black, np.zeros_like(depths[0]), (6 + i) / 30.0)
    assert tracker.state == "LOST"

    # revisit the pose of frame 2
    tracker.process_image_rgbd(images[2], depths[2], 9 / 30.0)
    assert tracker.state == "OK", "relocalization failed"
    assert tracker.stats["reloc"] >= 1
    est = tracker.current_pose()
    err = np.linalg.norm(est[:3, 3] - poses[2][:3, 3])
    assert err < 0.05, err


@pytest.mark.slow
def test_loop_closing_on_out_and_back(rng):
    """Out-and-back corridor: the camera travels far enough that the
    start leaves view, then returns. Revisiting the start must fire the
    loop detector and close the loop (loop closure is impossible when
    everything stays covisible, so the trajectory must leave)."""
    cam = default_camera(320, 240)
    cam = cam._replace(bf=0.08 * cam.fx)
    # cylindrical wall of landmarks around ring center (0, 0, R)
    R = 2.0
    n_lm = 500
    phi = rng.uniform(0, 2 * np.pi, n_lm)
    r = rng.uniform(R + 6.0, R + 7.0, n_lm)
    yy = rng.uniform(-3.0, 3.0, n_lm)
    landmarks = np.stack(
        [r * np.sin(phi), yy, R - r * np.cos(phi)], axis=1
    ).astype(np.float32)
    inten = rng.uniform(140, 255, n_lm).astype(np.float32)
    patches = _landmark_patches(n_lm)
    normals = -np.stack(
        [np.sin(phi), np.zeros(n_lm), -np.cos(phi)], axis=1
    ).astype(np.float32)

    n_frames = 120  # 1.25 revolutions: several revisit keyframes so the
    # 3-consecutive-detection consistency chain can complete
    poses, images, depths = [], [], []
    for i in range(n_frames):
        th = 2 * np.pi * i / 96
        C = np.array([R * np.sin(th), 0.0, R - R * np.cos(th)])
        zax = np.array([np.sin(th), 0.0, -np.cos(th)])  # outward radial
        yax = np.array([0.0, 1.0, 0.0])
        xax = np.cross(yax, zax)
        Rwc = np.stack([xax, yax, zax], axis=1)
        Twc = np.eye(4, dtype=np.float32)
        Twc[:3, :3] = Rwc
        Twc[:3, 3] = C
        T = np.linalg.inv(Twc).astype(np.float32)
        poses.append(T)
        img, dep = render_frame(
            cam, T, landmarks, inten, patches=patches, normals=normals,
            return_depth=True,
        )
        images.append(img)
        depths.append(dep)

    voc = _vocab_from_frames(cam, images, rng)
    tracker = Tracker(cam, TrackerConfig(**CFG))
    tracker.enable_place_recognition(voc, fix_scale=True, min_kf_gap=5)
    for i in range(n_frames):
        tracker.process_image_rgbd(images[i], depths[i], i / 30.0)

    assert len(tracker.trajectory) >= n_frames - 15
    # the loop detector must have fired when the ring closed
    assert tracker.stats["loops"] >= 1, "no loop closure detected"
