"""End-to-end monocular tracking on a synthetic sequence.

The TPU-native analog of the reference's dataset integration runs
(SURVEY.md section 4): render a known scene along a known trajectory,
run the full Tracking pipeline, and check the estimated trajectory
against ground truth (ATE after Sim3-style alignment with scale, since
monocular SLAM has a free global scale).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_test_tpu.engine.tracking import Tracker, TrackerConfig
from orb_slam2_test_tpu.utils.synthetic import make_sequence, default_camera


def align_trajectory(est: np.ndarray, gt: np.ndarray):
    """Umeyama similarity alignment of camera centers (the standard
    mono-SLAM evaluation: ATE RMSE after Sim3 alignment, as in the TUM
    benchmark's evaluate_ate.py --scale).

    est, gt: [n, 3] camera centers. Returns (aligned est, ATE RMSE)."""
    mu_e, mu_g = est.mean(0), gt.mean(0)
    e, g = est - mu_e, gt - mu_g
    # cross-covariance (column-vector convention): Sigma = g^T e / n
    H = g.T @ e / len(e)
    U, S, Vt = np.linalg.svd(H)
    D = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        D[2, 2] = -1.0
    R = U @ D @ Vt  # rotation such that g ~ s R e
    var_e = (e**2).sum() / len(e)
    scale = np.trace(np.diag(S) @ D) / max(var_e, 1e-12)
    aligned = scale * (e @ R.T) + mu_g
    ate = np.sqrt(((aligned - gt) ** 2).sum(axis=1).mean())
    return aligned, ate


def centers_from_Tcw(Tcws):
    out = []
    for T in Tcws:
        R, t = T[:3, :3], T[:3, 3]
        out.append(-R.T @ t)
    return np.stack(out)


@pytest.mark.slow
def test_mono_tracking_synthetic_sequence(rng):
    cam = default_camera(320, 240)
    n_frames = 12
    cam, poses_gt, landmarks, images = make_sequence(
        rng, n_frames, cam=cam, n_landmarks=160,
        step=np.array([0.12, 0.01, 0.0, 0.001, 0.003, 0.001]),
    )
    cfg = TrackerConfig(
        n_features=400,
        max_keyframes=32,
        max_points=4096,
        local_kf_cap=8,
        ba_fixed_cap=4,
        ba_pt_cap=1024,
        n_triangulate_neighbors=2,
        min_init_matches=40,  # ~proportional to the reference's 100 @ 2000 feats
        min_init_triangulated=30,
        max_frames_between_kf=4,
        min_local_inliers=20,
    )
    tracker = Tracker(cam, cfg)
    for i, img in enumerate(images):
        tracker.process_image_mono(img, float(i) / 30.0)

    assert tracker.state == "OK", tracker.state
    traj = tracker.trajectory
    assert len(traj) >= n_frames - 5, f"only {len(traj)} frames tracked"

    # compare against ground truth at matching timestamps
    ts = [t for t, _ in traj]
    est_T = [T for _, T in traj]
    idx = [int(round(t * 30.0)) for t in ts]
    gt_T = [poses_gt[i] for i in idx]
    est_c = centers_from_Tcw(est_T)
    gt_c = centers_from_Tcw(gt_T)
    aligned, ate = align_trajectory(est_c, gt_c)
    # trajectory length ~ 0.12 * 11 = 1.3; ATE must be a small fraction
    assert ate < 0.1, f"ATE {ate}"
    assert tracker.stats["n_kf"] >= 3
