"""FrameDrawer: keypoint/status overlay on the current image
(reference src/FrameDrawer.cc: DrawFrame draws green squares on tracked
keypoints + a status bar with state and counts)."""

from __future__ import annotations

import numpy as np


def draw_frame(
    img: np.ndarray,
    uv: np.ndarray,
    tracked: np.ndarray,
    state: str = "OK",
    n_kf: int = 0,
    n_pts: int = 0,
) -> np.ndarray:
    """Render the tracking overlay.

    img [H, W] float grayscale; uv [N, 2] keypoints; tracked [N] bool
    (matched to a map point -> green, else blue like the reference's
    "visual odometry" points). Returns an RGB uint8 image with a status
    bar appended at the bottom.
    """
    import cv2

    H, W = img.shape[:2]
    rgb = cv2.cvtColor(
        np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_GRAY2BGR
    )
    uv = np.asarray(uv)
    tracked = np.asarray(tracked)
    r = 3
    for i in range(len(uv)):
        u, v = int(round(uv[i, 0])), int(round(uv[i, 1]))
        if not (0 <= u < W and 0 <= v < H):
            continue
        color = (0, 255, 0) if tracked[i] else (255, 100, 0)
        cv2.rectangle(rgb, (u - r, v - r), (u + r, v + r), color, 1)
    n_tracked = int(tracked.sum())
    bar = np.zeros((22, W, 3), np.uint8)
    text = (
        f"{state} | KFs: {n_kf} | MPs: {n_pts} | tracked: {n_tracked}"
    )
    cv2.putText(
        bar, text, (6, 15), cv2.FONT_HERSHEY_PLAIN, 1.0,
        (255, 255, 255), 1,
    )
    return np.concatenate([rgb, bar], axis=0)


def draw_tracker_frame(tracker) -> np.ndarray | None:
    """Convenience: overlay for a live Tracker's last frame."""
    f = tracker.last_frame
    if f is None:
        return None
    uv = np.asarray(f.uv_raw)
    valid = np.asarray(f.valid)
    if tracker.cur_feat_pt is not None:
        tracked = np.asarray(tracker.cur_feat_pt) >= 0
    else:
        tracked = np.zeros(len(uv), bool)
    # the tracker retains a host copy of the last raw image (reference
    # FrameDrawer::Update copies mImGray); blank canvas only when a
    # frame was never processed through an image entry point
    img = getattr(tracker, "last_image", None)
    if img is None:
        img = np.full(
            (tracker.cam.height, tracker.cam.width), 40.0, np.float32
        )
    else:
        img = np.asarray(img, np.float32)
    return draw_frame(
        img, uv[valid], tracked[valid],
        state=tracker.state,
        n_kf=int(tracker.stats["n_kf"]),
        n_pts=int(np.asarray(tracker.map.pt_valid).sum()),
    )
