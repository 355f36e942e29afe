"""AR demo (reference Examples/ROS/ORB_SLAM2/src/AR/ros_mono_ar.cc +
ViewerAR.cc: track monocular, RANSAC-fit the dominant plane among the
tracked map points, anchor a virtual cube on it, render it over every
frame).

Headless: overlaid frames are written as PNGs to --out. Runs over a
TUM-format dataset directory (same input as mono_tum.py) or a live
spool directory.

Usage:
  python examples/ar_demo.py TUM1.yaml /data/rgbd_dataset_freiburg1_xyz \
      --out ar_out [--cube-size 0.1]
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

from _runner import common_parser
from orb_slam2_test_tpu.system import System, MONOCULAR
from orb_slam2_test_tpu.io.datasets import load_tum_mono
from orb_slam2_test_tpu.viz.ar import fit_plane_ransac, draw_ar_frame


def tracked_world_points(tracker) -> np.ndarray:
    """World positions of the map points matched in the current frame
    (what ViewerAR.cc collects via GetTrackedMapPoints)."""
    if tracker.cur_feat_pt is None:
        return np.zeros((0, 3))
    ids = np.asarray(tracker.cur_feat_pt)
    ids = ids[ids >= 0]
    if len(ids) == 0:
        return np.zeros((0, 3))
    xyz = np.asarray(tracker.map.pt_xyz)[ids]
    ok = np.asarray(tracker.map.pt_valid)[ids]
    return xyz[ok]


def main():
    p = common_parser(__doc__)
    p.add_argument("--out", default="ar_out")
    p.add_argument("--cube-size", type=float, default=0.1)
    p.add_argument("--refit-every", type=int, default=30,
                   help="re-detect the plane every N frames (the "
                        "reference recomputes on menu click)")
    args = p.parse_args()

    import cv2

    seq = load_tum_mono(args.sequence)
    system = System(args.settings, MONOCULAR, vocabulary=args.vocabulary)
    os.makedirs(args.out, exist_ok=True)

    n = len(seq) if args.max_frames is None else min(len(seq),
                                                     args.max_frames)
    plane = None
    rng = np.random.default_rng(0)
    for i, it in enumerate(seq.items[:n]):
        ts, img = seq.load(it)[:2]
        system.track_monocular(img, ts)
        tr = system.tracker
        if system.tracking_state == "OK":
            if plane is None or (i % args.refit_every == 0):
                pts = tracked_world_points(tr)
                cand = fit_plane_ransac(pts, rng=rng)
                if cand is not None and (
                    plane is None or cand.n_inliers > plane.n_inliers
                ):
                    plane = cand
                    print(f"  frame {i}: plane with "
                          f"{plane.n_inliers} inliers")
            uv = None
            if tr.last_frame is not None and tr.cur_feat_pt is not None:
                sel = np.asarray(tr.cur_feat_pt) >= 0
                uv = np.asarray(tr.last_frame.uv_raw)[sel]
            frame = draw_ar_frame(
                img, tr.last_Tcw, tr.cam, plane,
                cube_size=args.cube_size, tracked_uv=uv,
            )
        else:
            frame = draw_ar_frame(img, np.eye(4), tr.cam, None)
        cv2.imwrite(os.path.join(args.out, f"ar_{i:06d}.png"), frame)

    system.shutdown()
    print(f"{n} AR frames written to {args.out}/")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
