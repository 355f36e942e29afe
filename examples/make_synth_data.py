"""Generate KITTI-scale synthetic datasets on disk.

Real TUM/KITTI/EuRoC data is not mounted in this environment, so the
accuracy validation (BASELINE.md configs) runs the UNMODIFIED example
drivers on synthetic closed-loop sequences with exact ground truth:

  python examples/make_synth_data.py kitti --out /data/synth_kitti \
      --frames 600                       # stereo, 1241x376, loop
  python examples/make_synth_data.py tum-mono --out /data/synth_tum
  python examples/make_synth_data.py tum-rgbd --out /data/synth_rgbd

Each command writes the dataset in the reference's on-disk format
(times.txt + image_0/1, or rgb.txt/depth.txt), a reference-format
settings YAML, and a TUM-format groundtruth.txt for ATE evaluation —
so `stereo_kitti.py <yaml> <dir> --groundtruth <gt>` runs end to end
exactly as it would on real KITTI (reference test strategy: SURVEY.md
section 4 — dataset runs ARE the test harness).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _write_png(path: str, img: np.ndarray) -> None:
    import cv2

    cv2.imwrite(path, np.clip(img, 0, 255).astype(np.uint8))


def _tracker_overrides(f, close_pts: bool) -> None:
    """Synthetic scenes carry fewer matchable blobs per frame than real
    imagery at the same feature budget; relax the init/track gates the
    same way the test suite does (tests/test_tracking_e2e.py)."""
    f.write("Tracker.minInitMatches: 60\n")
    f.write("Tracker.minInitTriangulated: 40\n")
    f.write("Tracker.minLocalInliers: 20\n")
    # synthetic textures decay fast with viewpoint (planar quads under
    # affine warp): relocalization after a blackout only works if the
    # nearest keyframe is a few frames away, so cap the KF interval
    # tighter than the reference's fps default
    f.write("Tracker.maxFramesBetweenKF: 5\n")
    if close_pts:
        f.write("Tracker.minDepthInitPoints: 150\n")





def _write_kitti_yaml(args, cam, d):
    yaml = os.path.join(d, "settings.yaml")
    with open(yaml, "w") as f:
        f.write("%YAML:1.0\n")
        f.write(f"Camera.fx: {cam.fx}\nCamera.fy: {cam.fy}\n")
        f.write(f"Camera.cx: {cam.cx}\nCamera.cy: {cam.cy}\n")
        f.write("Camera.k1: 0.0\nCamera.k2: 0.0\n")
        f.write("Camera.p1: 0.0\nCamera.p2: 0.0\n")
        f.write(f"Camera.width: {cam.width}\nCamera.height: {cam.height}\n")
        f.write(f"Camera.fps: {args.fps}\nCamera.bf: {cam.bf}\n")
        f.write("Camera.RGB: 1\nThDepth: 35.0\n")
        f.write(f"ORBextractor.nFeatures: {args.features}\n")
        f.write("ORBextractor.scaleFactor: 1.2\n")
        f.write("ORBextractor.nLevels: 8\n")
        f.write("ORBextractor.iniThFAST: 20\nORBextractor.minThFAST: 7\n")
        f.write(f"Map.maxKeyFrames: {args.max_keyframes}\n")
        f.write(f"Map.maxPoints: {args.max_points}\n")
        # dense stereo maps: 2000 feats x 16 covisible KFs exceeds the
        # 4096-point default local-BA window (VERDICT round 1)
        f.write("Tracker.localPtCap: 8192\n")
        f.write("Tracker.baPtCap: 8192\n")
        _tracker_overrides(f, close_pts=True)
    print(f"settings: {yaml}")


def _render_kitti_chunk(args_tuple):
    """Worker: render+write frames [lo, hi) of the deterministic loop
    sequence (scene/trajectory rebuilt identically from the seed in
    each process — streaming, no full-sequence buffering)."""
    (out_dir, lo, hi, n_frames, radius, revolutions, n_landmarks,
     seed, cam_kw, baseline) = args_tuple
    import cv2
    import numpy as np

    from orb_slam2_test_tpu.geometry.camera import PinholeCamera
    from orb_slam2_test_tpu.utils.synthetic import (
        make_loop_scene,
        make_loop_trajectory,
        render_frame,
    )

    cam = PinholeCamera(**cam_kw)
    poses = make_loop_trajectory(n_frames, radius, revolutions)
    rng = np.random.default_rng(seed)
    landmarks, intens, patches, normals, ref_dist = make_loop_scene(
        rng, n_landmarks, radius
    )
    T_rl = np.eye(4, dtype=np.float32)
    T_rl[0, 3] = -baseline
    kw = dict(patches=patches, normals=normals, ref_dist=ref_dist)
    for i in range(lo, hi):
        img = render_frame(cam, poses[i], landmarks, intens, **kw)
        cv2.imwrite(
            os.path.join(out_dir, "image_0", f"{i:06d}.png"),
            np.clip(img, 0, 255).astype(np.uint8),
        )
        imgR = render_frame(
            cam, T_rl @ poses[i], landmarks, intens, **kw
        )
        cv2.imwrite(
            os.path.join(out_dir, "image_1", f"{i:06d}.png"),
            np.clip(imgR, 0, 255).astype(np.uint8),
        )
        if (i - lo + 1) % 100 == 0:
            print(f"  worker[{lo}:{hi}]: {i - lo + 1}/{hi - lo}",
                  flush=True)
    return hi - lo


def gen_kitti(args) -> int:
    from orb_slam2_test_tpu.geometry.camera import PinholeCamera
    from orb_slam2_test_tpu.io import trajectory as traj_io
    from orb_slam2_test_tpu.utils.synthetic import render_loop_sequence

    rng = np.random.default_rng(args.seed)
    # KITTI 00 camera geometry (P0 of the odometry devkit)
    w, h = 1241, 376
    fx = 718.856
    baseline = 0.53716
    cam = PinholeCamera(
        fx=fx, fy=fx, cx=607.19, cy=185.22, width=w, height=h,
        bf=fx * baseline,
    )
    print(f"rendering {args.frames} stereo frames at {w}x{h} ...",
          flush=True)
    if args.workers > 1 and args.blackout_at < 0:
        # streaming multi-process render (the in-memory single-process
        # path needs hours at 4500+ frames)
        from concurrent.futures import ProcessPoolExecutor

        from orb_slam2_test_tpu.utils.synthetic import (
            make_loop_trajectory,
        )

        d = args.out
        os.makedirs(os.path.join(d, "image_0"), exist_ok=True)
        os.makedirs(os.path.join(d, "image_1"), exist_ok=True)
        cam_kw = dict(
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            width=cam.width, height=cam.height, bf=cam.bf,
        )
        W = args.workers
        bounds = np.linspace(0, args.frames, W + 1).astype(int)
        jobs = [
            (d, int(bounds[j]), int(bounds[j + 1]), args.frames,
             args.radius, args.revolutions, args.landmarks, args.seed,
             cam_kw, baseline)
            for j in range(W)
        ]
        with ProcessPoolExecutor(max_workers=W) as pool:
            list(pool.map(_render_kitti_chunk, jobs))
        poses = make_loop_trajectory(
            args.frames, args.radius, args.revolutions
        )
        times = [i / args.fps for i in range(args.frames)]
        with open(os.path.join(d, "times.txt"), "w") as f:
            f.write("\n".join(f"{t:.6e}" for t in times) + "\n")
        traj_io.save_trajectory_tum(
            os.path.join(d, "groundtruth.txt"),
            [(times[i], poses[i]) for i in range(args.frames)],
        )
        _write_kitti_yaml(args, cam, d)
        print(f"dataset at {d}")
        return 0
    seq = render_loop_sequence(
        rng, args.frames, cam, n_landmarks=args.landmarks,
        radius=args.radius, baseline=baseline,
        blackout=tuple(
            range(args.blackout_at, args.blackout_at + args.blackout_len)
        ) if args.blackout_at >= 0 else (),
        revolutions=args.revolutions,
    )
    d = args.out
    os.makedirs(os.path.join(d, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(d, "image_1"), exist_ok=True)
    times = []
    for i in range(args.frames):
        _write_png(os.path.join(d, "image_0", f"{i:06d}.png"),
                   seq["left"][i])
        _write_png(os.path.join(d, "image_1", f"{i:06d}.png"),
                   seq["right"][i])
        times.append(i / args.fps)
        if (i + 1) % 100 == 0:
            print(f"  {i + 1}/{args.frames} frames written", flush=True)
    with open(os.path.join(d, "times.txt"), "w") as f:
        f.write("\n".join(f"{t:.6e}" for t in times) + "\n")
    traj_io.save_trajectory_tum(
        os.path.join(d, "groundtruth.txt"),
        [(times[i], seq["poses"][i]) for i in range(args.frames)],
    )
    _write_kitti_yaml(args, cam, d)
    print(f"dataset at {d}")
    return 0


def gen_euroc(args) -> int:
    """EuRoC MAV on-disk layout: mav0/cam0/data/<ns>.png (+ cam1 for
    stereo) with nanosecond filenames, plus a reference-schema EuRoC
    yaml. Fills the one BASELINE config (EuRoC MH_01 mono) that had no
    synthetic dataset. Zero distortion: rectification maps become
    identity but the EuRoC driver's code path still runs."""
    from orb_slam2_test_tpu.geometry.camera import PinholeCamera
    from orb_slam2_test_tpu.io import trajectory as traj_io
    from orb_slam2_test_tpu.utils.synthetic import render_loop_sequence

    rng = np.random.default_rng(args.seed)
    w, h = 752, 480  # EuRoC cam geometry
    baseline = 0.11
    cam = PinholeCamera(
        fx=458.654, fy=457.296, cx=367.215, cy=248.375,
        width=w, height=h, bf=458.654 * baseline,
    )
    print(f"rendering {args.frames} frames at {w}x{h} ...", flush=True)
    seq = render_loop_sequence(
        rng, args.frames, cam, n_landmarks=args.landmarks,
        radius=args.radius, baseline=baseline,
    )
    d = args.out
    os.makedirs(os.path.join(d, "mav0", "cam0", "data"), exist_ok=True)
    os.makedirs(os.path.join(d, "mav0", "cam1", "data"), exist_ok=True)
    t0_ns = 1403636579763555584  # MH_01-style epoch
    gt = []
    for i in range(args.frames):
        ns = t0_ns + int(i * 1e9 / args.fps)
        _write_png(
            os.path.join(d, "mav0", "cam0", "data", f"{ns}.png"),
            seq["left"][i],
        )
        _write_png(
            os.path.join(d, "mav0", "cam1", "data", f"{ns}.png"),
            seq["right"][i],
        )
        gt.append((ns * 1e-9, seq["poses"][i]))
        if (i + 1) % 100 == 0:
            print(f"  {i + 1}/{args.frames} frames written", flush=True)
    with open(os.path.join(d, "mav0", "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i in range(args.frames):
            ns = t0_ns + int(i * 1e9 / args.fps)
            f.write(f"{ns},{ns}.png\n")
    traj_io.save_trajectory_tum(os.path.join(d, "groundtruth.txt"), gt)
    yaml = os.path.join(d, "settings.yaml")
    with open(yaml, "w") as f:
        f.write("%YAML:1.0\n")
        f.write(f"Camera.fx: {cam.fx}\nCamera.fy: {cam.fy}\n")
        f.write(f"Camera.cx: {cam.cx}\nCamera.cy: {cam.cy}\n")
        f.write("Camera.k1: 0.0\nCamera.k2: 0.0\n")
        f.write("Camera.p1: 0.0\nCamera.p2: 0.0\n")
        f.write(f"Camera.width: {w}\nCamera.height: {h}\n")
        f.write(f"Camera.fps: {args.fps}\nCamera.bf: {cam.bf}\n")
        f.write("Camera.RGB: 1\nThDepth: 35.0\n")
        f.write(f"ORBextractor.nFeatures: {args.features}\n")
        f.write("ORBextractor.scaleFactor: 1.2\n")
        f.write("ORBextractor.nLevels: 8\n")
        f.write("ORBextractor.iniThFAST: 20\nORBextractor.minThFAST: 7\n")
        f.write(f"Map.maxKeyFrames: {args.max_keyframes}\n")
        f.write(f"Map.maxPoints: {args.max_points}\n")
        _tracker_overrides(f, close_pts=False)
    print(f"dataset at {d} (settings: {yaml})")
    return 0


def gen_tum(args, rgbd: bool) -> int:
    from orb_slam2_test_tpu.geometry.camera import PinholeCamera
    from orb_slam2_test_tpu.io import trajectory as traj_io
    from orb_slam2_test_tpu.utils.synthetic import render_loop_sequence

    rng = np.random.default_rng(args.seed)
    w, h = 640, 480
    cam = PinholeCamera(
        fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=w, height=h,
        bf=(517.3 * 0.075 if rgbd else 0.0),  # TUM-like virtual baseline
    )
    print(f"rendering {args.frames} frames at {w}x{h} ...", flush=True)
    seq = render_loop_sequence(
        rng, args.frames, cam, n_landmarks=args.landmarks,
        radius=args.radius, with_depth=rgbd,
        blackout=tuple(
            range(args.blackout_at, args.blackout_at + args.blackout_len)
        ) if args.blackout_at >= 0 else (),
    )
    d = args.out
    os.makedirs(os.path.join(d, "rgb"), exist_ok=True)
    if rgbd:
        os.makedirs(os.path.join(d, "depth"), exist_ok=True)
    rows, drows = [], []
    for i in range(args.frames):
        ts = 1000.0 + i / args.fps
        p = f"rgb/{ts:.6f}.png"
        _write_png(os.path.join(d, p), seq["left"][i])
        rows.append(f"{ts:.6f} {p}")
        if rgbd:
            import cv2

            dp = f"depth/{ts:.6f}.png"
            d16 = np.clip(seq["depth"][i] * 5000.0, 0, 65535).astype(
                np.uint16
            )
            cv2.imwrite(os.path.join(d, dp), d16)
            drows.append(f"{ts:.6f} {dp}")
        if (i + 1) % 100 == 0:
            print(f"  {i + 1}/{args.frames} frames written", flush=True)
    with open(os.path.join(d, "rgb.txt"), "w") as f:
        f.write("# rgb\n# ts path\n" + "\n".join(rows) + "\n")
    if rgbd:
        with open(os.path.join(d, "depth.txt"), "w") as f:
            f.write("# depth\n# ts path\n" + "\n".join(drows) + "\n")
    traj_io.save_trajectory_tum(
        os.path.join(d, "groundtruth.txt"),
        [(1000.0 + i / args.fps, seq["poses"][i])
         for i in range(args.frames)],
    )
    yaml = os.path.join(d, "settings.yaml")
    with open(yaml, "w") as f:
        f.write("%YAML:1.0\n")
        f.write(f"Camera.fx: {cam.fx}\nCamera.fy: {cam.fy}\n")
        f.write(f"Camera.cx: {cam.cx}\nCamera.cy: {cam.cy}\n")
        f.write("Camera.k1: 0.0\nCamera.k2: 0.0\n")
        f.write("Camera.p1: 0.0\nCamera.p2: 0.0\n")
        f.write(f"Camera.width: {w}\nCamera.height: {h}\n")
        f.write(f"Camera.fps: {args.fps}\n")
        if rgbd:
            f.write(f"Camera.bf: {cam.bf}\n")
            f.write("DepthMapFactor: 5000.0\n")
        f.write("Camera.RGB: 1\nThDepth: 35.0\n")
        f.write(f"ORBextractor.nFeatures: {args.features}\n")
        f.write("ORBextractor.scaleFactor: 1.2\n")
        f.write("ORBextractor.nLevels: 8\n")
        f.write("ORBextractor.iniThFAST: 20\nORBextractor.minThFAST: 7\n")
        f.write(f"Map.maxKeyFrames: {args.max_keyframes}\n")
        f.write(f"Map.maxPoints: {args.max_points}\n")
        _tracker_overrides(f, close_pts=rgbd)
    print(f"dataset at {d} (settings: {yaml})")
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=("kitti", "tum-mono", "tum-rgbd", "euroc"))
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--landmarks", type=int, default=None)
    p.add_argument("--radius", type=float, default=None)
    p.add_argument("--fps", type=float, default=10.0)
    p.add_argument("--features", type=int, default=None)
    p.add_argument("--max-keyframes", type=int, default=None)
    p.add_argument("--max-points", type=int, default=None)
    p.add_argument("--blackout-at", type=int, default=-1,
                   help="first frame of a blank-image segment "
                        "(forces LOST -> relocalization)")
    p.add_argument("--blackout-len", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workers", type=int, default=1,
                   help="parallel render processes (kitti only; "
                        "streaming writes, no full-sequence buffering)")
    p.add_argument("--revolutions", type=float, default=1.08,
                   help="loop laps: 1.08 = one lap + 8%% revisit; >2 "
                        "gives a full second lap of continuous revisit "
                        "(repeated loop-closure events)")
    args = p.parse_args()

    if args.kind == "kitti":
        args.frames = args.frames or 600
        args.landmarks = args.landmarks or 6000
        args.radius = args.radius or 60.0
        args.features = args.features or 2000
        args.max_keyframes = args.max_keyframes or 384
        args.max_points = args.max_points or 131072
        return gen_kitti(args)
    if args.kind == "euroc":
        args.frames = args.frames or 300
        args.landmarks = args.landmarks or 3000
        args.radius = args.radius or 15.0
        args.features = args.features or 1000
        args.max_keyframes = args.max_keyframes or 256
        args.max_points = args.max_points or 65536
        return gen_euroc(args)
    args.frames = args.frames or 240
    args.landmarks = args.landmarks or 2500
    args.radius = args.radius or 12.0
    args.features = args.features or 1000
    args.max_keyframes = args.max_keyframes or 192
    args.max_points = args.max_points or 32768
    return gen_tum(args, rgbd=(args.kind == "tum-rgbd"))


if __name__ == "__main__":
    raise SystemExit(main())
