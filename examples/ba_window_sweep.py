"""Local-BA window-size sweep: ATE + timing vs LocalBACaps.n_local.

VERDICT r3 weak #7: the 16-keyframe local-BA window is a TPU
static-shape cap with no measurement of its accuracy cost versus the
reference's unbounded covisibility-local set (src/Optimizer.cc:~440
takes ALL covisible keyframes). This sweep runs the SAME sequence at
n_local in {16, 32, 64} and reports ATE RMSE, keyframe count and
per-frame/per-insert timing so the default is chosen on evidence.

  python examples/ba_window_sweep.py <dataset_dir> \
      --max-frames 700 --out runs/ba_window_sweep.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(dataset: str, n_local: int, max_frames: int | None,
            ba_pt_cap: int):
    from orb_slam2_test_tpu.evaluation import absolute_trajectory_error
    from orb_slam2_test_tpu.io.datasets import load_kitti
    from orb_slam2_test_tpu.io.settings import load_settings
    from orb_slam2_test_tpu.io.trajectory import load_trajectory_tum
    from orb_slam2_test_tpu.system import STEREO, System

    settings = load_settings(os.path.join(dataset, "settings.yaml"))
    seq = load_kitti(dataset, stereo=True)
    system = System(
        settings, STEREO, vocabulary="default",
        local_kf_cap=n_local,
        ba_fixed_cap=max(8, n_local // 2),
        ba_pt_cap=ba_pt_cap,
    )
    n = len(seq) if max_frames is None else min(len(seq), max_frames)
    t0 = time.time()
    frame_times = []
    for i, it in enumerate(seq.items[:n]):
        data = seq.load(it)
        f0 = time.time()
        system.track_stereo(data[1], data[2], data[0])
        frame_times.append(time.time() - f0)
        if (i + 1) % 200 == 0:
            print(f"  [n_local={n_local}] {i + 1}/{n} "
                  f"kf={system.tracker.stats['n_kf']}", flush=True)
    wall = time.time() - t0
    system.tracker.drain_backend()
    gt = load_trajectory_tum(os.path.join(dataset, "groundtruth.txt"))
    est = system.tracker.export_trajectory()
    res = absolute_trajectory_error(est, gt)
    out = {
        "n_local": n_local,
        "frames": n,
        "ate_rmse_m": round(float(res["rmse"]), 4),
        "ate_pairs": int(res["n_pairs"]),
        "keyframes": int(system.tracker.stats["n_kf"]),
        "loops": int(system.tracker.stats["loops"]),
        "lost_frames": int(system.tracker.stats["lost_frames"]),
        "median_frame_ms": round(
            float(np.median(frame_times)) * 1e3, 1
        ),
        "wall_s": round(wall, 1),
    }
    system.shutdown()
    return out


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset")
    p.add_argument("--windows", type=int, nargs="+", default=[16, 32, 64])
    p.add_argument("--max-frames", type=int, default=700)
    p.add_argument("--ba-pt-cap", type=int, default=8192)
    p.add_argument("--out", default="runs/ba_window_sweep.json")
    args = p.parse_args()

    rows = []
    for n_local in args.windows:
        print(f"=== n_local = {n_local}", flush=True)
        rows.append(
            run_one(args.dataset, n_local, args.max_frames,
                    args.ba_pt_cap)
        )
        print(json.dumps(rows[-1]), flush=True)
    report = {
        "metric": "local_ba_window_sweep",
        "dataset": args.dataset,
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"written to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
