"""Shared driver loop for the example mains (reference Examples/*:
load images -> per-frame System::Track* -> timing stats -> trajectory
save). Each dataset script builds a Sequence + System and calls run()."""

from __future__ import annotations

import argparse
import os
import sys
import time

# allow running the scripts directly from a source checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from orb_slam2_test_tpu.system import System
from orb_slam2_test_tpu.io.datasets import Sequence


def common_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("settings", help="settings YAML (reference format)")
    p.add_argument("sequence", help="dataset sequence directory")
    p.add_argument(
        "--vocabulary", default="default",
        help="vocabulary path (.npz native or DBoW2 text). Default: the"
             " packaged artifact — loop closing + BoW relocalization "
             "are ON out of the box, as in the reference",
    )
    p.add_argument(
        "--no-vocabulary", dest="vocabulary",
        action="store_const", const=None,
        help="disable place recognition (no loop closing / BoW reloc)",
    )
    p.add_argument("--traj-out", default="CameraTrajectory.txt")
    p.add_argument("--kf-traj-out", default="KeyFrameTrajectory.txt")
    p.add_argument("--checkpoint-out", default=None, help="save map npz")
    p.add_argument("--load-checkpoint", default=None)
    p.add_argument("--localization-only", action="store_true")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--viewer", action="store_true",
                   help="periodic PNG snapshot viewer (headless)")
    p.add_argument("--live-viewer", type=int, nargs="?", const=8765,
                   default=None, metavar="PORT",
                   help="serve a live map/frame view with menu controls "
                        "over HTTP (reference Pangolin Viewer parity)")
    p.add_argument(
        "--groundtruth", default=None,
        help="TUM-format groundtruth file: print ATE at exit",
    )
    p.add_argument("--kitti-traj", action="store_true",
                   help="save trajectory in KITTI format")
    p.add_argument("--profile", action="store_true",
                   help="per-stage wall-clock breakdown at exit")
    p.add_argument("--device-trace", default=None, metavar="DIR",
                   help="capture an XLA device trace of frames 20-40 "
                        "into DIR (TensorBoard/Perfetto)")
    p.add_argument("--diag", default=None, metavar="FILE",
                   help="write per-frame diagnostics (state, match/"
                        "inlier counts, map occupancy) as JSONL")
    return p


def run(system: System, seq: Sequence, args) -> int:
    from orb_slam2_test_tpu.utils.profiling import profiler, device_trace

    n = len(seq) if args.max_frames is None else min(len(seq), args.max_frames)
    if args.load_checkpoint:
        system.load_checkpoint(args.load_checkpoint)
    if args.localization_only:
        system.activate_localization_mode()
    if getattr(args, "profile", False):
        profiler.enable()
    trace_ctx = None

    print(f"Processing {n} frames ({seq.kind}) ...")
    diag_rows: list = []
    diag_prev_state = system.tracking_state
    diag_fh = open(args.diag, "w") if args.diag is not None else None

    # decode prefetch: image IO/PNG decode of frame i+1..i+depth runs
    # in a worker thread while frame i tracks on the device (the
    # reference's main loop decodes synchronously but its tracking is
    # CPU-bound anyway; here the host is idle during device work)
    import collections
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    prefetch: collections.deque = collections.deque()
    PREFETCH_DEPTH = 3
    items = seq.items[:n]
    next_submit = 0

    def _ensure_prefetched() -> None:
        nonlocal next_submit
        while len(prefetch) < PREFETCH_DEPTH and next_submit < n:
            prefetch.append(pool.submit(seq.load, items[next_submit]))
            next_submit += 1

    t_start = time.time()
    for i, it in enumerate(items):
        if getattr(args, "device_trace", None):
            # trace a steady-state window, past the compile-heavy start
            if i == min(20, n // 2):
                trace_ctx = device_trace(args.device_trace)
                trace_ctx.__enter__()
            elif i == min(40, n - 1) and trace_ctx is not None:
                trace_ctx.__exit__(None, None, None)
                trace_ctx = None
        _ensure_prefetched()
        data = prefetch.popleft().result()
        if seq.kind == "mono":
            system.track_monocular(data[1], data[0])
        elif seq.kind == "stereo":
            system.track_stereo(data[1], data[2], data[0])
        else:
            system.track_rgbd(data[1], data[2], data[0])
        if args.diag is not None:
            import json

            tr = system.tracker
            rec = {"frame": i, "state": system.tracking_state,
                   "n_kf": tr.stats["n_kf"], "n_live_kf": tr.n_live_kf,
                   "cap_kf": tr.cfg.max_keyframes,
                   "cap_pt": tr.cfg.max_points}
            for k, v in tr.last_diag.items():
                if isinstance(v, (int, float, bool)):
                    rec[k] = v
            ld = tr.last_diag
            if "pred_Tcw" in ld and "local_Tcw" in ld:
                def _c(T):
                    return -T[:3, :3].T @ T[:3, 3]

                rec["pred_err_m"] = float(
                    np.linalg.norm(_c(ld["pred_Tcw"]) - _c(ld["local_Tcw"]))
                )
            diag_rows.append(rec)
            diag_fh.write(json.dumps(rec) + "\n")
            diag_fh.flush()
            if system.tracking_state != diag_prev_state:
                rec["n_pt"] = int(np.asarray(tr.map.n_pt))
                print(f"  [diag] frame {i}: {diag_prev_state} -> "
                      f"{system.tracking_state}  {rec}", flush=True)
                diag_prev_state = system.tracking_state
        if (i + 1) % 50 == 0:
            st = system.timing_stats()
            print(
                f"  frame {i + 1}/{n}  state={system.tracking_state}"
                f"  kf={system.tracker.stats['n_kf']}"
                f"  median={st['median_s'] * 1e3:.1f} ms"
            )
    wall = time.time() - t_start
    pool.shutdown(wait=False)
    if trace_ctx is not None:
        trace_ctx.__exit__(None, None, None)
    if diag_fh is not None:
        diag_fh.close()
        print(f"diagnostics written to {args.diag}")
    system.shutdown()
    if getattr(args, "profile", False):
        print("-" * 60)
        print(profiler.format_report())

    st = system.timing_stats()
    print("-" * 60)
    print(f"median tracking time: {st.get('median_s', 0) * 1e3:.2f} ms")
    print(f"mean tracking time:   {st.get('mean_s', 0) * 1e3:.2f} ms")
    print(f"wall time:            {wall:.1f} s ({n / wall:.1f} fps)")
    print(
        f"keyframes: {system.tracker.stats['n_kf']}  "
        f"loops: {system.tracker.stats['loops']}  "
        f"relocs: {system.tracker.stats['reloc']}  "
        f"lost frames: {system.tracker.stats['lost_frames']}"
    )

    if args.kitti_traj:
        system.save_trajectory_kitti(args.traj_out)
    else:
        system.save_trajectory_tum(args.traj_out)
    system.save_keyframe_trajectory_tum(args.kf_traj_out)
    print(f"trajectory saved to {args.traj_out}")
    if args.checkpoint_out:
        system.save_checkpoint(args.checkpoint_out)
        print(f"map checkpoint saved to {args.checkpoint_out}")

    if args.groundtruth:
        from orb_slam2_test_tpu.evaluation import absolute_trajectory_error
        from orb_slam2_test_tpu.io.trajectory import load_trajectory_tum

        gt = load_trajectory_tum(args.groundtruth)
        est = system.tracker.export_trajectory()
        res = absolute_trajectory_error(
            est, gt, with_scale=(seq.kind == "mono")
        )
        print(f"ATE RMSE: {res['rmse']:.4f} m over {res['n_pairs']} pairs")
    return 0
