"""Concurrent multi-sequence mapping driver (BASELINE config 5:
"KITTI 00+02+05 concurrent multi-sequence mapping, keyframe/map-block
partitioned distributed BA").

No reference equivalent — ORB-SLAM2 is strictly one System / one Map
(reference: src/System.cc); this driver tracks N sequences concurrently
(each with its own tracker + calibration) and periodically runs ONE
joint distributed bundle adjustment over all maps, point-sharded across
the TPU device mesh (orb_slam2_test_tpu/parallel/multi_map.py).

Usage:
  python examples/multi_seq.py \
      --seq configs/KITTI00-02.yaml:/data/kitti/sequences/00 \
      --seq configs/KITTI00-02.yaml:/data/kitti/sequences/02 \
      --seq configs/KITTI04-12.yaml:/data/kitti/sequences/05 \
      --dataset kitti --sensor stereo --joint-ba-every 200

Each sequence writes CameraTrajectory_<i>.txt; --measure-scaling
re-solves the final joint problem on 1..N devices and reports
distributed-BA scaling efficiency.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--seq", action="append", required=True, metavar="SETTINGS:DIR",
        help="settings YAML and sequence directory, colon-separated; repeatable",
    )
    p.add_argument("--dataset", default="kitti",
                   choices=["kitti", "tum", "euroc"])
    p.add_argument("--sensor", default="stereo",
                   choices=["monocular", "stereo", "rgbd"])
    p.add_argument("--vocabulary", default="default")
    p.add_argument("--no-vocabulary", dest="vocabulary",
                   action="store_const", const=None)
    p.add_argument("--joint-ba-every", type=int, default=200,
                   help="frames (summed over sequences) between joint BAs")
    p.add_argument("--joint-ba-iters", type=int, default=8)
    p.add_argument("--max-cams", type=int, default=256,
                   help="newest keyframes kept free per sequence in joint BA")
    p.add_argument("--max-frames", type=int, default=None,
                   help="per-sequence frame cap")
    p.add_argument("--devices", type=int, default=None,
                   help="mesh size (default: all visible devices)")
    p.add_argument("--traj-prefix", default="CameraTrajectory")
    p.add_argument("--kitti-traj", action="store_true")
    p.add_argument("--measure-scaling", action="store_true")
    p.add_argument(
        "--multihost", action="store_true",
        help="multi-process run: initialize jax.distributed from "
             "SLAM_COORDINATOR / SLAM_NUM_PROCS / SLAM_PROC_ID and put "
             "the joint BA on the global (all-hosts) mesh",
    )
    return p.parse_args()


def load_sequence(kind, sensor, path):
    from orb_slam2_test_tpu.io.datasets import (
        load_euroc,
        load_kitti,
        load_tum_mono,
        load_tum_rgbd,
    )

    if kind == "kitti":
        return load_kitti(path, stereo=(sensor == "stereo"))
    if kind == "tum":
        return (
            load_tum_mono(path) if sensor == "monocular"
            else load_tum_rgbd(path)
        )
    return load_euroc(path, stereo=(sensor == "stereo"))


def main():
    args = parse_args()
    if args.multihost:
        from orb_slam2_test_tpu.parallel.multihost import initialize_from_env

        initialize_from_env()
    from orb_slam2_test_tpu.system import System
    from orb_slam2_test_tpu.parallel.dist_ba import make_ba_mesh
    from orb_slam2_test_tpu.parallel.multi_map import joint_bundle_adjust

    systems, seqs = [], []
    for spec in args.seq:
        settings, _, seq_dir = spec.rpartition(":")
        if not settings:
            raise SystemExit(f"--seq must be SETTINGS:DIR, got {spec!r}")
        systems.append(
            System(settings, args.sensor, vocabulary=args.vocabulary)
        )
        seqs.append(load_sequence(args.dataset, args.sensor, seq_dir))

    mesh = make_ba_mesh(args.devices)
    print(f"[multi_seq] {len(systems)} sequences, mesh of {mesh.size} "
          f"device(s)")

    lengths = [
        len(s) if args.max_frames is None else min(len(s), args.max_frames)
        for s in seqs
    ]
    cursors = [0] * len(seqs)
    since_ba = 0
    ba_infos = []

    def run_joint_ba():
        nonlocal since_ba
        maps = [s.tracker.map for s in systems]
        cams = [s.tracker.cam for s in systems]
        sfs = [s.tracker.cap.scale_factor for s in systems]
        new_maps, info = joint_bundle_adjust(
            maps, cams, mesh, iters=args.joint_ba_iters,
            max_cams=args.max_cams, scale_factor=sfs,
        )
        for s, m in zip(systems, new_maps):
            if m is s.tracker.map:
                continue  # map too small, untouched
            s.tracker.map = m
            # BA moved keyframe/point poses under the tracker: the
            # constant-velocity prior and cached ref-KF pose are stale
            # (same invariant as the in-tracker loop-closure path)
            s.tracker.velocity = None
            s.tracker._ref_Tcw_host = None
        ba_infos.append(info)
        since_ba = 0
        if info["n_cams"]:
            print(
                f"[joint BA] cams={info['n_cams']} pts={info['n_pts']} "
                f"obs={info['n_obs']} cost={info['cost']:.1f} "
                f"solve={info['solve_s'] * 1e3:.0f}ms "
                f"devices={info['n_devices']}"
            )

    # round-robin interleave: one frame per live sequence per cycle —
    # the multi-map analog of the reference's per-frame main loop
    t_start = time.time()
    while any(c < n for c, n in zip(cursors, lengths)):
        for i, (sys_i, seq_i) in enumerate(zip(systems, seqs)):
            if cursors[i] >= lengths[i]:
                continue
            data = seq_i.load(seq_i.items[cursors[i]])
            ts = data[0]
            if args.sensor == "stereo":
                sys_i.track_stereo(data[1], data[2], ts)
            elif args.sensor == "rgbd":
                sys_i.track_rgbd(data[1], data[2], ts)
            else:
                sys_i.track_monocular(data[1], ts)
            cursors[i] += 1
            since_ba += 1
        if since_ba >= args.joint_ba_every:
            run_joint_ba()
    run_joint_ba()  # final polish over the complete maps
    wall = time.time() - t_start

    total_frames = sum(lengths)
    print(f"[multi_seq] {total_frames} frames total in {wall:.1f}s "
          f"({total_frames / max(wall, 1e-9):.1f} fps aggregate)")
    for i, s in enumerate(systems):
        stats = s.timing_stats()
        print(f"  seq {i}: median track {stats.get('median_s', 0) * 1e3:.1f}ms "
              f"state={s.tracking_state}")
        if args.kitti_traj:
            s.save_trajectory_kitti(f"{args.traj_prefix}_{i}.txt")
        else:
            s.save_trajectory_tum(f"{args.traj_prefix}_{i}.txt")
        s.shutdown()

    if args.measure_scaling and ba_infos and ba_infos[-1]["n_cams"]:
        from orb_slam2_test_tpu.parallel.multi_map import measure_scaling

        maps = [s.tracker.map for s in systems]
        cams = [s.tracker.cam for s in systems]
        report = measure_scaling(
            maps, cams, iters=args.joint_ba_iters, max_cams=args.max_cams,
            scale_factor=[s.tracker.cap.scale_factor for s in systems],
        )
        print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
