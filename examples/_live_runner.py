"""Shared loop for the live-camera drivers (the reference's ROS nodes
Examples/ROS/ORB_SLAM2/src/*.cc share the same shape: subscribe ->
callback feeds System::Track* -> Shutdown + trajectory save on exit)."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orb_slam2_test_tpu.system import System
from orb_slam2_test_tpu.io.live import (
    ApproximateTimeSync,
    DirectorySource,
    FrameSource,
    SocketSource,
)


def live_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("settings", help="settings YAML (reference format)")
    p.add_argument("--spool", default=None,
                   help="spool directory to tail for frames")
    p.add_argument("--spool2", default=None,
                   help="second spool (right / depth stream)")
    p.add_argument("--port", type=int, default=None,
                   help="listen for frames on this TCP port")
    p.add_argument("--port2", type=int, default=None,
                   help="second TCP port (right / depth stream)")
    p.add_argument("--vocabulary", default="default")
    p.add_argument("--no-vocabulary", dest="vocabulary",
                   action="store_const", const=None)
    p.add_argument("--viewer", action="store_true")
    p.add_argument("--traj-out", default="CameraTrajectory.txt")
    p.add_argument("--checkpoint-out", default=None)
    p.add_argument("--idle-timeout", type=float, default=10.0,
                   help="stop after this many seconds without a frame")
    p.add_argument("--sync-slop", type=float, default=0.02,
                   help="approximate-time pairing window (s)")
    p.add_argument("--depth-map-factor", type=float, default=5000.0)
    return p


def make_source(args, second: bool = False) -> FrameSource:
    spool = args.spool2 if second else args.spool
    port = args.port2 if second else args.port
    if spool:
        return DirectorySource(spool)
    if port:
        print(f"listening on :{port} ...")
        return SocketSource(port=port)
    raise SystemExit("need --spool or --port"
                     + (" (and --spool2/--port2)" if second else ""))


def run_live(system: System, source, kind: str, args) -> int:
    """kind: mono | stereo | rgbd. For stereo/rgbd, `source` is an
    ApproximateTimeSync; for mono a FrameSource."""
    n = 0
    t_last = time.monotonic()
    print("live tracking started (ctrl-c or idle timeout to stop)")
    try:
        while True:
            try:
                if kind == "mono":
                    f = source.next_frame(timeout=0.5)
                else:
                    f = source.next_pair(timeout=0.5)
            except StopIteration:
                print("stream closed by producer")
                break
            if f is None:
                if time.monotonic() - t_last > args.idle_timeout:
                    print("idle timeout")
                    break
                continue
            t_last = time.monotonic()
            if kind == "mono":
                ts, img = f
                system.track_monocular(img, ts)
            elif kind == "stereo":
                ts, l, r = f
                system.track_stereo(l, r, ts)
            else:
                ts, rgb, depth = f
                system.track_rgbd(rgb, depth / args.depth_map_factor, ts)
            n += 1
            if n % 30 == 0:
                st = system.timing_stats()
                print(f"  {n} frames  state={system.tracking_state}"
                      f"  kf={system.tracker.stats['n_kf']}"
                      f"  median={st['median_s'] * 1e3:.1f} ms")
    except KeyboardInterrupt:
        print("interrupted")
    system.shutdown()
    if hasattr(source, "close"):
        source.close()
    print(f"{n} frames tracked; "
          f"kf={system.tracker.stats['n_kf']} "
          f"lost={system.tracker.stats['lost_frames']}")
    system.save_trajectory_tum(args.traj_out)
    print(f"trajectory saved to {args.traj_out}")
    if args.checkpoint_out:
        system.save_checkpoint(args.checkpoint_out)
    return 0
