"""Distributed-BA strong-scaling measurement from map checkpoints.

BASELINE.md criterion: >= 70% scaling efficiency of the distributed
bundle adjustment at >= 2 hosts. Multi-host hardware is not available
in this sandbox, so the measurement runs on a virtual device mesh
(XLA's host-platform device count), which exercises the identical
shard_map + psum program the multi-host path compiles to
(parallel/dist_ba.py; SURVEY.md section 5.8):

  python examples/dist_ba_scaling.py --cpu-devices 8 \
      --checkpoints kitti.npz kitti.npz kitti.npz

Checkpoints come from any example driver's --checkpoint-out (the
KITTI 00+02+05 multi-sequence BASELINE config = three KITTI-scale
maps jointly optimized — examples/multi_seq.py --measure-scaling runs
the same measurement inline after a live multi-sequence session).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoints", nargs="+", required=True,
                   help="map npz files (repeat one to simulate N maps)")
    p.add_argument("--cpu-devices", type=int, default=0,
                   help="run on a virtual CPU mesh of this many devices"
                        " (0 = use the real accelerator devices)")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--max-cams", type=int, default=None)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--out", default=None, help="write the JSON report")
    args = p.parse_args()

    if args.cpu_devices > 0:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from orb_slam2_test_tpu.geometry.camera import PinholeCamera
    from orb_slam2_test_tpu.io.checkpoint import load_map
    from orb_slam2_test_tpu.parallel.multi_map import measure_scaling

    print(f"devices: {jax.devices()}")
    maps, cams, sfs = [], [], []
    for path in args.checkpoints:
        m, cap, meta = load_map(path)
        maps.append(m)
        sfs.append(cap.scale_factor)
        c = meta.get("camera")
        if c:
            cams.append(PinholeCamera(**c))
        else:
            # checkpoint metadata predates the camera field: KITTI-like
            cams.append(
                PinholeCamera(
                    fx=718.856, fy=718.856, cx=607.19, cy=185.22,
                    width=1241, height=376, bf=718.856 * 0.53716,
                )
            )
        print(
            f"  {path}: {int(jax.numpy.sum(m.kf_valid))} keyframes, "
            f"{int(jax.numpy.sum(m.pt_valid))} points"
        )

    report = measure_scaling(
        maps, cams, iters=args.iters, max_cams=args.max_cams,
        repeats=args.repeats, scale_factor=sfs,
    )
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"written to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
