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


def synthetic_problem(n_cams: int, n_pts: int, obs_per_pt: int, seed: int = 0):
    """KITTI-shaped synthetic bundle problem — see
    utils/synthetic.synthetic_ba_problem (shared with the multi-chip
    dryrun). Mirrors the problem sizes compact_problem() extracts from
    a KITTI-scale map checkpoint (~500 cams / ~90k pts / ~400k obs at
    default sizes)."""
    from orb_slam2_test_tpu.utils.synthetic import synthetic_ba_problem

    return synthetic_ba_problem(n_cams, n_pts, obs_per_pt, seed=seed)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoints", nargs="+", default=None,
                   help="map npz files (repeat one to simulate N maps)")
    p.add_argument("--synthetic", action="store_true",
                   help="measure on a generated KITTI-scale problem "
                        "instead of map checkpoints")
    p.add_argument("--synth-cams", type=int, default=512)
    p.add_argument("--synth-pts", type=int, default=90000)
    p.add_argument("--synth-obs-per-pt", type=int, default=5)
    p.add_argument("--pin-threads", action="store_true",
                   help="pin this process to ONE physical core "
                        "(sched_setaffinity) so the 1-device baseline is "
                        "honestly single-core (virtual devices otherwise "
                        "share the host's physical cores, understating "
                        "strong scaling)")
    p.add_argument("--cpu-devices", type=int, default=0,
                   help="run on a virtual CPU mesh of this many devices"
                        " (0 = use the real accelerator devices)")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--max-cams", type=int, default=None)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--out", default=None, help="write the JSON report")
    args = p.parse_args()

    if not args.synthetic and not args.checkpoints:
        p.error("--checkpoints or --synthetic required")

    if args.pin_threads:
        # OS-level pinning beats XLA flags: it needs no knowledge of
        # which --xla_* tokens the installed jaxlib accepts, and it
        # also constrains Eigen/openmp pools. Must happen before the
        # backend spins up its thread pool (i.e. before jax import).
        os.sched_setaffinity(0, {sorted(os.sched_getaffinity(0))[0]})
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

    if args.synthetic:
        from orb_slam2_test_tpu.parallel.multi_map import measure_scaling_problem

        prob, cam = synthetic_problem(
            args.synth_cams, args.synth_pts, args.synth_obs_per_pt)
        report = measure_scaling_problem(prob, cam, iters=args.iters,
                                         repeats=args.repeats)
        print(json.dumps(report, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=2)
            print(f"written to {args.out}")
        return 0

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
