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
    """KITTI-shaped synthetic bundle problem (no dataset needed): cameras
    along a forward trajectory, stereo points ahead of them, observations
    projected from perturbed ground truth so the LM solver does real work.
    Mirrors the problem sizes compact_problem() extracts from a KITTI-scale
    map checkpoint (≈500 cams / ≈90k pts / ≈400k obs at default sizes)."""
    import numpy as np
    from orb_slam2_test_tpu.geometry.camera import PinholeCamera
    from orb_slam2_test_tpu.solvers.ba_core import BAProblem

    rng = np.random.default_rng(seed)
    fx = fy = 718.856
    cx, cy = 607.19, 185.22
    bf = fx * 0.53716
    cam = PinholeCamera(fx=fx, fy=fy, cx=cx, cy=cy,
                        width=1241, height=376, bf=bf)

    # ground-truth poses: forward motion with gentle yaw
    t = np.arange(n_cams, dtype=np.float64)
    yaw = 0.002 * t
    cw = np.stack([np.cumsum(np.sin(yaw)), np.zeros(n_cams),
                   np.cumsum(np.cos(yaw))], axis=1)  # camera centers
    Tcw_gt = np.tile(np.eye(4), (n_cams, 1, 1))
    for i in range(n_cams):
        c, s = np.cos(yaw[i]), np.sin(yaw[i])
        R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
        Tcw_gt[i, :3, :3] = R
        Tcw_gt[i, :3, 3] = -R @ cw[i]

    # points: scattered ahead of a random anchor camera
    anchor = rng.integers(0, n_cams, size=n_pts)
    X = cw[anchor] + rng.normal(0, 1, (n_pts, 3)) * [8, 2, 0] + \
        np.stack([np.sin(yaw[anchor]), np.zeros(n_pts),
                  np.cos(yaw[anchor])], 1) * rng.uniform(5, 40, (n_pts, 1))

    # observations: each point seen by obs_per_pt consecutive cameras
    oc = (anchor[:, None] + np.arange(obs_per_pt)[None, :]) % n_cams
    op = np.broadcast_to(np.arange(n_pts)[:, None], oc.shape)
    oc, op = oc.ravel(), op.ravel().copy()
    Xc = np.einsum("oij,oj->oi", Tcw_gt[oc, :3, :3], X[op]) + Tcw_gt[oc, :3, 3]
    z = np.maximum(Xc[:, 2], 0.5)
    u = fx * Xc[:, 0] / z + cx + rng.normal(0, 0.5, len(oc))
    v = fy * Xc[:, 1] / z + cy + rng.normal(0, 0.5, len(oc))
    ur = u - bf / z + rng.normal(0, 0.5, len(oc))
    valid = (Xc[:, 2] > 0.5) & (np.abs(u - cx) < 900) & (np.abs(v - cy) < 300)

    # initial guess: perturbed ground truth
    Tcw0 = Tcw_gt.copy()
    Tcw0[:, :3, 3] += rng.normal(0, 0.05, (n_cams, 3))
    X0 = X + rng.normal(0, 0.05, X.shape)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True

    prob = BAProblem(
        cam_Tcw=Tcw0.astype(np.float32),
        cam_fixed=fixed,
        pt_xyz=X0.astype(np.float32),
        pt_valid=np.ones(n_pts, bool),
        obs_cam=oc.astype(np.int32),
        obs_pt=op.astype(np.int32),
        obs_uvr=np.stack([u, v, ur], 1).astype(np.float32),
        obs_isig2=np.ones(len(oc), np.float32),
        obs_valid=valid,
    )
    return prob, cam


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
