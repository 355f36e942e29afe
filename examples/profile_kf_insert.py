"""Stage-by-stage timing of the keyframe-insertion pipeline.

VERDICT r3 weak #1: the fused insert program (_grow_map_device) costs
~400 ms on the benched KITTI-stereo config and dominates amortized
throughput. This script times each stage of the pipeline as its own
jitted program at the SAME shapes/occupancy as bench.py, so the cost
can be attributed (BA? maintenance? fuse? triangulation?) and the fix
targeted. Writes runs/profile_r04/kf_insert_stages.json.

Run on the real chip:  python examples/profile_kf_insert.py
On the CPU mesh:       JAX_PLATFORMS=cpu python examples/profile_kf_insert.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def time_fn(fn, *args, reps=5, warmup=2):
    """Median wall time of a jitted call (device_get forces sync —
    block_until_ready is unreliable on the tunneled backend)."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def _sync(out):
    leaves = jax.tree.leaves(out)
    if leaves:
        jax.device_get(leaves[0].ravel()[0] if hasattr(leaves[0], "ravel")
                       else leaves[0])


def main():
    from bench import KITTI_CAM, KITTI_CFG, _bench_map
    from orb_slam2_test_tpu.engine.frame import build_frame_stereo
    from orb_slam2_test_tpu.engine.local_mapping import (
        cull_keyframes, cull_points, fuse_round, run_local_ba,
        triangulate_with_neighbors,
    )
    from orb_slam2_test_tpu.engine.tracking import _grow_map_device, \
        _add_depth_points_body
    from orb_slam2_test_tpu.slam_map.covisibility import (
        assign_parent, best_covisible, observation_counts,
    )
    from orb_slam2_test_tpu.slam_map.maintenance import (
        update_distinctive_descriptors, update_normals_and_depth,
    )
    from orb_slam2_test_tpu.slam_map.mapstate import add_keyframe
    from orb_slam2_test_tpu.utils.precision import f32_matmuls

    cam, cfg = KITTI_CAM, KITTI_CFG
    cap = cfg.map_capacity
    m = _bench_map(cfg, n_kf=200, n_pt=110000)
    rng = np.random.default_rng(7)
    H, W = cam.height, cam.width
    imgL = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    imgR = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    frame = build_frame_stereo(
        imgL, imgR, 0.0, cam, n_features=cfg.n_features,
        n_levels=cfg.n_levels, scale_factor=cfg.scale_factor,
    )
    frame = jax.tree.map(jnp.asarray, jax.device_get(frame))  # settle
    Tcw = jnp.eye(4)
    feat0 = jnp.asarray(rng.integers(-1, 40000, cfg.n_features), jnp.int32)
    cd = jnp.float32(cfg.th_depth * cam.baseline)
    kf = jnp.asarray(100, jnp.int32)

    from orb_slam2_test_tpu.slam_map.covisibility import (
        build_observer_bitmap,
    )

    obs_bm = jax.jit(build_observer_bitmap)(m)
    out = {}

    # whole pipeline (the production program)
    out["total_grow_map"] = time_fn(
        lambda: _grow_map_device(
            cam, cfg, m, obs_bm, frame, Tcw, feat0, jnp.float32(0.0),
            jnp.asarray(99, jnp.int32), cd, True, True,
        )
    )

    # --- stages, each its own jitted program at production shapes
    @f32_matmuls
    @jax.jit
    def st_add(m):
        m2, k = add_keyframe(
            m, Tcw, jnp.float32(0.0), jnp.asarray(99, jnp.int32),
            frame.uv, frame.level, frame.angle, frame.ur, frame.depth,
            frame.desc, frame.valid, feat0,
        )
        return assign_parent(m2, jnp.clip(k, 0))

    out["add_keyframe+parent"] = time_fn(st_add, m)

    @f32_matmuls
    @jax.jit
    def st_depth(m):
        return _add_depth_points_body(cam, cfg, m, frame, kf, cd, True)

    out["depth_points"] = time_fn(st_depth, m)

    @f32_matmuls
    @jax.jit
    def st_covis(m):
        return best_covisible(m, kf, cfg.n_triangulate_neighbors)

    out["best_covisible"] = time_fn(st_covis, m)
    ids, _w = best_covisible(m, kf, cfg.n_triangulate_neighbors)
    ids = jnp.asarray(jax.device_get(ids))

    out["triangulate_neighbors"] = time_fn(
        lambda: triangulate_with_neighbors(
            m, cam, kf, ids, cap, cfg.n_triangulate_neighbors
        )
    )

    @f32_matmuls
    @jax.jit
    def st_fuse(m):
        obs = observation_counts(m)
        return fuse_round(m, cam, kf, ids, obs, cfg.n_triangulate_neighbors)

    out["fuse_round(+obs_counts)"] = time_fn(st_fuse, m)

    window = jnp.concatenate([kf[None], ids])
    out["distinctive_desc"] = time_fn(
        lambda: update_distinctive_descriptors(
            m, window, window=cfg.n_triangulate_neighbors + 1
        )
    )
    out["normals_and_depth(mapwide)"] = time_fn(
        lambda: update_normals_and_depth(
            m, scale_factor=cfg.scale_factor, n_levels=cfg.n_levels
        )
    )
    out["cull_points"] = time_fn(lambda: cull_points(m, kf))
    out["local_ba"] = time_fn(
        lambda: run_local_ba(m, cam, kf, cap, cfg.ba_caps)
    )
    out["cull_keyframes"] = time_fn(
        lambda: cull_keyframes(m, kf, n_levels=cfg.n_levels)
    )

    stage_sum = sum(v for k, v in out.items() if k != "total_grow_map")
    out["stage_sum"] = stage_sum
    out["backend"] = jax.devices()[0].platform
    os.makedirs("runs/profile_r04", exist_ok=True)
    with open("runs/profile_r04/kf_insert_stages.json", "w") as f:
        json.dump(out, f, indent=2)
    for k, v in out.items():
        print(f"{k:32s} {v if isinstance(v, str) else round(v, 2)}")


if __name__ == "__main__":
    main()
