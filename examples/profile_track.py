"""Stage-by-stage timing of the per-frame tracking program.

Companion to profile_kf_insert.py (VERDICT r4 evidence, runs/
profile_r04): each stage of the fused per-frame program is chained
K=16 times inside one jitted scan so the tunnel round-trip amortizes
away and the number is per-frame DEVICE time. Writes
runs/profile_r04/track_stages.json.
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


def main():
    from bench import KITTI_CAM, KITTI_CFG, _bench_map
    from orb_slam2_test_tpu.engine import tracking as T
    from orb_slam2_test_tpu.engine.frame import (
        build_frame_mono,
        build_frame_stereo,
    )
    from orb_slam2_test_tpu.slam_map.covisibility import (
        build_observer_bitmap,
    )
    from orb_slam2_test_tpu.solvers.pose_opt import pose_optimization
    from orb_slam2_test_tpu.utils.precision import f32_matmuls

    cam, cfg = KITTI_CAM, KITTI_CFG
    m = _bench_map(cfg, n_kf=200, n_pt=110000)
    rng = np.random.default_rng(7)
    H, W = cam.height, cam.width
    imgL = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    imgR = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    feat0 = jnp.asarray(
        rng.integers(-1, 40000, cfg.n_features), jnp.int32
    )
    K = 16
    kw = dict(n_features=cfg.n_features, n_levels=cfg.n_levels,
              scale_factor=cfg.scale_factor)

    def chain(body):
        @f32_matmuls
        @jax.jit
        def run(x0):
            def st(c, i):
                return body(x0 + c * 1e-6, i), None

            s, _ = jax.lax.scan(st, 0.0, jnp.arange(K))
            return s

        return run

    def t(f, *a, reps=3):
        o = f(*a)
        jax.device_get(jax.tree.leaves(o)[0].ravel()[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            o = f(*a)
            jax.device_get(jax.tree.leaves(o)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts) * 1e3 / K)

    out = {}

    def b_full(img, i):
        f = build_frame_stereo(img, imgR, 0.0, cam, **kw)
        return jnp.sum(f.uv) + jnp.sum(f.desc.astype(jnp.float32))

    out["build_frame_stereo"] = t(chain(b_full), imgL)

    def b_mono(img, i):
        f = build_frame_mono(img, 0.0, cam, **kw)
        return jnp.sum(f.uv) + jnp.sum(f.desc.astype(jnp.float32))

    out["build_frame_mono"] = t(chain(b_mono), imgL)

    frame = build_frame_stereo(imgL, imgR, 0.0, cam, **kw)
    frame = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), frame)
    obs_bm = jax.jit(build_observer_bitmap)(m)
    obs_bm = jnp.asarray(np.asarray(obs_bm))

    def b_motion(x, i):
        pred = jnp.eye(4).at[0, 3].add(x * 0)
        n_m, Tcw_m, n_inl, feat = T._motion_body(
            cam, cfg, m, frame, pred, feat0, frame, pred
        )
        return Tcw_m[0, 0] + n_m

    out["motion_model"] = t(chain(b_motion), jnp.float32(0.0))

    def b_local(x, i):
        Tcw = jnp.eye(4).at[0, 3].add(x * 0)
        o = T._local_map_body(
            cam, cfg, m, obs_bm, frame, Tcw, feat0,
            jnp.asarray(0, jnp.int32),
        )
        return o[2][0, 0] + o[3]

    out["local_map_track"] = t(chain(b_local), jnp.float32(0.0))

    def b_lset(x, i):
        vw, vkf, pmask = T._local_keyframe_point_set(
            m, obs_bm, feat0 + (x * 0).astype(jnp.int32),
            cfg.local_kf_cap, cfg.local_k2_cap,
        )
        return vw[0] + jnp.sum(pmask.astype(jnp.float32))

    out["local_kf_point_set"] = t(chain(b_lset), jnp.float32(0.0))

    uvr = jnp.concatenate([frame.uv, frame.ur[:, None]], axis=-1)
    isig2 = 1.0 / jnp.asarray(cfg.map_capacity.level_sigma2)[frame.level]
    X = m.pt_xyz[jnp.clip(feat0, 0)]

    def b_pose(x, i):
        res = pose_optimization(
            cam, jnp.eye(4).at[0, 3].add(x * 0), X, uvr, isig2,
            (feat0 >= 0) & frame.valid,
        )
        return res.Tcw[0, 0]

    out["pose_optimization"] = t(chain(b_pose), jnp.float32(0.0))

    out = {k: round(v, 2) for k, v in out.items()}
    out["unit"] = "ms/frame (16-frame chained device time)"
    out["backend"] = jax.devices()[0].platform
    os.makedirs("runs/profile_r04", exist_ok=True)
    with open("runs/profile_r04/track_stages.json", "w") as f:
        json.dump(out, f, indent=2)
    for k, v in out.items():
        print(f"{k:24s} {v}")


if __name__ == "__main__":
    main()
