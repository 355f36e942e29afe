"""Benchmark: per-frame tracking throughput on one TPU chip.

Measures the flagship hot path (ORB extraction at 640x480/1000 features
+ local-map projection matching against 2048 points + motion-only GN
pose optimization, all fused in one jitted program) and reports
frames/s vs the reference's ~30 Hz tracking rate at the same
resolution/feature count on an i7 CPU (BASELINE.md: ORB-SLAM2 paper
timing table).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax

import __graft_entry__ as graft

BASELINE_FPS = 30.0  # reference tracking rate @640x480/1000 feats (i7)
WARMUP = 3
ITERS = 20


def main():
    fn, args = graft.entry()
    img0, rest = args[0], args[1:]

    # pre-stage distinct images so no caching tricks can kick in
    rng = np.random.default_rng(1)
    imgs = [
        jax.device_put(
            (np.asarray(img0) + rng.uniform(0, 50, img0.shape)).astype(
                np.float32
            )
        )
        for _ in range(8)
    ]

    for i in range(WARMUP):
        out = fn(imgs[i % 8], *rest)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(imgs[i % 8], *rest)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = ITERS / dt
    print(
        json.dumps(
            {
                "metric": "tracking_fps_640x480_1000feat",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
