"""Matmul-precision control for geometry-critical code.

On TPU, float32 matmuls/einsums default to one bfloat16 MXU pass
(~3 decimal digits). That is fine for image resampling and exact for
the bipolar Hamming matmul (ops/matching.py), but it silently breaks
pixel-level geometry: epipolar distances, reprojection residuals,
Gauss-Newton normal equations, H/F RANSAC scoring. The CPU test suite
never sees the difference — this was caught driving the mono example
on a real TPU chip (initialization failed on scenes the CPU path
handles).

`f32_matmuls` wraps a (usually jitted) entry point so everything it
traces uses full float32 matmuls. The cost is negligible here: geometry
matmuls are tiny (3x3/4x4 contractions, [N,3] transforms); the only
big matmuls in the system (Hamming, pyramid resample) keep their
explicit fast dtypes/precision because explicit settings override the
context default.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Trace/execute `fn` under full-float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
