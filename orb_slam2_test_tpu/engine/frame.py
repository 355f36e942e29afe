"""Frame construction: ORB extraction + undistortion (+ stereo depth).

Replaces src/Frame.cc. The 64x48 grid hash the reference builds for
O(1) area queries (AssignFeaturesToGrid / GetFeaturesInArea) has no
TPU equivalent here on purpose: windowed searches are done as masked
[P, N] distance matrices on the MXU, which is faster than pointer
chasing for the N ~ 1000-2000 feature counts this system uses.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from orb_slam2_test_tpu.utils.precision import f32_matmuls

from orb_slam2_test_tpu.geometry.camera import PinholeCamera, undistort_points
from orb_slam2_test_tpu.ops.extractor import Features, extract_orb


class FrameData(NamedTuple):
    """Per-frame data bundle (reference Frame members, arrays only).

    uv       [N, 2]  undistorted keypoint coords (mvKeysUn)
    uv_raw   [N, 2]  raw (distorted) coords (mvKeys)
    level    [N]     pyramid level
    angle    [N]     orientation (radians)
    desc     [N, 8]  packed descriptors
    valid    [N]
    ur       [N]     right-image u (stereo/RGB-D), -1 if unavailable
    depth    [N]     keypoint depth, -1 if unavailable
    timestamp []
    """

    uv: jax.Array
    uv_raw: jax.Array
    level: jax.Array
    angle: jax.Array
    desc: jax.Array
    valid: jax.Array
    ur: jax.Array
    depth: jax.Array
    timestamp: jax.Array


@f32_matmuls
@functools.partial(
    jax.jit, static_argnames=("cam", "n_features", "n_levels", "scale_factor")
)
def build_frame_mono(
    img: jax.Array,
    timestamp: jax.Array,
    cam: PinholeCamera,
    n_features: int = 1000,
    n_levels: int = 8,
    scale_factor: float = 1.2,
) -> FrameData:
    """Monocular frame: extract ORB + undistort keypoints
    (reference Frame mono ctor: ExtractORB + UndistortKeyPoints).

    `img` may be uint8 — the float cast happens on device, so callers
    transfer 1 byte/pixel (4x less tunnel/PCIe traffic than float32)."""
    img = img.astype(jnp.float32)
    f: Features = extract_orb(
        img, n_features=n_features, n_levels=n_levels, scale_factor=scale_factor
    )
    uv_un = undistort_points(cam, f.uv) if cam.has_distortion else f.uv
    n = f.uv.shape[0]
    return FrameData(
        uv=uv_un,
        uv_raw=f.uv,
        level=f.level,
        angle=f.angle,
        desc=f.desc,
        valid=f.valid,
        ur=jnp.full((n,), -1.0),
        depth=jnp.full((n,), -1.0),
        timestamp=jnp.asarray(timestamp, jnp.float32),
    )


@f32_matmuls
@functools.partial(
    jax.jit,
    static_argnames=("cam", "n_features", "n_levels", "scale_factor"),
)
def build_frame_stereo(
    img_left: jax.Array,
    img_right: jax.Array,
    timestamp: jax.Array,
    cam: PinholeCamera,
    n_features: int = 1000,
    n_levels: int = 8,
    scale_factor: float = 1.2,
) -> FrameData:
    """Stereo frame: ORB on both images (the reference runs the two
    extractors in parallel threads; here they are one fused program) +
    scanline association + SAD subpixel disparity
    (reference Frame stereo ctor + ComputeStereoMatches). Accepts
    uint8 images (device-side float cast — see build_frame_mono)."""
    from orb_slam2_test_tpu.ops.pyramid import build_pyramid
    from orb_slam2_test_tpu.ops.stereo import stereo_match

    img_left = img_left.astype(jnp.float32)
    img_right = img_right.astype(jnp.float32)

    fl = extract_orb(
        img_left, n_features=n_features, n_levels=n_levels,
        scale_factor=scale_factor,
    )
    fr = extract_orb(
        img_right, n_features=n_features, n_levels=n_levels,
        scale_factor=scale_factor,
    )
    lp = tuple(build_pyramid(img_left, n_levels, scale_factor))
    rp = tuple(build_pyramid(img_right, n_levels, scale_factor))
    ur, depth = stereo_match(
        fl, fr, lp, rp, float(cam.bf), n_features, n_levels, scale_factor
    )
    uv_un = undistort_points(cam, fl.uv) if cam.has_distortion else fl.uv
    return FrameData(
        uv=uv_un,
        uv_raw=fl.uv,
        level=fl.level,
        angle=fl.angle,
        desc=fl.desc,
        valid=fl.valid,
        ur=ur,
        depth=depth,
        timestamp=jnp.asarray(timestamp, jnp.float32),
    )


@f32_matmuls
@functools.partial(
    jax.jit,
    static_argnames=("cam", "n_features", "n_levels", "scale_factor"),
)
def build_frame_rgbd(
    img: jax.Array,
    depth_map: jax.Array,  # [H, W] float32 metric depth (0/neg = invalid)
    timestamp: jax.Array,
    cam: PinholeCamera,
    n_features: int = 1000,
    n_levels: int = 8,
    scale_factor: float = 1.2,
) -> FrameData:
    """RGB-D frame: depth lookup at keypoints + virtual right coordinate
    ur = u - bf/d (reference Frame::ComputeStereoFromRGBD). Accepts
    uint8 images (device-side float cast — see build_frame_mono)."""
    img = img.astype(jnp.float32)
    f: Features = extract_orb(
        img, n_features=n_features, n_levels=n_levels, scale_factor=scale_factor
    )
    uv_un = undistort_points(cam, f.uv) if cam.has_distortion else f.uv
    h, w = depth_map.shape
    xi = jnp.clip(jnp.round(f.uv[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(f.uv[:, 1]).astype(jnp.int32), 0, h - 1)
    d = depth_map[yi, xi]
    # depth-edge rejection: a keypoint on an occlusion boundary has an
    # ambiguous depth (could belong to either surface); its backprojected
    # point would pollute the map. Reject if the 3x3 neighborhood's
    # depth spread exceeds 5% of the center depth — standard RGB-D
    # practice (the reference relies on TUM's clean interior depths).
    pos = jnp.where(depth_map > 0.0, depth_map, jnp.inf)
    dmin = -jax.lax.reduce_window(
        -pos, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    dmax = jax.lax.reduce_window(
        jnp.where(depth_map > 0.0, depth_map, -jnp.inf),
        -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME",
    )
    spread_ok = (dmax[yi, xi] - dmin[yi, xi]) < 0.05 * jnp.maximum(d, 1e-6)
    has_d = (d > 0.0) & spread_ok
    ur = jnp.where(has_d, uv_un[:, 0] - cam.bf / jnp.maximum(d, 1e-6), -1.0)
    return FrameData(
        uv=uv_un,
        uv_raw=f.uv,
        level=f.level,
        angle=f.angle,
        desc=f.desc,
        valid=f.valid,
        ur=ur,
        depth=jnp.where(has_d, d, -1.0),
        timestamp=jnp.asarray(timestamp, jnp.float32),
    )
