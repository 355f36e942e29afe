"""Map-point maintenance (MapPoint::UpdateNormalAndDepth /
ComputeDistinctiveDescriptors as segment reductions)."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_test_tpu.slam_map.mapstate import (
    MapCapacity,
    add_keyframe,
    make_empty_map,
)
from orb_slam2_test_tpu.slam_map.maintenance import (
    update_distinctive_descriptors,
    update_normals_and_depth,
)

CAP = MapCapacity(max_keyframes=4, max_features=8, max_points=16)


def _frame(pt_idx, desc=None, level=None):
    N = CAP.max_features
    if desc is None:
        desc = np.zeros((N, 8), np.uint32)
    if level is None:
        level = np.zeros((N,), np.int32)
    return (
        jnp.zeros((N, 2)),
        jnp.asarray(level),
        jnp.zeros((N,)),
        jnp.full((N,), -1.0),
        jnp.full((N,), -1.0),
        jnp.asarray(desc),
        jnp.ones((N,), bool),
        jnp.asarray(pt_idx, jnp.int32),
    )


def test_update_normals_mean_view_direction():
    m = make_empty_map(CAP)
    # one point at the origin-ish, two cameras on +x / +y looking at it
    X = np.array([0.0, 0.0, 4.0], np.float32)
    m = m._replace(
        pt_xyz=m.pt_xyz.at[0].set(X),
        pt_valid=m.pt_valid.at[0].set(True),
        pt_ref_kf=m.pt_ref_kf.at[0].set(0),
    )
    row = np.full(8, -1)
    row[0] = 0
    T0 = jnp.eye(4)  # camera at origin
    T1 = jnp.eye(4).at[0, 3].set(-1.0)  # center at world x=+1
    m, _ = add_keyframe(m, T0, 0.0, 0, *_frame(row, level=np.full(8, 2)))
    m, _ = add_keyframe(m, T1, 1.0, 1, *_frame(row))
    m2 = update_normals_and_depth(m)
    v0 = X / np.linalg.norm(X)
    v1 = (X - np.array([1, 0, 0])) / np.linalg.norm(X - np.array([1, 0, 0]))
    expect = v0 + v1
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(np.asarray(m2.pt_normal[0]), expect, atol=1e-5)
    # distance range from reference KF (kf0, level 2)
    d = np.linalg.norm(X)
    np.testing.assert_allclose(
        float(m2.pt_max_dist[0]), d * 1.2**2, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m2.pt_min_dist[0]), d * 1.2**2 / 1.2**7, rtol=1e-5
    )


def test_distinctive_descriptor_picks_central_member():
    m = make_empty_map(CAP)
    m = m._replace(pt_valid=m.pt_valid.at[0].set(True))
    row = np.full(8, -1)
    row[0] = 0
    # three observers: two identical descriptors, one far outlier —
    # the duplicated descriptor must win (mean distance 1/3*outlier)
    base = np.zeros((8, 8), np.uint32)
    out = np.zeros((8, 8), np.uint32)
    out[0] = 0xFFFFFFFF  # 256 bits set on feature 0
    m, k0 = add_keyframe(m, jnp.eye(4), 0.0, 0, *_frame(row, desc=base))
    m, k1 = add_keyframe(m, jnp.eye(4), 1.0, 1, *_frame(row, desc=out))
    m, k2 = add_keyframe(m, jnp.eye(4), 2.0, 2, *_frame(row, desc=base))
    # poison the stored descriptor so the refresh is observable
    m = m._replace(pt_desc=m.pt_desc.at[0].set(jnp.full(8, 7, jnp.uint32)))
    window = jnp.asarray([0, 1, 2, -1], jnp.int32)
    m2 = update_distinctive_descriptors(m, window, window=4)
    np.testing.assert_array_equal(np.asarray(m2.pt_desc[0]), np.zeros(8))


def test_distinctive_descriptor_single_obs_untouched():
    m = make_empty_map(CAP)
    m = m._replace(
        pt_valid=m.pt_valid.at[0].set(True),
        pt_desc=m.pt_desc.at[0].set(jnp.full(8, 5, jnp.uint32)),
    )
    row = np.full(8, -1)
    row[0] = 0
    m, _ = add_keyframe(m, jnp.eye(4), 0.0, 0, *_frame(row))
    window = jnp.asarray([0, -1], jnp.int32)
    m2 = update_distinctive_descriptors(m, window, window=2)
    np.testing.assert_array_equal(np.asarray(m2.pt_desc[0]), np.full(8, 5))
