"""Capacity growth: mapstate.grow_map + checkpoint capacity adoption."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_test_tpu.slam_map.mapstate import (
    MapCapacity,
    add_keyframe,
    add_points,
    grow_map,
    make_empty_map,
)

CAP = MapCapacity(max_keyframes=4, max_features=8, max_points=16)


def _fill(m):
    N = CAP.max_features
    m, k0 = add_keyframe(
        m, jnp.eye(4), 0.0, 0,
        jnp.zeros((N, 2)), jnp.zeros((N,), jnp.int32), jnp.zeros((N,)),
        jnp.full((N,), -1.0), jnp.full((N,), -1.0),
        jnp.zeros((N, 8), jnp.uint32), jnp.ones((N,), bool),
        jnp.full((N,), -1, jnp.int32),
    )
    m, slots = add_points(
        m, jnp.ones((5, 3)), jnp.zeros((5, 8), jnp.uint32),
        jnp.ones((5, 3)) / np.sqrt(3.0), jnp.ones(5), jnp.full(5, 2.0),
        k0, jnp.ones(5, bool),
    )
    return m, int(k0), np.asarray(slots)


def test_grow_map_preserves_content_and_indices():
    m, k0, slots = _fill(make_empty_map(CAP))
    big = MapCapacity(max_keyframes=8, max_points=32,
                      max_features=CAP.max_features)
    g = grow_map(m, CAP, big)
    assert g.kf_valid.shape[0] == 8 and g.pt_valid.shape[0] == 32
    assert bool(g.kf_valid[k0])
    assert int(g.n_kf) == int(m.n_kf) and int(g.n_pt) == int(m.n_pt)
    np.testing.assert_array_equal(
        np.asarray(g.pt_xyz[slots]), np.asarray(m.pt_xyz[slots])
    )
    # new slots are empty and allocatable
    assert not np.asarray(g.kf_valid[4:]).any()
    assert not np.asarray(g.pt_valid[16:]).any()
    # indices into keyframe/point tables still resolve identically
    np.testing.assert_array_equal(
        np.asarray(g.kf_pt_idx[:4]), np.asarray(m.kf_pt_idx)
    )


def test_grow_map_rejects_geometry_change_and_shrink():
    m = make_empty_map(CAP)
    import pytest

    with pytest.raises(ValueError):
        grow_map(m, CAP, MapCapacity(max_keyframes=8, max_features=16,
                                     max_points=32))
    with pytest.raises(ValueError):
        grow_map(m, CAP, MapCapacity(max_keyframes=2,
                                     max_features=CAP.max_features,
                                     max_points=16))


def test_checkpoint_capacity_adoption(tmp_path):
    """A checkpoint written after growth loads into a tracker built at
    the original (smaller) capacity: the tracker adopts the larger one."""
    from orb_slam2_test_tpu.engine.tracking import Tracker, TrackerConfig
    from orb_slam2_test_tpu.io.checkpoint import load_tracker, save_tracker
    from orb_slam2_test_tpu.utils.synthetic import default_camera

    cam = default_camera(64, 48)
    cfg = TrackerConfig(n_features=8, max_keyframes=4, max_points=16,
                        local_kf_cap=2, ba_fixed_cap=1, ba_pt_cap=8,
                        n_triangulate_neighbors=1)
    t1 = Tracker(cam, cfg)
    t1.map, _, _ = _fill(t1.map)
    t1.n_live_kf = 1
    t1._grow_capacity(max_keyframes=8, max_points=32)
    path = str(tmp_path / "ckpt.npz")
    save_tracker(path, t1)

    t2 = Tracker(cam, cfg)  # original small capacity
    load_tracker(path, t2)
    assert t2.cfg.max_keyframes == 8 and t2.cfg.max_points == 32
    assert t2.map.kf_valid.shape[0] == 8
    assert t2.n_live_kf == 1
    assert t2._pending_kf is None
