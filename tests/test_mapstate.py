"""Tests for the MapState struct-of-arrays map."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_test_tpu.slam_map import (
    MapState,
    MapCapacity,
    make_empty_map,
    covisibility_weights,
    best_covisible,
    observation_counts,
)
from orb_slam2_test_tpu.slam_map.mapstate import (
    add_keyframe,
    add_points,
    erase_points,
    erase_keyframe,
)

CAP = MapCapacity(max_keyframes=8, max_features=16, max_points=64)


def _dummy_frame(n, pt_idx=None):
    N = CAP.max_features
    uv = jnp.zeros((N, 2))
    level = jnp.zeros((N,), jnp.int32)
    angle = jnp.zeros((N,))
    ur = jnp.full((N,), -1.0)
    depth = jnp.full((N,), -1.0)
    desc = jnp.zeros((N, 8), jnp.uint32)
    kp_valid = jnp.arange(N) < n
    if pt_idx is None:
        pt_idx = jnp.full((N,), -1, jnp.int32)
    return uv, level, angle, ur, depth, desc, kp_valid, pt_idx


def test_add_keyframe_allocates_slots():
    m = make_empty_map(CAP)
    frame = _dummy_frame(10)
    m, k0 = add_keyframe(m, jnp.eye(4), 0.0, 0, *frame)
    m, k1 = add_keyframe(m, jnp.eye(4), 1.0, 1, *frame)
    assert int(k0) == 0 and int(k1) == 1
    assert int(m.n_kf) == 2
    assert bool(m.kf_valid[0]) and bool(m.kf_valid[1])
    assert not bool(m.kf_valid[2])


def test_add_points_and_erase():
    m = make_empty_map(CAP)
    B = 5
    xyz = jnp.arange(B * 3, dtype=jnp.float32).reshape(B, 3)
    desc = jnp.zeros((B, 8), jnp.uint32)
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (B, 1))
    ok = jnp.array([True, True, False, True, True])
    m, slots = add_points(
        m, xyz, desc, normal, jnp.zeros(B), jnp.ones(B), jnp.int32(0), ok
    )
    slots = np.asarray(slots)
    assert (slots >= 0).sum() == 4
    assert int(m.n_pt) == 4
    # erase the first two inserted points
    m = erase_points(m, jnp.asarray(slots[:2]))
    assert int(m.n_pt) == 2


def test_erase_points_detaches_observations():
    m = make_empty_map(CAP)
    pt_idx = jnp.full((CAP.max_features,), -1, jnp.int32).at[0].set(3)
    frame = _dummy_frame(10, pt_idx)
    m, k0 = add_keyframe(m, jnp.eye(4), 0.0, 0, *frame)
    m = m._replace(pt_valid=m.pt_valid.at[3].set(True))
    m = erase_points(m, jnp.array([3]))
    assert int(m.kf_pt_idx[0, 0]) == -1
    assert not bool(m.pt_valid[3])


def _map_with_shared_points():
    """3 KFs: kf0/kf1 share 6 points, kf1/kf2 share 3, kf0/kf2 share 0."""
    m = make_empty_map(CAP)
    # points 0..5 seen by kf0,kf1; points 6..8 seen by kf1,kf2
    def mk(pts):
        pt_idx = jnp.full((CAP.max_features,), -1, jnp.int32)
        for i, p in enumerate(pts):
            pt_idx = pt_idx.at[i].set(p)
        return _dummy_frame(16, pt_idx)

    m, _ = add_keyframe(m, jnp.eye(4), 0.0, 0, *mk(range(6)))
    m, _ = add_keyframe(m, jnp.eye(4), 1.0, 1, *mk(range(9)))
    m, _ = add_keyframe(m, jnp.eye(4), 2.0, 2, *mk(range(6, 9)))
    m = m._replace(pt_valid=m.pt_valid.at[jnp.arange(9)].set(True))
    return m


def test_covisibility_weights():
    m = _map_with_shared_points()
    w = np.asarray(covisibility_weights(m))
    assert w[0, 1] == 6 and w[1, 0] == 6
    assert w[1, 2] == 3 and w[2, 1] == 3
    assert w[0, 2] == 0
    assert w[0, 0] == 0  # diag zeroed


def test_best_covisible():
    m = _map_with_shared_points()
    ids, weights = best_covisible(m, jnp.int32(1), 4)
    ids, weights = np.asarray(ids), np.asarray(weights)
    assert ids[0] == 0 and weights[0] == 6
    assert ids[1] == 2 and weights[1] == 3
    assert ids[2] == -1


def test_observation_counts():
    m = _map_with_shared_points()
    c = np.asarray(observation_counts(m))
    assert (c[:6] == 2).all()
    assert (c[6:9] == 2).all()
    assert (c[9:] == 0).all()


def test_add_keyframe_full_map_is_noop():
    """At capacity add_keyframe must refuse (kf = -1) and leave every
    slot — in particular keyframe 0, the gauge anchor — untouched."""
    m = make_empty_map(CAP)
    for i in range(CAP.max_keyframes):
        m, k = add_keyframe(m, jnp.eye(4), float(i), i, *_dummy_frame(10))
        assert int(k) == i
    T0 = np.asarray(m.kf_Tcw[0]).copy()
    fid = np.asarray(m.kf_frame_id).copy()
    m2, k = add_keyframe(
        m,
        jnp.full((4, 4), 7.0),
        99.0,
        99,
        *_dummy_frame(5),
    )
    assert int(k) == -1
    assert int(m2.n_kf) == CAP.max_keyframes
    assert np.array_equal(np.asarray(m2.kf_Tcw[0]), T0)
    assert np.array_equal(np.asarray(m2.kf_frame_id), fid)
    # freeing a slot makes insertion work again, into that slot
    m3 = erase_keyframe(m2, jnp.int32(3))
    m3, k = add_keyframe(m3, jnp.eye(4), 100.0, 100, *_dummy_frame(5))
    assert int(k) == 3


def test_add_points_capacity_pressure():
    """Batch insert with more rows than free slots: the overflow rows
    get slot -1 and live points keep their data."""
    m = make_empty_map(CAP)
    P = CAP.max_points
    B = P + 8
    xyz = jnp.ones((B, 3))
    desc = jnp.zeros((B, 8), jnp.uint32)
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (B, 1))
    m, slots = add_points(
        m, xyz, desc, normal, jnp.zeros(B), jnp.ones(B), jnp.int32(0),
        jnp.ones((B,), bool),
    )
    slots = np.asarray(slots)
    assert (slots >= 0).sum() == P
    assert int(m.n_pt) == P
    assert bool(m.pt_valid.all())


def test_erase_keyframe():
    m = _map_with_shared_points()
    m = erase_keyframe(m, jnp.int32(2))
    assert int(m.n_kf) == 2
    c = np.asarray(observation_counts(m))
    assert (c[6:9] == 1).all()
