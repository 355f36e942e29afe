"""Spanning tree + loop edges (reference KeyFrame::mpParent /
mspLoopEdges / mTcp; SetBadFlag tree repair; SaveTrajectory* climbing).
"""

import numpy as np
import jax.numpy as jnp

from orb_slam2_test_tpu.slam_map.mapstate import (
    MapCapacity,
    add_keyframe,
    erase_keyframe,
    make_empty_map,
)
from orb_slam2_test_tpu.slam_map.covisibility import (
    add_loop_edge,
    assign_parent,
)

CAP = MapCapacity(max_keyframes=8, max_features=16, max_points=64)


def _frame(pt_idx):
    N = CAP.max_features
    return (
        jnp.zeros((N, 2)),
        jnp.zeros((N,), jnp.int32),
        jnp.zeros((N,)),
        jnp.full((N,), -1.0),
        jnp.full((N,), -1.0),
        jnp.zeros((N, 8), jnp.uint32),
        jnp.arange(N) < 8,
        jnp.asarray(pt_idx, jnp.int32),
    )


def _map_three_kfs():
    """kf0 and kf1 share 6 points, kf1 and kf2 share 4 points."""
    m = make_empty_map(CAP)
    m = m._replace(pt_valid=m.pt_valid.at[:10].set(True))
    row0 = np.full(16, -1)
    row0[:6] = np.arange(6)
    row1 = np.full(16, -1)
    row1[:6] = np.arange(6)
    row1[6:8] = [6, 7]
    row2 = np.full(16, -1)
    row2[:4] = [4, 5, 6, 7]
    m, k0 = add_keyframe(m, jnp.eye(4), 0.0, 0, *_frame(row0))
    m, k1 = add_keyframe(m, jnp.eye(4), 1.0, 1, *_frame(row1))
    T2 = jnp.eye(4).at[0, 3].set(0.5)
    m, k2 = add_keyframe(m, T2, 2.0, 2, *_frame(row2))
    return m, int(k0), int(k1), int(k2)


def test_assign_parent_most_covisible():
    m, k0, k1, k2 = _map_three_kfs()
    m = assign_parent(m, jnp.asarray(k1))
    m = assign_parent(m, jnp.asarray(k2))
    assert int(m.kf_parent[k1]) == k0  # shares 6 pts with k0
    assert int(m.kf_parent[k2]) == k1  # shares 4 pts with k1, 2 with k0
    # idempotent: a second call must not reassign
    m2 = assign_parent(m, jnp.asarray(k2))
    assert int(m2.kf_parent[k2]) == k1


def test_assign_parent_no_covisibility_stays_root():
    m = make_empty_map(CAP)
    row = np.full(16, -1)
    m, k0 = add_keyframe(m, jnp.eye(4), 0.0, 0, *_frame(row))
    m = assign_parent(m, jnp.asarray(int(k0)))
    assert int(m.kf_parent[int(k0)]) == -1


def test_erase_reparents_live_children_and_keeps_victim_chain():
    m, k0, k1, k2 = _map_three_kfs()
    m = assign_parent(m, jnp.asarray(k1))
    m = assign_parent(m, jnp.asarray(k2))
    Tcw1 = np.asarray(m.kf_Tcw[k1])
    Tcw0 = np.asarray(m.kf_Tcw[k0])
    m = erase_keyframe(m, jnp.asarray(k1))
    # live child k2 adopts grandparent k0
    assert int(m.kf_parent[k2]) == k0
    # victim keeps its parent pointer + relative pose for export climbing
    assert int(m.kf_parent[k1]) == k0
    np.testing.assert_allclose(
        np.asarray(m.kf_Tcp[k1]), Tcw1 @ np.linalg.inv(Tcw0), atol=1e-5
    )


def test_loop_edge_recorded_both_directions_and_severed_on_erase():
    m, k0, k1, k2 = _map_three_kfs()
    m = add_loop_edge(m, jnp.asarray(k0), jnp.asarray(k2))
    assert int(m.kf_loop_edge[k0]) == k2
    assert int(m.kf_loop_edge[k2]) == k0
    m = erase_keyframe(m, jnp.asarray(k2))
    assert int(m.kf_loop_edge[k0]) == -1
    assert int(m.kf_loop_edge[k2]) == -1


def test_trajectory_export_climbs_culled_refs():
    """A frame referencing a culled keyframe must come out at the same
    world pose via the victim's Tcp chain."""
    from orb_slam2_test_tpu.geometry.camera import PinholeCamera
    from orb_slam2_test_tpu.engine.tracking import Tracker, TrackerConfig

    cam = PinholeCamera(fx=100.0, fy=100.0, cx=32.0, cy=24.0,
                        width=64, height=48)
    tr = Tracker(cam, TrackerConfig(max_keyframes=8, n_features=16,
                                    max_points=64))
    m, k0, k1, k2 = _map_three_kfs()
    tr.map = m._replace(
        kf_parent=m.kf_parent.at[k1].set(k0).at[k2].set(k1)
    )
    T_frame = np.eye(4)
    T_frame[1, 3] = 2.0
    Tcw1 = np.asarray(tr.map.kf_Tcw[k1])
    tr.rel_trajectory = [(0.5, k1, T_frame @ np.linalg.inv(Tcw1))]
    expected = [(0.5, T_frame)]

    before = tr.export_trajectory()
    np.testing.assert_allclose(before[0][1], expected[0][1], atol=1e-5)

    tr.map = erase_keyframe(tr.map, jnp.asarray(k1))
    after = tr.export_trajectory()
    np.testing.assert_allclose(after[0][1], expected[0][1], atol=1e-5)
