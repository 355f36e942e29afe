"""LocalMapping stages: duplicate-landmark fusion (SearchInNeighbors /
ORBmatcher::Fuse + MapPoint::Replace) and redundant-keyframe culling
(LocalMapping::KeyFrameCulling). Reference: src/LocalMapping.cc:~500-660.
"""

import numpy as np
import jax.numpy as jnp

from orb_slam2_test_tpu.engine.local_mapping import (
    cull_keyframes,
    fuse_with_neighbor,
)
from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.slam_map.mapstate import (
    MapCapacity,
    add_keyframe,
    add_points,
    make_empty_map,
)

CAP = MapCapacity(max_keyframes=8, max_features=16, max_points=64)
CAM = PinholeCamera(fx=256.0, fy=256.0, cx=160.0, cy=120.0,
                    width=320, height=240)


def _project(xyz):
    u = CAM.fx * xyz[:, 0] / xyz[:, 2] + CAM.cx
    v = CAM.fy * xyz[:, 1] / xyz[:, 2] + CAM.cy
    return np.stack([u, v], -1)


def _frame_arrays(uv, desc, n_valid, pt_idx):
    N = CAP.max_features
    uv_full = np.zeros((N, 2), np.float32)
    uv_full[: len(uv)] = uv
    desc_full = np.zeros((N, 8), np.uint32)
    desc_full[: len(desc)] = desc
    level = jnp.zeros((N,), jnp.int32)
    angle = jnp.zeros((N,))
    ur = jnp.full((N,), -1.0)
    depth = jnp.full((N,), -1.0)
    kp_valid = jnp.arange(N) < n_valid
    row = np.full((N,), -1, np.int32)
    row[: len(pt_idx)] = pt_idx
    return (jnp.asarray(uv_full), level, angle, ur, depth,
            jnp.asarray(desc_full), kp_valid, jnp.asarray(row))


def _rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)


def test_fuse_merges_duplicate_points(rng):
    """Two keyframes at the same pose each created their own landmark
    for the same physical 3D points; fusing must merge each pair into
    one survivor linked from both keyframes."""
    n = 6
    xyz = np.stack(
        [np.linspace(-1.0, 1.0, n), np.zeros(n), np.full(n, 5.0)], -1
    ).astype(np.float32)
    uv = _project(xyz)
    desc = _rand_desc(rng, n)

    m = make_empty_map(CAP)
    # kf0 owns points 0..5; kf1 owns duplicate points 6..11 (same xyz/desc)
    normal = np.tile([[0.0, 0.0, 1.0]], (n, 1)).astype(np.float32)
    dist = np.linalg.norm(xyz, axis=1).astype(np.float32)
    mind, maxd = jnp.asarray(dist / 1.2 ** 7), jnp.asarray(dist)
    m, s0 = add_points(m, jnp.asarray(xyz), jnp.asarray(desc),
                       jnp.asarray(normal), mind, maxd,
                       jnp.int32(0), jnp.ones(n, bool))
    m, s1 = add_points(m, jnp.asarray(xyz), jnp.asarray(desc),
                       jnp.asarray(normal), mind, maxd,
                       jnp.int32(1), jnp.ones(n, bool))
    s0, s1 = np.asarray(s0), np.asarray(s1)

    m, k0 = add_keyframe(m, jnp.eye(4), 0.0, 0,
                         *_frame_arrays(uv, desc, n, s0))
    m, k1 = add_keyframe(m, jnp.eye(4), 1.0, 1,
                         *_frame_arrays(uv, desc, n, s1))
    assert int(m.n_pt) == 2 * n

    m2, n_fused = fuse_with_neighbor(m, CAM, k0, k1)
    assert int(n_fused) == n
    # one of each duplicate pair died
    assert int(jnp.sum(m2.pt_valid)) == n
    assert int(m2.n_pt) == n
    # both keyframes' features now link to the SAME surviving point
    r0 = np.asarray(m2.kf_pt_idx[0][:n])
    r1 = np.asarray(m2.kf_pt_idx[1][:n])
    np.testing.assert_array_equal(r0, r1)
    assert np.all(r0 >= 0)
    valid = np.asarray(m2.pt_valid)
    assert valid[r0].all()


def test_fuse_adopts_unmatched_features(rng):
    """A feature with no landmark adopts a projected neighbor point."""
    n = 4
    xyz = np.stack(
        [np.linspace(-0.8, 0.8, n), np.zeros(n), np.full(n, 4.0)], -1
    ).astype(np.float32)
    uv = _project(xyz)
    desc = _rand_desc(rng, n)
    normal = np.tile([[0.0, 0.0, 1.0]], (n, 1)).astype(np.float32)

    m = make_empty_map(CAP)
    dist = np.linalg.norm(xyz, axis=1).astype(np.float32)
    m, s1 = add_points(m, jnp.asarray(xyz), jnp.asarray(desc),
                       jnp.asarray(normal), jnp.asarray(dist / 1.2 ** 7),
                       jnp.asarray(dist), jnp.int32(1), jnp.ones(n, bool))
    s1 = np.asarray(s1)
    # kf0 sees the same features but has NO landmarks
    m, k0 = add_keyframe(m, jnp.eye(4), 0.0, 0,
                         *_frame_arrays(uv, desc, n, np.full(n, -1)))
    m, k1 = add_keyframe(m, jnp.eye(4), 1.0, 1,
                         *_frame_arrays(uv, desc, n, s1))

    m2, n_fused = fuse_with_neighbor(m, CAM, k0, k1)
    assert int(n_fused) == n
    r0 = np.asarray(m2.kf_pt_idx[0][:n])
    np.testing.assert_array_equal(np.sort(r0), np.sort(s1))
    # nothing was erased — pure adoption
    assert int(m2.n_pt) == n


def test_fuse_invalid_neighbor_is_noop(rng):
    m = make_empty_map(CAP)
    n = 3
    uv = np.zeros((n, 2), np.float32)
    m, k0 = add_keyframe(m, jnp.eye(4), 0.0, 0,
                         *_frame_arrays(uv, _rand_desc(rng, n), n,
                                        np.full(n, -1)))
    m2, n_fused = fuse_with_neighbor(m, CAM, k0, jnp.asarray(-1))
    assert int(n_fused) == 0
    np.testing.assert_array_equal(
        np.asarray(m2.kf_pt_idx), np.asarray(m.kf_pt_idx)
    )


def _stacked_keyframes(rng, n_kf, n_pts):
    """n_kf keyframes at slightly different poses, all observing the
    same n_pts landmarks at level 0."""
    xyz = np.stack(
        [np.linspace(-1.0, 1.0, n_pts), np.zeros(n_pts),
         np.full(n_pts, 5.0)], -1
    ).astype(np.float32)
    desc = _rand_desc(rng, n_pts)
    normal = np.tile([[0.0, 0.0, 1.0]], (n_pts, 1)).astype(np.float32)
    m = make_empty_map(CAP)
    dist = np.linalg.norm(xyz, axis=1).astype(np.float32)
    m, slots = add_points(m, jnp.asarray(xyz), jnp.asarray(desc),
                          jnp.asarray(normal), jnp.asarray(dist / 1.2 ** 7),
                          jnp.asarray(dist), jnp.int32(0),
                          jnp.ones(n_pts, bool))
    slots = np.asarray(slots)
    uv = _project(xyz)
    for k in range(n_kf):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.01 * k
        m, _ = add_keyframe(m, jnp.asarray(T), float(k), k,
                            *_frame_arrays(uv, desc, n_pts, slots))
    return m, slots


def test_cull_keyframes_removes_one_redundant(rng):
    # 5 KFs x 12 shared points: every observation is seen by 4 others
    m, _ = _stacked_keyframes(rng, 5, 16)
    cur = jnp.asarray(4)
    m2, culled = cull_keyframes(m, cur)
    c = int(culled)
    assert c in (1, 2, 3)  # never kf0 (origin) or kf4 (current)
    assert not bool(m2.kf_valid[c])
    assert int(m2.n_kf) == 4
    assert np.all(np.asarray(m2.kf_pt_idx[c]) == -1)
    # points survive, just lose one observation
    assert int(jnp.sum(m2.pt_valid)) == 16
    # a second call culls another one
    m3, culled2 = cull_keyframes(m2, cur)
    c2 = int(culled2)
    assert c2 in (1, 2, 3) and c2 != c


def test_cull_keyframes_rehomes_point_refs(rng):
    m, slots = _stacked_keyframes(rng, 5, 16)
    m2, culled = cull_keyframes(m, jnp.asarray(4))
    c = int(culled)
    # force the scenario: every point referenced the victim
    m_forced = m._replace(
        pt_ref_kf=jnp.where(m.pt_valid, c, m.pt_ref_kf)
    )
    m3, culled3 = cull_keyframes(m_forced, jnp.asarray(4))
    assert int(culled3) == c
    refs = np.asarray(m3.pt_ref_kf)[np.asarray(m3.pt_valid)]
    assert np.all(refs >= 0)
    assert not np.any(refs == c)
    # re-homed to a surviving observer
    assert np.all(np.asarray(m3.kf_valid)[refs])


def test_cull_keyframes_keeps_needed_views(rng):
    # 3 KFs: each observation has only 2 other observers (< 3) — no cull
    m, _ = _stacked_keyframes(rng, 3, 16)
    m2, culled = cull_keyframes(m, jnp.asarray(2))
    assert int(culled) == -1
    np.testing.assert_array_equal(
        np.asarray(m2.kf_valid), np.asarray(m.kf_valid)
    )


def test_fuse_round_matches_sequential(rng):
    """fuse_round (both directions, all neighbors, one Replace) merges
    the same duplicate set the sequential per-neighbor fuse does."""
    from orb_slam2_test_tpu.engine.local_mapping import fuse_round
    from orb_slam2_test_tpu.slam_map.covisibility import (
        observation_counts,
    )

    n = 6
    xyz = np.stack(
        [np.linspace(-1.0, 1.0, n), np.zeros(n), np.full(n, 5.0)], -1
    ).astype(np.float32)
    uv = _project(xyz)
    desc = _rand_desc(rng, n)
    normal = np.tile([[0.0, 0.0, 1.0]], (n, 1)).astype(np.float32)
    dist = np.linalg.norm(xyz, axis=1).astype(np.float32)
    mind, maxd = jnp.asarray(dist / 1.2 ** 7), jnp.asarray(dist)

    m = make_empty_map(CAP)
    m, s0 = add_points(m, jnp.asarray(xyz), jnp.asarray(desc),
                       jnp.asarray(normal), mind, maxd,
                       jnp.int32(0), jnp.ones(n, bool))
    m, s1 = add_points(m, jnp.asarray(xyz), jnp.asarray(desc),
                       jnp.asarray(normal), mind, maxd,
                       jnp.int32(1), jnp.ones(n, bool))
    s0, s1 = np.asarray(s0), np.asarray(s1)
    m, k0 = add_keyframe(m, jnp.eye(4), 0.0, 0,
                         *_frame_arrays(uv, desc, n, s0))
    m, k1 = add_keyframe(m, jnp.eye(4), 1.0, 1,
                         *_frame_arrays(uv, desc, n, s1))
    # a second neighbor with NO landmarks: pure adoption via reverse dir
    m, k2 = add_keyframe(m, jnp.eye(4), 2.0, 2,
                         *_frame_arrays(uv, desc, n, np.full(n, -1)))

    nbrs = jnp.asarray([int(k1), int(k2), -1], jnp.int32)
    obs = observation_counts(m)
    m2, n_fused, obs2 = jax.jit(
        fuse_round, static_argnames=("cam", "n_nbrs")
    )(m, CAM, k0, nbrs, obs, n_nbrs=3)

    # duplicates merged: one survivor per pair, linked from k0 AND k1
    assert int(jnp.sum(m2.pt_valid)) == n
    r0 = np.asarray(m2.kf_pt_idx[int(k0)][:n])
    r1 = np.asarray(m2.kf_pt_idx[int(k1)][:n])
    np.testing.assert_array_equal(r0, r1)
    # k2 adopted the survivors through the reverse direction
    r2 = np.asarray(m2.kf_pt_idx[int(k2)][:n])
    np.testing.assert_array_equal(np.sort(r2), np.sort(r0))
    # counts: survivors observed by all three keyframes
    assert np.all(np.asarray(obs2)[r0] == 3)


import jax  # noqa: E402
