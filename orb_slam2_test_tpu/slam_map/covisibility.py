"""Covisibility graph as batched reductions over the observation array.

The reference maintains covisibility edges incrementally with mutexes
(reference: KeyFrame::UpdateConnections — weight = number of shared
MapPoints, edge kept if weight >= 15, plus best-covisible orderings).
Here covisibility is *derived* from `kf_pt_idx` on demand with one
matmul over observation indicators — cheap on the MXU and always
consistent with the map (no incremental-update bugs possible).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam2_test_tpu.slam_map.mapstate import MapState

# reference: KeyFrame::UpdateConnections threshold `th = 15`
COVIS_THRESHOLD = 15


def observation_counts(m: MapState) -> jax.Array:
    """[P] — number of keyframes observing each point
    (MapPoint::Observations())."""
    P = m.pt_valid.shape[0]
    linked = (m.kf_pt_idx >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    flat = jnp.where(linked, m.kf_pt_idx, P).reshape(-1)
    counts = jnp.zeros((P,), dtype=jnp.int32).at[flat].add(1, mode="drop")
    return counts


def observation_indicator(m: MapState, dtype=jnp.bfloat16) -> jax.Array:
    """[K, P] 0/1 matrix: keyframe k observes point p."""
    K = m.kf_valid.shape[0]
    P = m.pt_valid.shape[0]
    linked = (m.kf_pt_idx >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    flat_pt = jnp.where(linked, m.kf_pt_idx, P)
    ind = jnp.zeros((K, P), dtype=dtype)
    rows = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[:, None], flat_pt.shape
    )
    return ind.at[rows, flat_pt].set(1.0, mode="drop")


def covisibility_weights(
    m: MapState, query_kf: jax.Array | None = None
) -> jax.Array:
    """Covisibility weight matrix.

    query_kf None: [K, K] full matrix (diag zeroed).
    query_kf [Q]:  [Q, K] rows for the query keyframes.

    weight[i, j] = #points observed by both. Full matrix: one MXU
    matmul over the observation indicator (bf16 accumulate in f32;
    counts <= N so exact). Few queries: a [P] indicator per query +
    one [K, N] gather-sum — building the full [K, P] indicator (a
    768k-element scatter into a 100 MB buffer at KITTI capacities)
    just to read Q rows costs ~10-15 ms per call on TPU and sits on
    the keyframe-insertion path three times.
    """
    if query_kf is None:
        ind = observation_indicator(m)
        w = jax.lax.dot_general(
            ind, ind, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        K = w.shape[0]
        w = w * (1.0 - jnp.eye(K, dtype=w.dtype))
        return w.astype(jnp.int32)
    K = m.kf_valid.shape[0]
    P = m.pt_valid.shape[0]
    linked = (m.kf_pt_idx >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    pt = jnp.clip(m.kf_pt_idx, 0)

    def one(q):
        rows = jnp.where(linked[q], m.kf_pt_idx[q], P)
        ind_q = jnp.zeros((P,), jnp.float32).at[rows].set(1.0, mode="drop")
        votes = jnp.sum(jnp.where(linked, ind_q[pt], 0.0), axis=1)
        votes = jnp.where(jnp.arange(K) == q, 0.0, votes)
        return votes

    w = jax.vmap(one)(query_kf)
    return w.astype(jnp.int32)


def best_covisible(
    m: MapState, kf_id: jax.Array, top_n: int
) -> tuple[jax.Array, jax.Array]:
    """Top-N covisible keyframes of kf_id by weight
    (KeyFrame::GetBestCovisibilityKeyFrames).

    Returns (kf_ids [top_n], weights [top_n]); entries with weight 0 are
    padding (no such neighbor).
    """
    w = covisibility_weights(m, kf_id[None])[0]
    weights, ids = jax.lax.top_k(w, top_n)
    return jnp.where(weights > 0, ids, -1), weights


def assign_parent(
    m: MapState, kf_id: jax.Array, covis_row: jax.Array | None = None
) -> MapState:
    """Set kf_id's spanning-tree parent to its most-covisible keyframe
    (KeyFrame::UpdateConnections first-time branch: `mbFirstConnection`
    -> parent = keyframe with the highest shared-point count). No-op if
    a parent is already assigned or no other valid keyframe shares
    points. `covis_row` optionally passes precomputed [K] weights."""
    if covis_row is None:
        covis_row = covisibility_weights(m, kf_id[None])[0]
    w = covis_row.astype(jnp.float32)  # [K]
    K = m.kf_valid.shape[0]
    eligible = m.kf_valid & (jnp.arange(K) != kf_id)
    w = jnp.where(eligible, w, -1.0)
    best = jnp.argmax(w)
    assign = (m.kf_parent[kf_id] < 0) & (w[best] > 0)
    new_parent = jnp.where(
        assign, best.astype(jnp.int32), m.kf_parent[kf_id]
    )
    return m._replace(kf_parent=m.kf_parent.at[kf_id].set(new_parent))


def add_loop_edge(m: MapState, kf_a: jax.Array, kf_b: jax.Array) -> MapState:
    """Record a loop-closure edge between two keyframes
    (KeyFrame::AddLoopEdge, both directions). Loop edges survive
    keyframe culling checks in the reference; here culling never picks
    loop keyframes because they stay strongly covisible post-fusion."""
    return m._replace(
        kf_loop_edge=m.kf_loop_edge.at[kf_a].set(kf_b).at[kf_b].set(kf_a)
    )


def local_keyframes(
    m: MapState, kf_id: jax.Array, k1: int, k2_per: int
) -> jax.Array:
    """Local-map keyframe set: K1 best covisible + their best covisible
    (Tracking::UpdateLocalKeyFrames structure, capacity-bounded).

    Returns a sorted unique array [k1 + k1*k2_per + 1] of keyframe ids,
    -1-padded. Always includes kf_id itself.
    """
    ids1, w1 = best_covisible(m, kf_id, k1)
    # neighbors of neighbors
    safe_ids1 = jnp.clip(ids1, 0)
    w2 = covisibility_weights(m, safe_ids1)  # [k1, K]
    nw, nids = jax.lax.top_k(w2, k2_per)  # [k1, k2_per]
    nids = jnp.where((nw > 0) & (ids1[:, None] >= 0), nids, -1)
    all_ids = jnp.concatenate([kf_id[None], ids1, nids.reshape(-1)])
    # unique via sort + dedup mask (fixed shape)
    s = jnp.sort(all_ids)
    dup = jnp.concatenate([jnp.array([False]), s[1:] == s[:-1]])
    s = jnp.where(dup, -1, s)
    return jnp.sort(s)[::-1]  # valid ids first, then -1 padding


def build_observer_bitmap(m: MapState) -> jax.Array:
    """[P, K] uint8 point->observer-keyframe incidence bitmap.

    The per-frame tracking hot path needs "which keyframes observe
    these matched points" (UpdateLocalKeyFrames' keyframeCounter over
    MapPoint::GetObservations()). Deriving it from kf_pt_idx costs a
    [K, N] map-wide gather (~4-5 ms on a v5e at KITTI capacities) PER
    CONSUMER; since map links only mutate inside the keyframe-insertion
    / loop-closure programs, the tracker instead carries this bitmap as
    a cached index: rebuilt inside those programs (one ~5 ms scatter),
    read with tiny [n_matched, K] gathers every frame.

    Consumers must mask columns by kf_valid — after a keyframe cull the
    bitmap may keep stale bits until the next rebuild (equivalent to
    the reference's covisibility lists between UpdateConnections
    calls)."""
    K, N = m.kf_pt_idx.shape
    P = m.pt_valid.shape[0]
    linked = (m.kf_pt_idx >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    pid = jnp.where(linked, m.kf_pt_idx, P).reshape(-1)
    kf_of = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[:, None], (K, N)
    ).reshape(-1)
    return jnp.zeros((P, K), jnp.uint8).at[pid, kf_of].set(
        1, mode="drop"
    )


def covis_row_from_bitmap(
    m: MapState, bitmap: jax.Array, kf_id: jax.Array
) -> jax.Array:
    """kf_id's [K] covisibility-weight row from the observer bitmap:
    one [N, K] gather instead of the [K, N] map-wide reduction of
    covisibility_weights. Semantics match covisibility_weights (counts
    shared observations of the query's features)."""
    K = m.kf_valid.shape[0]
    row = m.kf_pt_idx[kf_id]  # [N]
    ok = (row >= 0) & m.kf_kp_valid[kf_id]
    rows = bitmap[jnp.clip(row, 0)]  # [N, K] uint8
    w = jnp.sum(
        jnp.where(ok[:, None], rows, 0).astype(jnp.int32), axis=0
    )
    w = jnp.where(m.kf_valid, w, 0)
    return w.at[kf_id].set(0)
