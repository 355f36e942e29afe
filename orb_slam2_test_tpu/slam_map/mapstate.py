"""MapState — the SLAM map as a struct-of-arrays pytree.

TPU-native replacement for the reference's pointer-graph map
(reference: src/Map.cc registries; src/KeyFrame.cc / src/MapPoint.cc
objects with per-object mutexes). Design rules:

- Fixed capacities (max keyframes K, features-per-keyframe N, points P)
  with validity masks instead of allocation/deletion. `SetBadFlag`
  becomes clearing a mask bit; "new KeyFrame" writes into a free slot.
- The primary association structure is `kf_pt_idx [K, N] int32`: feature
  n of keyframe k observes map point kf_pt_idx[k, n] (-1 = none). This
  is the reference's `KeyFrame::mvpMapPoints` turned into one dense
  array; point->observation queries become segment reductions over it,
  covisibility becomes a matmul of observation indicators.
- All mutation is functional: ops return a new MapState. Under jit the
  updates are donated/aliased so there is no copy in steady state.

Capacities are static Python ints (MapCapacity) so every jitted program
has static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MapCapacity:
    """Static capacities. Hashable -> usable as a static jit arg."""

    max_keyframes: int = 512
    max_features: int = 1000  # per keyframe (YAML ORBextractor.nFeatures)
    max_points: int = 65536
    n_levels: int = 8  # pyramid levels (YAML ORBextractor.nLevels)
    scale_factor: float = 1.2  # YAML ORBextractor.scaleFactor

    @property
    def level_scales(self):
        """sigma per level: scale_factor**level (reference
        ORBextractor::mvScaleFactor)."""
        import numpy as np

        return np.power(self.scale_factor, np.arange(self.n_levels)).astype(
            "float32"
        )

    @property
    def level_sigma2(self):
        return self.level_scales**2


class MapState(NamedTuple):
    """All arrays; leading dims are the static capacities.

    Keyframe arrays (capacity K, features N):
      kf_Tcw      [K, 4, 4] world->camera pose
      kf_valid    [K]       slot in use
      kf_timestamp[K]
      kf_frame_id [K]       id of the source frame (for trajectory export)
      kf_uv       [K, N, 2] undistorted keypoint pixel coords
      kf_level    [K, N]    pyramid level of each keypoint
      kf_angle    [K, N]    keypoint orientation (radians)
      kf_ur       [K, N]    right-image u coordinate (stereo/RGB-D; -1 mono)
      kf_depth    [K, N]    keypoint depth (stereo/RGB-D; -1 unknown)
      kf_desc     [K, N, 8] 256-bit ORB descriptors packed in uint32
      kf_kp_valid [K, N]    feature slot in use (frames yield < N features)
      kf_pt_idx   [K, N]    map-point index observed by this feature (-1 none)
      kf_parent   [K]       spanning-tree parent (-1 root/unset; reference
                            KeyFrame::mpParent, assigned at the first
                            UpdateConnections = most-covisible keyframe)
      kf_loop_edge[K]       loop-closure edge partner (-1 none; reference
                            KeyFrame::mspLoopEdges, array-ified to one
                            edge per keyframe — loops are rare events)
      kf_Tcp      [K, 4, 4] pose relative to parent, captured when the
                            keyframe is erased (reference KeyFrame::mTcp
                            set in SetBadFlag; SaveTrajectory* climbs
                            the tree through bad keyframes with it)

    Point arrays (capacity P):
      pt_xyz      [P, 3]
      pt_valid    [P]
      pt_desc     [P, 8]    distinctive descriptor (min-median-distance member)
      pt_normal   [P, 3]    mean viewing direction
      pt_min_dist [P]       scale-invariance range (reference
      pt_max_dist [P]         MapPoint::UpdateNormalAndDepth)
      pt_ref_kf   [P]       reference keyframe index (slot)
      pt_first_kf [P]       FRAME id of the creating keyframe
                            (MapPointCulling age rule; frame ids are
                            monotone across insertions, keyframe SLOTS
                            are recycled and are not)
      pt_visible  [P]       visibility counter (IncreaseVisible)
      pt_found    [P]       found counter (IncreaseFound)

    Scalars:
      n_kf        number of live keyframes (int32)
      n_pt        number of live points (int32)
    """

    kf_Tcw: jax.Array
    kf_valid: jax.Array
    kf_timestamp: jax.Array
    kf_frame_id: jax.Array
    kf_uv: jax.Array
    kf_level: jax.Array
    kf_angle: jax.Array
    kf_ur: jax.Array
    kf_depth: jax.Array
    kf_desc: jax.Array
    kf_kp_valid: jax.Array
    kf_pt_idx: jax.Array
    kf_parent: jax.Array
    kf_loop_edge: jax.Array
    kf_Tcp: jax.Array
    pt_xyz: jax.Array
    pt_valid: jax.Array
    pt_desc: jax.Array
    pt_normal: jax.Array
    pt_min_dist: jax.Array
    pt_max_dist: jax.Array
    pt_ref_kf: jax.Array
    pt_first_kf: jax.Array
    pt_visible: jax.Array
    pt_found: jax.Array
    n_kf: jax.Array
    n_pt: jax.Array


def make_empty_map(cap: MapCapacity) -> MapState:
    K, N, P = cap.max_keyframes, cap.max_features, cap.max_points
    f32, i32 = jnp.float32, jnp.int32
    return MapState(
        kf_Tcw=jnp.tile(jnp.eye(4, dtype=f32), (K, 1, 1)),
        kf_valid=jnp.zeros((K,), dtype=bool),
        kf_timestamp=jnp.zeros((K,), dtype=f32),
        kf_frame_id=jnp.full((K,), -1, dtype=i32),
        kf_uv=jnp.zeros((K, N, 2), dtype=f32),
        kf_level=jnp.zeros((K, N), dtype=i32),
        kf_angle=jnp.zeros((K, N), dtype=f32),
        kf_ur=jnp.full((K, N), -1.0, dtype=f32),
        kf_depth=jnp.full((K, N), -1.0, dtype=f32),
        kf_desc=jnp.zeros((K, N, 8), dtype=jnp.uint32),
        kf_kp_valid=jnp.zeros((K, N), dtype=bool),
        kf_pt_idx=jnp.full((K, N), -1, dtype=i32),
        kf_parent=jnp.full((K,), -1, dtype=i32),
        kf_loop_edge=jnp.full((K,), -1, dtype=i32),
        kf_Tcp=jnp.tile(jnp.eye(4, dtype=f32), (K, 1, 1)),
        pt_xyz=jnp.zeros((P, 3), dtype=f32),
        pt_valid=jnp.zeros((P,), dtype=bool),
        pt_desc=jnp.zeros((P, 8), dtype=jnp.uint32),
        pt_normal=jnp.zeros((P, 3), dtype=f32),
        pt_min_dist=jnp.zeros((P,), dtype=f32),
        pt_max_dist=jnp.zeros((P,), dtype=f32),
        pt_ref_kf=jnp.full((P,), -1, dtype=i32),
        pt_first_kf=jnp.full((P,), -1, dtype=i32),
        pt_visible=jnp.zeros((P,), dtype=f32),
        pt_found=jnp.zeros((P,), dtype=f32),
        n_kf=jnp.zeros((), dtype=i32),
        n_pt=jnp.zeros((), dtype=i32),
    )


def grow_map(m: MapState, old_cap: MapCapacity, new_cap: MapCapacity) -> MapState:
    """Re-bucket a map into larger capacities (host-side, rare).

    The reference heap-allocates keyframes/points so its map is
    unbounded (Map.cc:~1-130); here capacities are static shapes, so
    growth = pad every array into a fresh empty map of the new capacity
    and recompile downstream programs (power-of-two growth keeps the
    number of recompiles logarithmic in sequence length). All indices
    (kf_pt_idx, kf_parent, pt_ref_kf, ...) remain valid because slots
    keep their positions.
    """
    if (
        new_cap.max_features != old_cap.max_features
        or new_cap.n_levels != old_cap.n_levels
        or new_cap.scale_factor != old_cap.scale_factor
    ):
        raise ValueError("grow_map can only grow keyframe/point capacity")
    if (
        new_cap.max_keyframes < old_cap.max_keyframes
        or new_cap.max_points < old_cap.max_points
    ):
        raise ValueError("grow_map cannot shrink capacities")
    K0, P0 = old_cap.max_keyframes, old_cap.max_points
    empty = make_empty_map(new_cap)
    out = {}
    for f in MapState._fields:
        v = getattr(m, f)
        if f.startswith("kf_"):
            out[f] = getattr(empty, f).at[:K0].set(v)
        elif f.startswith("pt_"):
            out[f] = getattr(empty, f).at[:P0].set(v)
        else:  # scalars n_kf / n_pt
            out[f] = v
    return MapState(**out)


# ---------------------------------------------------------------------------
# Slot allocation (functional replacements for `new KeyFrame` / `new MapPoint`)
# ---------------------------------------------------------------------------


def alloc_keyframe_slot(m: MapState) -> tuple[jax.Array, jax.Array]:
    """(slot, ok): first free keyframe slot and whether one exists.

    When every slot is live, argmin returns 0 — which is the gauge
    anchor keyframe; overwriting it would corrupt the map, so callers
    must gate on `ok`. `add_keyframe` does this internally.
    """
    k = jnp.argmin(m.kf_valid.astype(jnp.int32))
    return k, jnp.logical_not(m.kf_valid[k])


def alloc_point_slots(m: MapState, count: int) -> jax.Array:
    """Indices of `count` free point slots (static count; top-k of ~valid).

    If fewer than `count` slots are free the extra indices point at used
    slots — callers must gate writes on the returned `ok` mask.
    Returns (slots [count], ok [count]).
    """
    free = jnp.logical_not(m.pt_valid)
    # top_k over {0,1} returns free slots first, in ascending index order
    # within ties thanks to stable top_k on equal values.
    k = min(count, free.shape[0])
    vals, slots = jax.lax.top_k(free.astype(jnp.int32), k)
    if k < count:  # request larger than capacity: overflow rows fail
        slots = jnp.concatenate(
            [slots, jnp.zeros((count - k,), slots.dtype)]
        )
        vals = jnp.concatenate([vals, jnp.zeros((count - k,), vals.dtype)])
    return slots, vals > 0


def add_keyframe(
    m: MapState,
    Tcw: jax.Array,
    timestamp: jax.Array,
    frame_id: jax.Array,
    uv: jax.Array,
    level: jax.Array,
    angle: jax.Array,
    ur: jax.Array,
    depth: jax.Array,
    desc: jax.Array,
    kp_valid: jax.Array,
    pt_idx: jax.Array,
) -> tuple[MapState, jax.Array]:
    """Insert a keyframe snapshot into a free slot; returns (map, kf_id).

    Functional equivalent of `new KeyFrame(frame, map, kfdb)` +
    `Map::AddKeyFrame` (reference: Tracking::CreateNewKeyFrame).

    When all slots are live (no heap to grow into, unlike the
    reference), the insert is a NO-OP and kf_id = -1: every update
    targets the out-of-bounds index K and is dropped. Callers must
    treat kf_id < 0 as "map full" (the tracker refuses insertion
    before this point via its live-keyframe count; this is the
    device-side backstop protecting keyframe 0, the gauge anchor).
    """
    k, ok = alloc_keyframe_slot(m)
    K = m.kf_valid.shape[0]
    t = jnp.where(ok, k, K)  # OOB target drops every write when full
    m = m._replace(
        kf_Tcw=m.kf_Tcw.at[t].set(Tcw, mode="drop"),
        kf_valid=m.kf_valid.at[t].set(True, mode="drop"),
        kf_timestamp=m.kf_timestamp.at[t].set(timestamp, mode="drop"),
        kf_frame_id=m.kf_frame_id.at[t].set(frame_id, mode="drop"),
        kf_uv=m.kf_uv.at[t].set(uv, mode="drop"),
        kf_level=m.kf_level.at[t].set(level, mode="drop"),
        kf_angle=m.kf_angle.at[t].set(angle, mode="drop"),
        kf_ur=m.kf_ur.at[t].set(ur, mode="drop"),
        kf_depth=m.kf_depth.at[t].set(depth, mode="drop"),
        kf_desc=m.kf_desc.at[t].set(desc, mode="drop"),
        kf_kp_valid=m.kf_kp_valid.at[t].set(kp_valid, mode="drop"),
        kf_pt_idx=m.kf_pt_idx.at[t].set(pt_idx, mode="drop"),
        # fresh slot: no tree/loop links yet (slots can be recycled)
        kf_parent=m.kf_parent.at[t].set(-1, mode="drop"),
        kf_loop_edge=m.kf_loop_edge.at[t].set(-1, mode="drop"),
        kf_Tcp=m.kf_Tcp.at[t].set(jnp.eye(4), mode="drop"),
        n_kf=m.n_kf + ok.astype(jnp.int32),
    )
    return m, jnp.where(ok, k, -1).astype(jnp.int32)


def add_points(
    m: MapState,
    xyz: jax.Array,  # [B, 3]
    desc: jax.Array,  # [B, 8] uint32
    normal: jax.Array,  # [B, 3]
    min_dist: jax.Array,  # [B]
    max_dist: jax.Array,  # [B]
    ref_kf: jax.Array,  # [] or [B]
    ok: jax.Array,  # [B] — only rows with ok=True are inserted
) -> tuple[MapState, jax.Array]:
    """Batch-insert points into free slots; returns (map, slots [B]).

    slots[i] = -1 where not inserted (ok=False or capacity exhausted).
    """
    B = xyz.shape[0]
    slots, free_ok = alloc_point_slots(m, B)
    ins = ok & free_ok
    # For masked-out rows scatter to a dump slot (capacity-1 guaranteed to
    # be overwritten correctly because drop mode 'drop' skips OOB): use
    # index P (out of bounds) so XLA drops the update.
    P = m.pt_valid.shape[0]
    tgt = jnp.where(ins, slots, P)
    count = jnp.sum(ins.astype(jnp.int32))
    ref = jnp.broadcast_to(ref_kf, (B,))
    # creation stamp = the creating keyframe's FRAME id (callers insert
    # points only for keyframes already in the map)
    first_stamp = m.kf_frame_id[jnp.clip(ref, 0)]
    m = m._replace(
        pt_xyz=m.pt_xyz.at[tgt].set(xyz, mode="drop"),
        pt_valid=m.pt_valid.at[tgt].set(True, mode="drop"),
        pt_desc=m.pt_desc.at[tgt].set(desc, mode="drop"),
        pt_normal=m.pt_normal.at[tgt].set(normal, mode="drop"),
        pt_min_dist=m.pt_min_dist.at[tgt].set(min_dist, mode="drop"),
        pt_max_dist=m.pt_max_dist.at[tgt].set(max_dist, mode="drop"),
        pt_ref_kf=m.pt_ref_kf.at[tgt].set(ref, mode="drop"),
        pt_first_kf=m.pt_first_kf.at[tgt].set(first_stamp, mode="drop"),
        pt_visible=m.pt_visible.at[tgt].set(1.0, mode="drop"),
        pt_found=m.pt_found.at[tgt].set(1.0, mode="drop"),
        n_pt=m.n_pt + count,
    )
    return m, jnp.where(ins, slots, -1)


def erase_points(m: MapState, pt_ids: jax.Array) -> MapState:
    """Mark points bad and detach all their observations.

    Functional MapPoint::SetBadFlag: clears validity and removes the
    feature->point links pointing at them.
    """
    P = m.pt_valid.shape[0]
    bad = jnp.zeros((P,), dtype=bool).at[pt_ids].set(True, mode="drop")
    # detach observations referencing a bad point
    linked = m.kf_pt_idx >= 0
    obs_bad = jnp.where(linked, bad[jnp.clip(m.kf_pt_idx, 0)], False)
    n_erased = jnp.sum(bad & m.pt_valid)
    return m._replace(
        pt_valid=m.pt_valid & jnp.logical_not(bad),
        kf_pt_idx=jnp.where(obs_bad, -1, m.kf_pt_idx),
        n_pt=m.n_pt - n_erased.astype(jnp.int32),
    )


def erase_keyframe(m: MapState, kf_id: jax.Array) -> MapState:
    """Mark a keyframe bad, detach its observations, and repair the
    spanning tree (KeyFrame::SetBadFlag):

    - children adopt the erased keyframe's parent (the reference
      re-parents each child to its best covisible candidate — adopting
      the grandparent keeps the tree connected with the same asymptotic
      shape and no data-dependent loop);
    - the victim KEEPS its parent pointer and records its pose relative
      to the parent (mTcp), so trajectory export can climb through bad
      keyframes to a live ancestor (System::SaveTrajectory*).
    """
    N = m.kf_pt_idx.shape[1]
    grandparent = m.kf_parent[kf_id]
    # only LIVE children re-parent: an erased child's stored kf_Tcp is
    # relative to this victim, so its chain must keep pointing here
    children = (m.kf_parent == kf_id) & m.kf_valid
    new_parent = jnp.where(children, grandparent, m.kf_parent)
    new_parent = new_parent.at[kf_id].set(m.kf_parent[kf_id])
    # sever any loop edge pointing at the victim
    new_loop = jnp.where(m.kf_loop_edge == kf_id, -1, m.kf_loop_edge)
    # relative pose to parent at erase time (identity for a root)
    par = jnp.clip(grandparent, 0)
    Tp = m.kf_Tcw[par]
    Rp, tp = Tp[:3, :3], Tp[:3, 3]
    Tp_inv = (
        jnp.eye(4).at[:3, :3].set(Rp.T).at[:3, 3].set(-Rp.T @ tp)
    )
    Tcp = jnp.where(grandparent >= 0, m.kf_Tcw[kf_id] @ Tp_inv, jnp.eye(4))
    return m._replace(
        kf_valid=m.kf_valid.at[kf_id].set(False),
        kf_kp_valid=m.kf_kp_valid.at[kf_id].set(jnp.zeros((N,), dtype=bool)),
        kf_pt_idx=m.kf_pt_idx.at[kf_id].set(jnp.full((N,), -1, jnp.int32)),
        kf_parent=new_parent,
        kf_loop_edge=new_loop.at[kf_id].set(-1),
        kf_Tcp=m.kf_Tcp.at[kf_id].set(Tcp),
        n_kf=m.n_kf - 1,
    )
