"""Map-point attribute maintenance.

Batched replacements for the reference's per-point refresh methods
(src/MapPoint.cc): `UpdateNormalAndDepth` (mean viewing direction +
scale-invariance distance range, reference :~290) and
`ComputeDistinctiveDescriptors` (representative descriptor selection,
reference :~190). The reference calls these per point after
triangulation, fusion and loop correction; here each is ONE jitted
segment-reduction over the observation array.

Descriptor selection note: the reference picks the member descriptor
with the smallest MEDIAN Hamming distance to the other members. A
median over a variable-size member set needs per-point gathers; instead
we pick the smallest MEAN distance, which for 256-bit descriptors is
computable in closed form from per-point bit counts:

    sum_j ham(d_i, d_j) = sum_b [ d_i[b] ? (n - c_b) : c_b ]
                        = sum_b c_b + popcount(d_i) * n
                          - 2 * <bits(d_i), c>

with c_b = number of members with bit b set. Mean and median select the
same central member except in adversarial bimodal sets; both reject
outlier descriptors, which is the behavior that matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam2_test_tpu.slam_map.mapstate import MapState
from orb_slam2_test_tpu.utils.precision import f32_matmuls


def _unpack_bits(desc: jax.Array) -> jax.Array:
    """[..., 8] uint32 -> [..., 256] float32 in {0, 1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*desc.shape[:-1], 256).astype(jnp.float32)


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("scale_factor", "n_levels"))
def update_normals_and_depth(
    m: MapState,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    kf_window: jax.Array | None = None,
) -> MapState:
    """MapPoint::UpdateNormalAndDepth:

    - pt_normal = mean of unit vectors from each observing keyframe's
      optical center to the point;
    - pt_max_dist/pt_min_dist from the REFERENCE keyframe's viewing
      distance and the observed pyramid level:
      max = dist * scale^level, min = max / scale^(L-1).

    `kf_window` (optional [W] int32, -1 padding) restricts the pass to
    the observations OF those keyframes — the keyframe-insertion
    pipeline passes its local window (the only keyframes whose points
    moved). Updated points then average their viewing direction over
    window observations only; since a freshly triangulated/fused
    point's observers are overwhelmingly the local window, this matches
    the reference's all-observer mean to within the view-cos gate's
    tolerance while cutting a [K, N] map-wide gather+scatter (~30 ms at
    KITTI capacities, every insertion) to [W, N]. Pass None for the
    exact full-map pass (loop correction uses that).
    """
    K, N = m.kf_pt_idx.shape
    P = m.pt_valid.shape[0]

    if kf_window is None:
        rows = m.kf_pt_idx
        row_ok = m.kf_valid
        kf_of_row = jnp.arange(K, dtype=jnp.int32)
    else:
        kfs = jnp.clip(kf_window, 0)
        rows = m.kf_pt_idx[kfs]
        row_ok = m.kf_valid[kfs] & (kf_window >= 0)
        kf_of_row = kfs
    W = rows.shape[0]

    kp_ok = (
        m.kf_kp_valid if kf_window is None
        else m.kf_kp_valid[jnp.clip(kf_window, 0)]
    )
    linked = (rows >= 0) & kp_ok & row_ok[:, None]
    pid = jnp.where(linked, rows, P)  # [W, N], P = dump slot

    Tcw = m.kf_Tcw[kf_of_row]
    R = Tcw[:, :3, :3]
    t = Tcw[:, :3, 3]
    Ow = -jnp.einsum("kij,ki->kj", R.transpose(0, 2, 1), t)  # [W, 3]

    X = m.pt_xyz[jnp.clip(rows, 0)]  # [W, N, 3]
    view = X - Ow[:, None, :]
    dist = jnp.maximum(jnp.linalg.norm(view, axis=-1), 1e-9)  # [W, N]
    unit = view / dist[..., None]

    flat_pid = pid.reshape(-1)
    nsum = jnp.zeros((P, 3)).at[flat_pid].add(
        unit.reshape(-1, 3), mode="drop"
    )
    nobs = jnp.zeros((P,)).at[flat_pid].add(1.0, mode="drop")
    normal = nsum / jnp.maximum(nobs, 1.0)[:, None]
    nlen = jnp.maximum(jnp.linalg.norm(normal, axis=-1), 1e-9)
    normal = normal / nlen[:, None]

    # distance range from the reference keyframe's observation
    is_ref = linked & (
        kf_of_row[:, None] == m.pt_ref_kf[jnp.clip(rows, 0)]
    )
    ref_pid = jnp.where(is_ref, rows, P).reshape(-1)
    lvl = (
        m.kf_level if kf_window is None
        else m.kf_level[jnp.clip(kf_window, 0)]
    )
    scales = scale_factor ** lvl.astype(jnp.float32)  # per-obs scale
    # overwritten by the single ref observation per point (scatter-set)
    max_d = jnp.zeros((P,)).at[ref_pid].set(
        (dist * scales).reshape(-1), mode="drop"
    )
    lvl_max = scale_factor ** (n_levels - 1)  # top pyramid level scale
    has_ref = jnp.zeros((P,), bool).at[ref_pid].set(True, mode="drop")

    upd = m.pt_valid & (nobs > 0)
    upd_rng = upd & has_ref
    return m._replace(
        pt_normal=jnp.where(upd[:, None], normal, m.pt_normal),
        pt_max_dist=jnp.where(upd_rng, max_d, m.pt_max_dist),
        pt_min_dist=jnp.where(upd_rng, max_d / lvl_max, m.pt_min_dist),
    )


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("window",))
def update_distinctive_descriptors(
    m: MapState, kf_ids: jax.Array, window: int
) -> MapState:
    """MapPoint::ComputeDistinctiveDescriptors for every point observed
    by the `window` keyframes in kf_ids ([window] int32, -1 padding):
    each such point adopts the observer descriptor (among window
    observations) with the smallest mean Hamming distance to the rest.
    """
    P = m.pt_valid.shape[0]
    N = m.kf_pt_idx.shape[1]

    ok_kf = kf_ids >= 0
    kfs = jnp.clip(kf_ids, 0)
    linked = (
        (m.kf_pt_idx[kfs] >= 0)
        & m.kf_kp_valid[kfs]
        & m.kf_valid[kfs][:, None]
        & ok_kf[:, None]
    )  # [C, N]
    pid = jnp.where(linked, m.kf_pt_idx[kfs], P).reshape(-1)  # [C*N]
    desc = m.kf_desc[kfs].reshape(-1, 8)  # [C*N, 8]
    bits = _unpack_bits(desc)  # [C*N, 256]

    cnt = jnp.zeros((P, 256)).at[pid].add(bits, mode="drop")
    nobs = jnp.zeros((P,)).at[pid].add(1.0, mode="drop")

    pid_safe = jnp.clip(pid, 0, P - 1)
    c_rows = cnt[pid_safe]  # [C*N, 256]
    n_rows = nobs[pid_safe]  # [C*N]
    pop = jnp.sum(bits, axis=-1)
    cross = jnp.einsum("ob,ob->o", bits, c_rows)
    score = jnp.sum(c_rows, axis=-1) + pop * n_rows - 2.0 * cross
    score = jnp.where(pid < P, score, jnp.inf)

    # scatter-argmin in two passes (packing (score, idx) into one float
    # would exceed the f32 mantissa and select garbage): min score per
    # point, then the lowest observation index achieving it
    O = bits.shape[0]
    best = jnp.full((P,), jnp.inf).at[pid].min(score, mode="drop")
    is_best = (pid < P) & (score <= best[pid_safe] + 0.5)
    win = jnp.full((P,), O, jnp.int32).at[
        jnp.where(is_best, pid, P)
    ].min(jnp.arange(O, dtype=jnp.int32), mode="drop")
    win_obs = jnp.clip(win, 0, O - 1)
    new_desc = desc[win_obs]  # [P, 8]
    # only refresh points with >= 2 window observations (a single
    # observation carries no selection information)
    upd = m.pt_valid & (nobs >= 2) & (win < O)
    return m._replace(
        pt_desc=jnp.where(upd[:, None], new_desc, m.pt_desc)
    )
