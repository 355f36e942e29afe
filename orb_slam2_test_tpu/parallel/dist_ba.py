"""Distributed bundle adjustment over a TPU device mesh.

The north-star differentiator (SURVEY.md section 7 step 7; the reference
has NO distributed anything — its concurrency is 4 pthreads over shared
memory, SURVEY.md section 2). Design, following the standard
scaling-book recipe (mesh -> shardings -> collectives over ICI):

- The camera-point bipartite graph is partitioned BY POINT: each device
  owns a contiguous slice of map points and ALL observations of those
  points. Cameras (a few thousand 4x4 poses at most) are replicated.
- One LM iteration under shard_map("ba" axis):
    local:   linearize owned observations; Hpp, bp, Y = W Hpp^-1,
             back-substitution for owned points — no communication.
    psum:    Hcc, bc, and the Schur-reduced camera system
             S = Hcc - sum_q W_q Hpp_q^-1 W_q^T, rhs — one all-reduce
             of [C,6,6]+[C,C,6,6]+[C,6] per iteration over ICI.
    replicated: dense Cholesky solve of S (identical on every device).
- The LM accept/reject cost is a psum'd scalar, so control flow stays
  identical on all devices.

This mirrors exactly what g2o's Schur solver does on one CPU thread,
re-expressed so the expensive parts (linearization, block products,
point back-substitution) scale linearly with devices and the only
synchronization is the reduced camera system — the SLAM analog of
data-parallel gradient psum.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
from orb_slam2_test_tpu.utils.precision import f32_matmuls
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.geometry.robust import (
    CHI2_MONO,
    CHI2_STEREO,
    HUBER_MONO,
    HUBER_STEREO,
    huber_loss,
    huber_weight,
)
from orb_slam2_test_tpu.geometry.se3 import se3_exp
from orb_slam2_test_tpu.solvers.ba_core import BAProblem
from orb_slam2_test_tpu.solvers.reprojection import project_residual

AXIS = "ba"


def _cam_for_obs(cam: PinholeCamera, obs_cam) -> PinholeCamera:
    """Per-observation intrinsics: if the camera's fields are [C] arrays
    (multi-sequence joint BA — each sequence has its own calibration),
    gather them by the observation's camera index; scalar fields pass
    through unchanged (the single-calibration fast path)."""

    def g(f):
        a = jnp.asarray(f)
        return a[obs_cam] if a.ndim >= 1 else f

    return cam._replace(
        fx=g(cam.fx), fy=g(cam.fy), cx=g(cam.cx), cy=g(cam.cy),
        bf=g(cam.bf),
    )


def make_ba_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def shard_problem(prob: BAProblem, n_shards: int) -> BAProblem:
    """Repartition a BAProblem so points and their observations are
    blocked by shard: point slice q belongs to shard q * n / Q, and
    observations are sorted by owning shard then padded per shard.

    Returns a new BAProblem whose pt_* arrays have Q' = ceil(Q/n)*n rows
    and obs_* arrays have O' = ceil(O_max_per_shard)*n rows, with
    obs_pt remapped to LOCAL indices within the owning shard.
    """
    Q = prob.pt_xyz.shape[0]
    O = prob.obs_cam.shape[0]
    qs = -(-Q // n_shards)  # points per shard
    Qp = qs * n_shards

    pt_xyz = np.zeros((Qp, 3), np.float32)
    pt_xyz[:Q] = np.asarray(prob.pt_xyz)
    pt_valid = np.zeros((Qp,), bool)
    pt_valid[:Q] = np.asarray(prob.pt_valid)

    obs_pt = np.asarray(prob.obs_pt)
    obs_shard = obs_pt // qs
    order = np.argsort(obs_shard, kind="stable")
    counts = np.bincount(obs_shard[np.asarray(prob.obs_valid)], minlength=n_shards)
    os_ = int(max(counts.max(), 1))
    Op = os_ * n_shards

    def pad_gather(a, fill=0):
        a = np.asarray(a)
        out = np.full((Op,) + a.shape[1:], fill, a.dtype)
        for s in range(n_shards):
            sel = order[obs_shard[order] == s]
            sel = sel[np.asarray(prob.obs_valid)[sel]]
            n = min(len(sel), os_)
            out[s * os_ : s * os_ + n] = a[sel[:n]]
        return out

    obs_cam = pad_gather(prob.obs_cam)
    obs_pt_g = pad_gather(prob.obs_pt)
    obs_uvr = pad_gather(prob.obs_uvr)
    obs_isig2 = pad_gather(prob.obs_isig2)
    obs_valid = pad_gather(prob.obs_valid, fill=False)
    # local point index within shard = global % qs
    obs_pt_local = obs_pt_g % qs

    return BAProblem(
        cam_Tcw=prob.cam_Tcw,
        cam_fixed=prob.cam_fixed,
        pt_xyz=jnp.asarray(pt_xyz),
        pt_valid=jnp.asarray(pt_valid),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt_local),
        obs_uvr=jnp.asarray(obs_uvr),
        obs_isig2=jnp.asarray(obs_isig2),
        obs_valid=jnp.asarray(obs_valid),
    )


def _local_blocks(cam, cam_Tcw, cam_fixed, pt_xyz, pt_valid,
                  obs_cam, obs_pt, obs_uvr, obs_isig2, obs_valid,
                  robust):
    """Per-shard linearization (local arrays; obs_pt is shard-local)."""
    Tcw = cam_Tcw[obs_cam]
    X = pt_xyz[obs_pt]
    res = project_residual(_cam_for_obs(cam, obs_cam), Tcw, X, obs_uvr, obs_isig2)
    is_stereo = obs_uvr[..., 2] >= 0.0
    delta = jnp.where(is_stereo, HUBER_STEREO, HUBER_MONO)
    w_huber = jnp.where(robust, huber_weight(res.chi2, delta), 1.0)
    w = jnp.where(obs_valid & res.depth_ok, w_huber * obs_isig2, 0.0)
    Jc = jnp.where(cam_fixed[obs_cam, None, None], 0.0, res.Jc)
    Jp = jnp.where(pt_valid[obs_pt, None, None], res.Jp, 0.0)
    return res, Jc, Jp, w


def _cost(cam, cam_Tcw, pt_xyz, obs_cam, obs_pt, obs_uvr, obs_isig2,
          obs_valid):
    res = project_residual(
        _cam_for_obs(cam, obs_cam), cam_Tcw[obs_cam], pt_xyz[obs_pt],
        obs_uvr, obs_isig2,
    )
    is_stereo = obs_uvr[..., 2] >= 0.0
    delta = jnp.where(is_stereo, HUBER_STEREO, HUBER_MONO)
    c = huber_loss(res.chi2, delta)
    local = jnp.sum(jnp.where(obs_valid & res.depth_ok, c, 0.0))
    return jax.lax.psum(local, AXIS)


def dist_bundle_adjust(
    prob: BAProblem,
    cam: PinholeCamera,
    mesh: Mesh,
    iters: int = 10,
    lam0: float = 1e-4,
):
    """LM bundle adjustment with point-sharded Schur reduction.

    `prob` must be pre-sharded with shard_problem(mesh.size). Returns
    (cam_Tcw, pt_xyz, final_cost).
    """
    n = mesh.shape[AXIS]
    C = prob.cam_Tcw.shape[0]

    def step_body(cam_arrs, cam_Tcw, cam_fixed, pt_xyz, pt_valid,
                  obs_cam, obs_pt, obs_uvr, obs_isig2, obs_valid,
                  lam, cost):
        cam = PinholeCamera(*cam_arrs)
        def one_iter(carry, _):
            cam_Tcw, pt_xyz, lam, cost = carry
            res, Jc, Jp, w = _local_blocks(
                cam, cam_Tcw, cam_fixed, pt_xyz, pt_valid,
                obs_cam, obs_pt, obs_uvr, obs_isig2, obs_valid, True
            )
            wJc = Jc * w[:, None, None]
            wJp = Jp * w[:, None, None]
            Qs = pt_xyz.shape[0]

            Hcc = jnp.zeros((C, 6, 6)).at[obs_cam].add(
                jnp.einsum("oki,okj->oij", Jc, wJc))
            bc = jnp.zeros((C, 6)).at[obs_cam].add(
                -jnp.einsum("oki,ok->oi", Jc, w[:, None] * res.r))
            Hpp = jnp.zeros((Qs, 3, 3)).at[obs_pt].add(
                jnp.einsum("oki,okj->oij", Jp, wJp))
            bp = jnp.zeros((Qs, 3)).at[obs_pt].add(
                -jnp.einsum("oki,ok->oi", Jp, w[:, None] * res.r))
            Wcp = jnp.einsum("oki,okj->oij", Jc, wJp)
            Wqc = jnp.zeros((Qs, C, 6, 3)).at[obs_pt, obs_cam].add(Wcp)

            dHp = lam * jnp.maximum(
                jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6)
            Hpp_d = Hpp + jax.vmap(jnp.diag)(dHp)
            seen = jnp.zeros((Qs,)).at[obs_pt].add(w) > 0.0
            Hpp_d = jnp.where(
                seen[:, None, None], Hpp_d, jnp.eye(3)[None])
            Hpp_inv = jnp.linalg.inv(Hpp_d)

            Y = jnp.einsum("qcij,qjk->qcik", Wqc, Hpp_inv)
            S_red = jnp.einsum("qcik,qdjk->cdij", Y, Wqc)
            rhs_red = jnp.einsum("qcik,qk->ci", Y, bp)

            # --- the only communication: reduce the camera system ---
            Hcc = jax.lax.psum(Hcc, AXIS)
            bc = jax.lax.psum(bc, AXIS)
            S_red = jax.lax.psum(S_red, AXIS)
            rhs_red = jax.lax.psum(rhs_red, AXIS)

            dHc = lam * jnp.maximum(
                jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-6)
            Hcc_d = Hcc + jax.vmap(jnp.diag)(dHc)
            S = -S_red
            S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc_d)
            rhs = bc - rhs_red
            fix = cam_fixed
            S = jnp.where(
                fix[:, None, None, None] | fix[None, :, None, None], 0.0, S)
            S = S.at[jnp.arange(C), jnp.arange(C)].add(
                jnp.where(fix[:, None, None], jnp.eye(6)[None], 0.0))
            rhs = jnp.where(fix[:, None], 0.0, rhs)

            Sd = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
            dxc = jnp.linalg.solve(Sd, rhs.reshape(C * 6)).reshape(C, 6)
            dxc = jnp.where(jnp.all(jnp.isfinite(dxc)), dxc, 0.0)

            wtd = jnp.einsum("qcij,ci->qj", Wqc, dxc)
            dxp = jnp.einsum("qij,qj->qi", Hpp_inv, bp - wtd)
            dxp = jnp.where((seen & pt_valid)[:, None], dxp, 0.0)
            dxp = jnp.where(jnp.all(jnp.isfinite(dxp)), dxp, 0.0)

            new_Tcw = jax.vmap(lambda d, T: se3_exp(d) @ T)(dxc, cam_Tcw)
            new_Tcw = jnp.where(cam_fixed[:, None, None], cam_Tcw, new_Tcw)
            new_xyz = pt_xyz + dxp
            new_cost = _cost(cam, new_Tcw, new_xyz, obs_cam, obs_pt,
                             obs_uvr, obs_isig2, obs_valid)
            accept = new_cost < cost
            cam_Tcw = jnp.where(accept, new_Tcw, cam_Tcw)
            pt_xyz = jnp.where(accept, new_xyz, pt_xyz)
            lam = jnp.clip(
                jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
            cost = jnp.where(accept, new_cost, cost)
            return (cam_Tcw, pt_xyz, lam, cost), None

        (cam_Tcw, pt_xyz, lam, cost), _ = jax.lax.scan(
            one_iter, (cam_Tcw, pt_xyz, lam, cost), None, length=iters
        )
        return cam_Tcw, pt_xyz, cost

    sharded = P(AXIS)
    repl = P()
    fn = jax.shard_map(
        step_body,
        mesh=mesh,
        in_specs=(repl, repl, repl, sharded, sharded,
                  sharded, sharded, sharded, sharded, sharded,
                  repl, repl),
        out_specs=(repl, sharded, repl),
        check_vma=False,
    )

    # device_put with the right shardings so shard_map gets blocked inputs
    cost0 = jnp.asarray(jnp.inf)
    # intrinsics as a flat tuple of arrays (fields may be scalars or [C]
    # arrays for multi-calibration joint BA); replicated across the mesh
    cam_arrs = tuple(jnp.asarray(f, jnp.float32) for f in cam)

    @f32_matmuls
    @functools.partial(jax.jit)
    def run(prob):
        return fn(
            cam_arrs,
            prob.cam_Tcw, prob.cam_fixed, prob.pt_xyz, prob.pt_valid,
            prob.obs_cam, prob.obs_pt, prob.obs_uvr, prob.obs_isig2,
            prob.obs_valid, jnp.asarray(lam0), cost0,
        )

    return run(prob)
