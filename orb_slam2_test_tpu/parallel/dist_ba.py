"""Distributed bundle adjustment over a TPU device mesh.

The north-star differentiator (SURVEY.md section 7 step 7; the reference
has NO distributed anything — its concurrency is 4 pthreads over shared
memory, SURVEY.md section 2). Design, following the standard
scaling-book recipe (mesh -> shardings -> collectives over ICI):

- The camera-point bipartite graph is partitioned BY POINT: each device
  owns a contiguous slice of map points and ALL observations of those
  points. Cameras (a few thousand 4x4 poses at most) are replicated.
- One LM iteration under shard_map("ba" axis):
    local:   linearize owned observations; Hpp, bp, per-observation
             cross blocks Wcp [O_local, 6, 3], Hpp^-1, point
             back-substitution — no communication, O(local obs).
    psum:    ONE fused [C, 84] reduction carrying Hcc (36) + bc (6) +
             the Schur rhs correction W Hpp^-1 bp (6) + the Schur
             DIAGONAL correction (W Hpp^-1 W^T)_cc (36); then ONE
             [C, 6] vector per CG iteration (the implicit-Schur matvec
             S v = Hcc v - W Hpp^-1 W^T v evaluated through local
             segment-sums then psum'd) — never a [Q,C] or [C,C]
             materialization.
    replicated: the CG state ([C,6] vectors + scalars) is identical on
             every device, so control flow needs no extra collectives.
             The preconditioner is block-Jacobi on the TRUE Schur
             diagonal (closed-form blockwise 6x6 inverse, no LAPACK) —
             ~3x fewer PCG iterations than Hcc-only blocks, so the
             default schedule runs 12 CG iterations, not 40:
             14 collectives per LM iteration instead of 44.
- The LM accept/reject cost is a psum'd scalar, so control flow stays
  identical on all devices.

This is the same implicit-Schur PCG as ba_core._schur_step_cg (the
global-BA path), distributed: per-device work is O(local observations)
and the communication volume is O(C) per CG iteration — independent of
the point count — so adding devices divides the dominant cost. The
round-2 version materialized Wqc [Q, C, 6, 3] and computed the dense
reduced system via an O(Q*C^2) einsum per iteration, which made
per-device work GROW with total camera count (measured 0.13 strong-
scaling efficiency at 8 devices); this rewrite removes that term.
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
from orb_slam2_test_tpu.solvers.ba_core import BAProblem, inv3x3
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


@functools.lru_cache(maxsize=32)
def _make_runner(mesh: Mesh, iters: int, cg_iters: int):
    """Build (once per mesh/schedule) the compiled LM runner. Cached so
    repeated solves reuse the jitted program — a fresh closure per call
    would retrace AND recompile every invocation, which both wastes
    seconds per solve and poisons scaling measurements with compile
    time (round-2 lesson)."""

    def step_body(cam_arrs, cam_Tcw, cam_fixed, pt_xyz, pt_valid,
                  obs_cam, obs_pt, obs_uvr, obs_isig2, obs_valid,
                  lam, cost):
        cam = PinholeCamera(*cam_arrs)
        C = cam_Tcw.shape[0]
        def one_iter(carry, _):
            cam_Tcw, pt_xyz, lam, cost = carry
            res, Jc, Jp, w = _local_blocks(
                cam, cam_Tcw, cam_fixed, pt_xyz, pt_valid,
                obs_cam, obs_pt, obs_uvr, obs_isig2, obs_valid, True
            )
            wJc = Jc * w[:, None, None]
            wJp = Jp * w[:, None, None]
            Qs = pt_xyz.shape[0]

            # point system first: owned locally, no communication —
            # the camera-side quantities that depend on it (rhs
            # correction, Schur-diagonal correction) can then ride in
            # ONE fused psum with Hcc/bc. Setup collectives per LM
            # iteration: 1 x [C, 84] (was 3 separate).
            Hpp = jnp.zeros((Qs, 3, 3)).at[obs_pt].add(
                jnp.einsum("oki,okj->oij", Jp, wJp))
            bp = jnp.zeros((Qs, 3)).at[obs_pt].add(
                -jnp.einsum("oki,ok->oi", Jp, w[:, None] * res.r))
            dHp = lam * jnp.maximum(
                jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6)
            Hpp_d = Hpp + jax.vmap(jnp.diag)(dHp)
            seen = jnp.zeros((Qs,)).at[obs_pt].add(w) > 0.0
            Hpp_d = jnp.where(
                seen[:, None, None], Hpp_d, jnp.eye(3)[None])
            Hpp_inv = inv3x3(Hpp_d)
            # per-observation cross blocks — NEVER scattered to [Q, C]
            Wcp = jnp.einsum("oki,okj->oij", Jc, wJp)  # [O, 6, 3]
            # Y_o = Wcp_o Hpp_inv[q_o]: reused by the rhs correction,
            # the Schur-diagonal preconditioner and the matvec epilogue
            Yo = jnp.einsum("oij,ojk->oik", Wcp, Hpp_inv[obs_pt])

            # ---- fused local contributions -> ONE [C, 84] psum:
            # Hcc [36] | bc [6] | rhs correction W Hpp^-1 bp [6] |
            # Schur diagonal correction W Hpp^-1 W^T [36]
            Hcc_l = jnp.zeros((C, 6, 6)).at[obs_cam].add(
                jnp.einsum("oki,okj->oij", Jc, wJc))
            bc_l = jnp.zeros((C, 6)).at[obs_cam].add(
                -jnp.einsum("oki,ok->oi", Jc, w[:, None] * res.r))
            rcor_l = jnp.zeros((C, 6)).at[obs_cam].add(
                jnp.einsum("oik,ok->oi", Yo, bp[obs_pt]))
            scor_l = jnp.zeros((C, 6, 6)).at[obs_cam].add(
                jnp.einsum("oik,ojk->oij", Yo, Wcp))
            packed = jnp.concatenate(
                [
                    Hcc_l.reshape(C, 36), bc_l, rcor_l,
                    scor_l.reshape(C, 36),
                ],
                axis=1,
            )
            packed = jax.lax.psum(packed, AXIS)
            Hcc = packed[:, :36].reshape(C, 6, 6)
            bc = packed[:, 36:42]
            rhs_cor = packed[:, 42:48]
            s_cor = packed[:, 48:84].reshape(C, 6, 6)

            dHc = lam * jnp.maximum(
                jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-6)
            Hcc_d = Hcc + jax.vmap(jnp.diag)(dHc)

            fix = cam_fixed

            def schur_matvec(v):  # v [C, 6] replicated
                v = jnp.where(fix[:, None], 0.0, v)
                hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
                u = jnp.zeros((Qs, 3)).at[obs_pt].add(
                    jnp.einsum("oji,oj->oi", Wcp, v[obs_cam]))
                y = jnp.einsum("qij,qj->qi", Hpp_inv, u)
                wv = jax.lax.psum(
                    jnp.zeros((C, 6)).at[obs_cam].add(
                        jnp.einsum("oij,oj->oi", Wcp, y[obs_pt])),
                    AXIS)  # <- the ONLY per-CG-iteration collective
                return jnp.where(fix[:, None], v, hv - wv)

            rhs = bc - rhs_cor
            rhs = jnp.where(fix[:, None], 0.0, rhs)

            # block-Jacobi preconditioner on the TRUE Schur diagonal
            # S_cc = Hcc_d - (W Hpp^-1 W^T)_cc — much tighter than the
            # Hcc-only blocks (the correction carries the marginalized
            # point information), cutting PCG iterations ~3x for the
            # same residual. Closed-form blockwise 6x6 inverse: no
            # replicated LAPACK batch on the critical path.
            from orb_slam2_test_tpu.geometry.linalg import inv6x6_spd

            S_diag = Hcc_d - s_cor
            # damping guarantees SPD only approximately; fall back to
            # Hcc_d blocks where the corrected diagonal lost definiteness
            diag_ok = jnp.all(
                jnp.diagonal(S_diag, axis1=-2, axis2=-1) > 0.0, axis=-1
            )
            S_diag = jnp.where(
                diag_ok[:, None, None], S_diag, Hcc_d)
            Minv = inv6x6_spd(S_diag + 1e-6 * jnp.eye(6)[None])
            Minv = jnp.where(fix[:, None, None], jnp.eye(6)[None], Minv)

            x = jnp.zeros((C, 6))
            r = rhs - schur_matvec(x)
            z = jnp.einsum("cij,cj->ci", Minv, r)
            p = z
            rz = jnp.sum(r * z)

            def cg_body(cg_carry, _):
                x, r, p, rz = cg_carry
                Ap = schur_matvec(p)
                denom = jnp.sum(p * Ap)
                alpha = rz / jnp.where(
                    jnp.abs(denom) > 1e-20, denom, 1e-20)
                x = x + alpha * p
                r = r - alpha * Ap
                z = jnp.einsum("cij,cj->ci", Minv, r)
                rz_new = jnp.sum(r * z)
                beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
                p = z + beta * p
                return (x, r, p, rz_new), None

            (x, r, p, rz), _ = jax.lax.scan(
                cg_body, (x, r, p, rz), None, length=cg_iters)
            dxc = jnp.where(jnp.all(jnp.isfinite(x)), x, 0.0)
            dxc = jnp.where(fix[:, None], 0.0, dxc)

            # local point back-substitution
            u = jnp.zeros((Qs, 3)).at[obs_pt].add(
                jnp.einsum("oji,oj->oi", Wcp, dxc[obs_cam]))
            dxp = jnp.einsum("qij,qj->qi", Hpp_inv, bp - u)
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

    @f32_matmuls
    @functools.partial(jax.jit)
    def run(cam_arrs, prob, lam0):
        return fn(
            cam_arrs,
            prob.cam_Tcw, prob.cam_fixed, prob.pt_xyz, prob.pt_valid,
            prob.obs_cam, prob.obs_pt, prob.obs_uvr, prob.obs_isig2,
            prob.obs_valid, lam0, jnp.asarray(jnp.inf),
        )

    return run


def dist_bundle_adjust(
    prob: BAProblem,
    cam: PinholeCamera,
    mesh: Mesh,
    iters: int = 10,
    lam0: float = 1e-4,
    cg_iters: int = 12,
):
    """LM bundle adjustment with point-sharded implicit-Schur PCG.

    `prob` must be pre-sharded with shard_problem(mesh.size). Returns
    (cam_Tcw, pt_xyz, final_cost).
    """
    run = _make_runner(mesh, iters, cg_iters)
    # intrinsics as a flat tuple of arrays (fields may be scalars or [C]
    # arrays for multi-calibration joint BA); replicated across the mesh
    cam_arrs = tuple(jnp.asarray(f, jnp.float32) for f in cam)
    return run(cam_arrs, prob, jnp.asarray(lam0, jnp.float32))
