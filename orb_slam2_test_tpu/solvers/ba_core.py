"""Bundle-adjustment core: Levenberg-Marquardt with Schur complement.

Replaces g2o's BlockSolver_6_3 + OptimizationAlgorithmLevenberg pipeline
(reference: Thirdparty/g2o core + src/Optimizer.cc BundleAdjustment /
LocalBundleAdjustment). The camera-point problem is expressed as flat
observation arrays with static shapes:

    cam_Tcw   [C, 4, 4]   optimizable poses (some flagged fixed)
    pt_xyz    [Q, 3]      optimizable points
    obs_cam   [O] int32   camera index per observation
    obs_pt    [O] int32   point index per observation
    obs_uvr   [O, 3]      (u, v, u_r) with u_r < 0 for monocular
    obs_isig2 [O]         1/sigma^2 information scale
    obs_valid [O] bool

One LM iteration is, end to end, a fixed dataflow graph of gathers,
batched 3x3/6x6 block algebra, segment-sums, and one dense Cholesky
solve of the reduced camera system — no sparse matrices, no per-edge
virtual calls:

    Hpp   [Q, 3, 3]  segment-sum of Jp^T W Jp      (point blocks)
    Hcc   [C, 6, 6]  segment-sum of Jc^T W Jc      (camera blocks)
    Wqc   [Q, C, 6, 3] scatter of Jc^T W Jp        (cross blocks)
    S     = Hcc - Wqc Hpp^-1 Wqc^T                 (Schur complement)
    dxc   = solve(S, rhs)                          (dense [6C, 6C])
    dxp   = Hpp^-1 (bp - Wqc^T dxc)                (back-substitution)

The same reduction structure is what the distributed BA shards: each
device owns a slice of points+observations, computes its partial Hcc/S
contributions, and a psum over the mesh assembles the reduced camera
system (see parallel/dist_ba.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
from orb_slam2_test_tpu.utils.precision import f32_matmuls
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.geometry.robust import (
    CHI2_MONO,
    CHI2_STEREO,
    HUBER_MONO,
    HUBER_STEREO,
    huber_weight,
)
from orb_slam2_test_tpu.geometry.se3 import se3_exp
from orb_slam2_test_tpu.solvers.reprojection import project_residual


# closed-form batched 3x3 inverse — see geometry/linalg.py (re-exported
# here because every solver historically imported it from ba_core)
from orb_slam2_test_tpu.geometry.linalg import inv3x3  # noqa: F401


class BAProblem(NamedTuple):
    cam_Tcw: jax.Array  # [C, 4, 4]
    cam_fixed: jax.Array  # [C] bool
    pt_xyz: jax.Array  # [Q, 3]
    pt_valid: jax.Array  # [Q] bool
    obs_cam: jax.Array  # [O] int32
    obs_pt: jax.Array  # [O] int32
    obs_uvr: jax.Array  # [O, 3]
    obs_isig2: jax.Array  # [O]
    obs_valid: jax.Array  # [O] bool


class BAResult(NamedTuple):
    cam_Tcw: jax.Array
    pt_xyz: jax.Array
    obs_chi2: jax.Array  # final per-observation chi2
    obs_inlier: jax.Array  # chi2 <= threshold & positive depth
    cost: jax.Array  # final robust cost


def _blocks(prob: BAProblem, cam: PinholeCamera, robust: bool,
            active: jax.Array):
    """Gather + linearize all observations; return per-obs blocks."""
    Tcw = prob.cam_Tcw[prob.obs_cam]
    X = prob.pt_xyz[prob.obs_pt]
    res = project_residual(cam, Tcw, X, prob.obs_uvr, prob.obs_isig2)

    is_stereo = prob.obs_uvr[..., 2] >= 0.0
    delta = jnp.where(is_stereo, HUBER_STEREO, HUBER_MONO)
    w_huber = jnp.where(robust, huber_weight(res.chi2, delta), 1.0)
    w = jnp.where(
        active & prob.obs_valid & res.depth_ok,
        w_huber * prob.obs_isig2,
        0.0,
    )
    # zero camera Jacobian for fixed cameras (pose stays put)
    Jc = jnp.where(prob.cam_fixed[prob.obs_cam, None, None], 0.0, res.Jc)
    # zero point Jacobian for invalid points
    Jp = jnp.where(prob.pt_valid[prob.obs_pt, None, None], res.Jp, 0.0)
    return res, Jc, Jp, w


def _robust_cost(
    prob: BAProblem, cam: PinholeCamera, active: jax.Array | None = None
) -> jax.Array:
    """Robust objective over the active observation set. `active` must
    match the set being optimized — evaluating gated-out outliers here
    would make LM reject steps that improve the actual objective."""
    Tcw = prob.cam_Tcw[prob.obs_cam]
    X = prob.pt_xyz[prob.obs_pt]
    res = project_residual(cam, Tcw, X, prob.obs_uvr, prob.obs_isig2)
    is_stereo = prob.obs_uvr[..., 2] >= 0.0
    delta = jnp.where(is_stereo, HUBER_STEREO, HUBER_MONO)
    from orb_slam2_test_tpu.geometry.robust import huber_loss

    cost = huber_loss(res.chi2, delta)
    mask = prob.obs_valid & res.depth_ok
    if active is not None:
        mask = mask & active
    return jnp.sum(jnp.where(mask, cost, 0.0))


def _schur_step(
    prob: BAProblem,
    cam: PinholeCamera,
    lam: jax.Array,
    robust: bool,
    active: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """One LM linearization + Schur solve. Returns (dxc [C,6], dxp [Q,3])."""
    C = prob.cam_Tcw.shape[0]
    Q = prob.pt_xyz.shape[0]
    res, Jc, Jp, w = _blocks(prob, cam, robust, active)

    wJc = Jc * w[:, None, None]  # [O, 3, 6]
    wJp = Jp * w[:, None, None]  # [O, 3, 3]

    # block reductions
    Hcc = jnp.zeros((C, 6, 6)).at[prob.obs_cam].add(
        jnp.einsum("oki,okj->oij", Jc, wJc)
    )
    Hpp = jnp.zeros((Q, 3, 3)).at[prob.obs_pt].add(
        jnp.einsum("oki,okj->oij", Jp, wJp)
    )
    bc = jnp.zeros((C, 6)).at[prob.obs_cam].add(
        -jnp.einsum("oki,ok->oi", Jc, w[:, None] * res.r)
    )
    bp = jnp.zeros((Q, 3)).at[prob.obs_pt].add(
        -jnp.einsum("oki,ok->oi", Jp, w[:, None] * res.r)
    )
    Wcp = jnp.einsum("oki,okj->oij", Jc, wJp)  # [O, 6, 3]
    Wqc = jnp.zeros((Q, C, 6, 3)).at[prob.obs_pt, prob.obs_cam].add(Wcp)

    # LM damping (multiplicative on diagonal like g2o's Levenberg)
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)
    dHc = lam * jnp.maximum(jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-6)
    Hcc_d = Hcc + jax.vmap(jnp.diag)(dHc)
    dHp = lam * jnp.maximum(jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6)
    Hpp_d = Hpp + jax.vmap(jnp.diag)(dHp)

    # guard unobserved points: identity blocks (dxp stays 0 since bp=0)
    seen = (
        jnp.zeros((Q,)).at[prob.obs_pt].add(w.astype(jnp.float32)) > 0.0
    )
    Hpp_d = jnp.where(seen[:, None, None], Hpp_d, eye3[None])
    Hpp_inv = inv3x3(Hpp_d)

    # Schur: S = Hcc_d - sum_q Wqc Hpp_inv Wqc^T, rhs = bc - Wqc Hpp_inv bp
    Y = jnp.einsum("qcij,qjk->qcik", Wqc, Hpp_inv)  # [Q, C, 6, 3]
    S_red = jnp.einsum("qcik,qdjk->cdij", Y, Wqc)  # [C, C, 6, 6]
    rhs_red = jnp.einsum("qcik,qk->ci", Y, bp)  # [C, 6]

    S = -S_red
    S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc_d)
    rhs = bc - rhs_red

    # fixed cameras: identity rows/cols, zero rhs
    fix = prob.cam_fixed
    S = jnp.where(fix[:, None, None, None] | fix[None, :, None, None],
                  0.0, S)
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        jnp.where(fix[:, None, None], eye6[None], 0.0)
    )
    rhs = jnp.where(fix[:, None], 0.0, rhs)

    # dense solve on the reduced system
    Sd = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    dxc = jnp.linalg.solve(Sd, rhs.reshape(C * 6)).reshape(C, 6)
    bad = jnp.logical_not(jnp.all(jnp.isfinite(dxc)))
    dxc = jnp.where(bad, 0.0, dxc)

    # back-substitute points: dxp = Hpp_inv (bp - Wqc^T dxc)
    wtd = jnp.einsum("qcij,ci->qj", Wqc, dxc)  # [Q, 3]
    dxp = jnp.einsum("qij,qj->qi", Hpp_inv, bp - wtd)
    dxp = jnp.where((seen & prob.pt_valid)[:, None], dxp, 0.0)
    dxp = jnp.where(jnp.all(jnp.isfinite(dxp)), dxp, 0.0)
    return dxc, dxp


def _schur_step_cg(
    prob: BAProblem,
    cam: PinholeCamera,
    lam: jax.Array,
    robust: bool,
    active: jax.Array,
    cg_iters: int = 30,
) -> tuple[jax.Array, jax.Array]:
    """One LM linearization with the reduced camera system solved by
    block-Jacobi-preconditioned CG and an IMPLICIT Schur matvec —
    S v = Hcc v - W Hpp^-1 W^T v evaluated through per-observation
    segment-sums, never materializing W. This is the global-BA path
    (Optimizer::BundleAdjustment replacement): memory is O(observations),
    so the full map fits where the dense [Q, C] Schur of local BA would
    not. The same matvec psums across devices in distributed BA.
    """
    C = prob.cam_Tcw.shape[0]
    Q = prob.pt_xyz.shape[0]
    res, Jc, Jp, w = _blocks(prob, cam, robust, active)

    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]
    Hcc = jnp.zeros((C, 6, 6)).at[prob.obs_cam].add(
        jnp.einsum("oki,okj->oij", Jc, wJc)
    )
    Hpp = jnp.zeros((Q, 3, 3)).at[prob.obs_pt].add(
        jnp.einsum("oki,okj->oij", Jp, wJp)
    )
    bc = jnp.zeros((C, 6)).at[prob.obs_cam].add(
        -jnp.einsum("oki,ok->oi", Jc, w[:, None] * res.r)
    )
    bp = jnp.zeros((Q, 3)).at[prob.obs_pt].add(
        -jnp.einsum("oki,ok->oi", Jp, w[:, None] * res.r)
    )
    Wcp = jnp.einsum("oki,okj->oij", Jc, wJp)  # [O, 6, 3] per-obs cross

    dHc = lam * jnp.maximum(jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-6)
    Hcc_d = Hcc + jax.vmap(jnp.diag)(dHc)
    dHp = lam * jnp.maximum(jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6)
    Hpp_d = Hpp + jax.vmap(jnp.diag)(dHp)
    seen = jnp.zeros((Q,)).at[prob.obs_pt].add(w) > 0.0
    Hpp_d = jnp.where(seen[:, None, None], Hpp_d, jnp.eye(3)[None])
    Hpp_inv = inv3x3(Hpp_d)

    fix = prob.cam_fixed

    def schur_matvec(v):  # v [C, 6]
        v = jnp.where(fix[:, None], 0.0, v)
        hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
        u = jnp.zeros((Q, 3)).at[prob.obs_pt].add(
            jnp.einsum("oji,oj->oi", Wcp, v[prob.obs_cam])
        )
        y = jnp.einsum("qij,qj->qi", Hpp_inv, u)
        wv = jnp.zeros((C, 6)).at[prob.obs_cam].add(
            jnp.einsum("oij,oj->oi", Wcp, y[prob.obs_pt])
        )
        out = hv - wv
        return jnp.where(fix[:, None], v, out)

    # rhs = bc - W Hpp^-1 bp
    yb = jnp.einsum("qij,qj->qi", Hpp_inv, bp)
    rhs = bc - jnp.zeros((C, 6)).at[prob.obs_cam].add(
        jnp.einsum("oij,oj->oi", Wcp, yb[prob.obs_pt])
    )
    rhs = jnp.where(fix[:, None], 0.0, rhs)

    # block-Jacobi preconditioner from Hcc diagonal blocks
    Minv = jnp.linalg.inv(
        Hcc_d + 1e-6 * jnp.eye(6)[None]
    )
    Minv = jnp.where(fix[:, None, None], jnp.eye(6)[None], Minv)

    def precond(r):
        return jnp.einsum("cij,cj->ci", Minv, r)

    # PCG, fixed iterations
    x = jnp.zeros((C, 6))
    r = rhs - schur_matvec(x)
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)

    def cg_body(carry, _):
        x, r, p, rz = carry
        Ap = schur_matvec(p)
        denom = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, r, p, rz), _ = jax.lax.scan(
        cg_body, (x, r, p, rz), None, length=cg_iters
    )
    dxc = jnp.where(jnp.all(jnp.isfinite(x)), x, 0.0)
    dxc = jnp.where(fix[:, None], 0.0, dxc)

    # back-substitute points
    u = jnp.zeros((Q, 3)).at[prob.obs_pt].add(
        jnp.einsum("oji,oj->oi", Wcp, dxc[prob.obs_cam])
    )
    dxp = jnp.einsum("qij,qj->qi", Hpp_inv, bp - u)
    dxp = jnp.where((seen & prob.pt_valid)[:, None], dxp, 0.0)
    dxp = jnp.where(jnp.all(jnp.isfinite(dxp)), dxp, 0.0)
    return dxc, dxp


def _apply_update(prob: BAProblem, dxc, dxp) -> BAProblem:
    from orb_slam2_test_tpu.geometry.se3 import se3_project

    # re-project onto SE3: f32 scale/skew creep in R is amplified by
    # downstream transpose-inverses (geometry/se3.py so3_project doc)
    new_Tcw = jax.vmap(lambda d, T: se3_project(se3_exp(d) @ T))(
        dxc, prob.cam_Tcw
    )
    new_Tcw = jnp.where(
        prob.cam_fixed[:, None, None], prob.cam_Tcw, new_Tcw
    )
    new_xyz = prob.pt_xyz + dxp
    return prob._replace(cam_Tcw=new_Tcw, pt_xyz=new_xyz)


@f32_matmuls
@functools.partial(
    jax.jit, static_argnames=("iters", "robust", "solver", "cg_iters")
)
def bundle_adjust_partial(
    prob: BAProblem,
    cam: PinholeCamera,
    lam: jax.Array,
    cost: jax.Array,
    active: jax.Array,
    iters: int = 4,
    robust: bool = True,
    solver: str = "cg",
    cg_iters: int = 40,
) -> tuple[BAProblem, jax.Array, jax.Array]:
    """Run `iters` LM iterations from a carried (lam, cost) state and
    return the updated (prob, lam, cost). This is `bundle_adjust` cut
    into resumable chunks: the loop-closing global BA dispatches one
    chunk per backend flush so tracking never stalls behind the full
    schedule, and a NEW loop closure aborts by dropping the remaining
    chunks (reference RunGlobalBundleAdjustment's detached thread +
    mbStopGBA, Optimizer.cc:~60 / LoopClosing.cc:~600)."""

    def lm_iter(carry):
        prob, lam, cost = carry
        if solver == "cg":
            dxc, dxp = _schur_step_cg(prob, cam, lam, robust, active,
                                      cg_iters)
        else:
            dxc, dxp = _schur_step(prob, cam, lam, robust, active)
        cand = _apply_update(prob, dxc, dxp)
        new_cost = _robust_cost(cand, cam, active)
        accept = new_cost < cost
        prob = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), cand, prob
        )
        lam = jnp.clip(
            jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6
        )
        cost = jnp.where(accept, new_cost, cost)
        return (prob, lam, cost)

    carry = (prob, lam, cost)
    for _ in range(iters):
        carry = lm_iter(carry)
    return carry


@f32_matmuls
@jax.jit
def chi2_active_gate(
    prob: BAProblem, cam: PinholeCamera
) -> tuple[jax.Array, jax.Array]:
    """Between-phase outlier gate: returns (active mask, cost over it)
    — the reference's edge-removal step after the first robust LM phase
    (chi2 5.991 mono / 7.815 stereo)."""
    res = project_residual(
        cam, prob.cam_Tcw[prob.obs_cam], prob.pt_xyz[prob.obs_pt],
        prob.obs_uvr, prob.obs_isig2,
    )
    is_stereo = prob.obs_uvr[..., 2] >= 0.0
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    active = (res.chi2 <= chi2_th) & res.depth_ok
    return active, _robust_cost(prob, cam, active)


@f32_matmuls
@functools.partial(
    jax.jit, static_argnames=("iters1", "iters2", "solver", "cg_iters")
)
def bundle_adjust(
    prob: BAProblem,
    cam: PinholeCamera,
    iters1: int = 5,
    iters2: int = 10,
    lam0: float = 1e-4,
    solver: str = "dense",
    cg_iters: int = 30,
) -> BAResult:
    """LM schedule mirroring Optimizer::LocalBundleAdjustment: `iters1`
    robust iterations, then outlier down-weighting (chi2 gate), then
    `iters2` more iterations on inliers only. Each iteration is
    accept/reject LM with multiplicative damping adjustment.
    """

    def lm_iter(carry, robust, active):
        prob, lam, cost = carry
        if solver == "cg":
            dxc, dxp = _schur_step_cg(prob, cam, lam, robust, active, cg_iters)
        else:
            dxc, dxp = _schur_step(prob, cam, lam, robust, active)
        cand = _apply_update(prob, dxc, dxp)
        new_cost = _robust_cost(cand, cam, active)
        accept = new_cost < cost
        prob = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), cand, prob
        )
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        cost = jnp.where(accept, new_cost, cost)
        return (prob, lam, cost)

    active_all = jnp.ones_like(prob.obs_valid)
    cost0 = _robust_cost(prob, cam, active_all)
    carry = (prob, jnp.asarray(lam0), cost0)
    for _ in range(iters1):
        carry = lm_iter(carry, True, active_all)
    prob1, lam, cost = carry

    # chi2 outlier gate between stages (reference re-checks edges after
    # the first 5 iterations and removes chi2 > 5.991/7.815 edges)
    Tcw = prob1.cam_Tcw[prob1.obs_cam]
    X = prob1.pt_xyz[prob1.obs_pt]
    res = project_residual(cam, Tcw, X, prob1.obs_uvr, prob1.obs_isig2)
    is_stereo = prob1.obs_uvr[..., 2] >= 0.0
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    active = (res.chi2 <= chi2_th) & res.depth_ok

    carry = (prob1, lam, _robust_cost(prob1, cam, active))
    for _ in range(iters2):
        carry = lm_iter(carry, False, active)
    prob2, _, cost2 = carry

    Tcw = prob2.cam_Tcw[prob2.obs_cam]
    X = prob2.pt_xyz[prob2.obs_pt]
    res = project_residual(cam, Tcw, X, prob2.obs_uvr, prob2.obs_isig2)
    inlier = (res.chi2 <= chi2_th) & res.depth_ok & prob2.obs_valid
    return BAResult(
        cam_Tcw=prob2.cam_Tcw,
        pt_xyz=prob2.pt_xyz,
        obs_chi2=res.chi2,
        obs_inlier=inlier,
        cost=cost2,
    )
