"""Essential-graph Sim(3) pose-graph optimization.

Replaces Optimizer::OptimizeEssentialGraph (reference: src/Optimizer.cc
~730): after a loop closure, optimize all keyframe poses as Sim3 nodes
over the sparse "essential graph" (spanning tree + loop edges + strong
covisibility edges with weight >= 100), 20 LM iterations, then recover
SE3 as [R | t/s].

TPU formulation: per-edge residual r = log(S_ji_meas * S_iw * S_jw^-1)
with autodiff Jacobians ([E, 7, 14] via one vmapped jacfwd), dense
normal-equation assembly by scatter-add into [7K, 7K] (K <= a few
hundred keyframes -> a small dense Cholesky per iteration, ideal for
the MXU; a CG path takes over at larger K).
"""

from __future__ import annotations

import functools

import jax
from orb_slam2_test_tpu.utils.precision import f32_matmuls
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.sim3 import (
    sim3_exp,
    sim3_inverse,
    sim3_log,
)


@f32_matmuls
@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_essential_graph(
    Scw: jax.Array,  # [K, 4, 4] sim3 world->camera per keyframe
    node_valid: jax.Array,  # [K]
    node_fixed: jax.Array,  # [K] (the loop keyframe is held fixed)
    edge_i: jax.Array,  # [E] int32
    edge_j: jax.Array,  # [E] int32
    edge_Sji: jax.Array,  # [E, 4, 4] measured S_jw * S_iw^-1
    edge_valid: jax.Array,  # [E]
    edge_weight: jax.Array,  # [E] information scale (1 normally)
    iters: int = 40,
    fix_scale: bool = False,
    lambda_init: float = 1e-4,
) -> jax.Array:
    """Returns optimized Scw [K, 4, 4].

    Levenberg-Marquardt with chi2-gated accept/reject (the reference's
    g2o OptimizationAlgorithmLevenberg does the same): a rejected step
    keeps the poses and raises lambda, so the iteration can never make
    the graph worse — plain Gauss-Newton diverges when a loop closure
    injects large residuals into a long drifted chain.
    """
    K = Scw.shape[0]
    locked = node_fixed | ~node_valid

    def edge_residual(xi_i, xi_j, Siw, Sjw, Sji):
        Si = sim3_exp(xi_i) @ Siw
        Sj = sim3_exp(xi_j) @ Sjw
        return sim3_log(Sji @ Si @ sim3_inverse(Sj))  # [7]

    zero = jnp.zeros(7)
    w_edge = (edge_valid & node_valid[edge_i] & node_valid[edge_j]).astype(
        jnp.float32
    ) * edge_weight

    def total_chi2(Scw):
        r = jax.vmap(
            lambda Si, Sj, Sm: edge_residual(zero, zero, Si, Sj, Sm)
        )(Scw[edge_i], Scw[edge_j], edge_Sji)
        r = jnp.where(jnp.isfinite(r), r, 1e6)
        return jnp.sum(w_edge * jnp.sum(r * r, axis=-1))

    def lm_iter(carry, _):
        Scw, lam, chi2 = carry
        Siw = Scw[edge_i]
        Sjw = Scw[edge_j]

        def per_edge(Siw_e, Sjw_e, Sji_e):
            r = edge_residual(zero, zero, Siw_e, Sjw_e, Sji_e)
            Ji = jax.jacfwd(
                lambda xi: edge_residual(xi, zero, Siw_e, Sjw_e, Sji_e)
            )(zero)
            Jj = jax.jacfwd(
                lambda xi: edge_residual(zero, xi, Siw_e, Sjw_e, Sji_e)
            )(zero)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(Siw, Sjw, edge_Sji)  # [E,7],[E,7,7]x2
        w = w_edge

        # per-edge normal-equation blocks
        wJi = Ji * w[:, None, None]
        wJj = Jj * w[:, None, None]
        Hii = jnp.einsum("eki,ekj->eij", Ji, wJi)
        Hjj = jnp.einsum("eki,ekj->eij", Jj, wJj)
        Hij = jnp.einsum("eki,ekj->eij", Ji, wJj)
        bi = -jnp.einsum("eki,ek->ei", Ji, w[:, None] * r)
        bj = -jnp.einsum("eki,ek->ei", Jj, w[:, None] * r)
        b = jnp.zeros((K, 7))
        b = b.at[edge_i].add(bi)
        b = b.at[edge_j].add(bj)
        b = jnp.where(locked[:, None], 0.0, b)

        # diagonal blocks (damping + block-Jacobi preconditioner)
        Hdiag = jnp.zeros((K, 7, 7))
        Hdiag = Hdiag.at[edge_i].add(Hii).at[edge_j].add(Hjj)
        dd = jnp.diagonal(Hdiag, axis1=-2, axis2=-1)
        damp = lam * jnp.maximum(dd, 1e-8) + 1e-9
        Hdiag_d = Hdiag + jax.vmap(jnp.diag)(damp)
        if fix_scale:
            # freeze the scale coordinate of every node
            Hdiag_d = Hdiag_d.at[:, 6, 6].add(1e12)
        Hdiag_d = jnp.where(
            locked[:, None, None], jnp.eye(7)[None], Hdiag_d
        )

        if K <= 512:
            # small graphs: assemble dense [7K, 7K] and Cholesky on the
            # MXU (the [K, K, 7, 7] buffer squares with K — 29 MB at
            # K=384 but 3.3 GB at K=4096, so big graphs take the CG
            # path below)
            H = jnp.zeros((K, K, 7, 7))
            off = ~(locked[edge_i] | locked[edge_j])
            Hij_m = jnp.where(off[:, None, None], Hij, 0.0)
            ei_d = jnp.where(locked[edge_i], K, edge_i)
            ej_d = jnp.where(locked[edge_j], K, edge_j)
            H = H.at[ei_d, ei_d].add(
                jnp.where(locked[edge_i, None, None], 0.0, Hii),
                mode="drop")
            H = H.at[ej_d, ej_d].add(
                jnp.where(locked[edge_j, None, None], 0.0, Hjj),
                mode="drop")
            H = H.at[ei_d, ej_d].add(Hij_m, mode="drop")
            H = H.at[ej_d, ei_d].add(
                jnp.swapaxes(Hij_m, -1, -2), mode="drop")
            # overwrite diagonal with the damped/locked version
            H = H.at[jnp.arange(K), jnp.arange(K)].set(0.0)
            H = H.at[jnp.arange(K), jnp.arange(K)].add(Hdiag_d)
            Hd = H.transpose(0, 2, 1, 3).reshape(K * 7, K * 7)
            dx = jnp.linalg.solve(Hd, b.reshape(K * 7)).reshape(K, 7)
        else:
            # large graphs: block-Jacobi-preconditioned CG with an
            # edge-wise matvec — O(E) memory, no [K, K] materialization
            off_ok = ~(locked[edge_i] | locked[edge_j])
            Hij_m = jnp.where(off_ok[:, None, None], Hij, 0.0)

            def matvec(v):
                v = jnp.where(locked[:, None], 0.0, v)
                out = jnp.einsum("kij,kj->ki", Hdiag_d - jnp.where(
                    locked[:, None, None], jnp.eye(7)[None], 0.0), v)
                out = out.at[edge_i].add(
                    jnp.einsum("eij,ej->ei", Hij_m, v[edge_j]))
                out = out.at[edge_j].add(
                    jnp.einsum("eji,ej->ei", Hij_m, v[edge_i]))
                return jnp.where(locked[:, None], v, out)

            Minv = jnp.linalg.inv(Hdiag_d)

            def precond(rr):
                return jnp.einsum("kij,kj->ki", Minv, rr)

            x = jnp.zeros((K, 7))
            rr = b - matvec(x)
            z = precond(rr)
            p = z
            rz = jnp.sum(rr * z)

            def cg_body(cgc, _):
                x, rr, p, rz = cgc
                Ap = matvec(p)
                den = jnp.sum(p * Ap)
                alpha = rz / jnp.where(jnp.abs(den) > 1e-20, den, 1e-20)
                x = x + alpha * p
                rr = rr - alpha * Ap
                z = precond(rr)
                rz2 = jnp.sum(rr * z)
                beta = rz2 / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
                return (x, rr, z + beta * p, rz2), None

            (x, rr, p, rz), _ = jax.lax.scan(
                cg_body, (x, rr, p, rz), None, length=100
            )
            dx = x
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
        cand = jax.vmap(lambda d, S: sim3_exp(d) @ S)(dx, Scw)
        cand = jnp.where(locked[:, None, None], Scw, cand)

        chi2_new = total_chi2(cand)
        accept = jnp.isfinite(chi2_new) & (chi2_new <= chi2)
        Scw_next = jnp.where(accept, cand, Scw)
        lam_next = jnp.clip(
            jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6
        )
        chi2_next = jnp.where(accept, chi2_new, chi2)
        return (Scw_next, lam_next, chi2_next), None

    carry = (Scw, jnp.asarray(lambda_init), total_chi2(Scw))
    (Scw, _, _), _ = jax.lax.scan(lm_iter, carry, None, length=iters)
    return Scw
