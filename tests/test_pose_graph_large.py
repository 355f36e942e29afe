"""Large-K essential-graph path: above K=512 the optimizer switches
from the dense [7K, 7K] solve to a block-Jacobi PCG with an edge-wise
matvec (O(E) memory — the dense Hessian would be 3.3 GB at K=4096).
This exercises that path on a 600-node noisy ring with a loop edge."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.sim3 import (
    sim3_compose,
    sim3_from_se3,
    sim3_inverse,
)
from orb_slam2_test_tpu.solvers.pose_graph import optimize_essential_graph


def test_pose_graph_cg_path_large_ring(rng):
    K = 600  # > 512 -> CG path
    th = np.linspace(0, 2 * np.pi, K, endpoint=False)
    Tgt = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    Tgt[:, 0, 3] = 10 * np.cos(th)
    Tgt[:, 2, 3] = 10 * np.sin(th)
    S_gt = jax.vmap(sim3_from_se3)(jnp.asarray(Tgt))

    Tn = Tgt.copy()
    Tn[:, :3, 3] += rng.normal(0, 0.2, (K, 3)).astype(np.float32)
    Tn[0] = Tgt[0]
    S0 = jax.vmap(sim3_from_se3)(jnp.asarray(Tn))

    # chain edges + a closing loop edge, measured from ground truth
    ei = jnp.concatenate([
        jnp.asarray(np.arange(K - 1), jnp.int32),
        jnp.asarray([K - 1], jnp.int32),
    ])
    ej = jnp.concatenate([
        jnp.asarray(np.arange(1, K), jnp.int32),
        jnp.asarray([0], jnp.int32),
    ])
    meas = jax.vmap(
        lambda a, b: sim3_compose(S_gt[b], sim3_inverse(S_gt[a]))
    )(ei, ej)

    S_opt = optimize_essential_graph(
        S0, jnp.ones(K, bool), jnp.zeros(K, bool).at[0].set(True),
        ei, ej, meas, jnp.ones(ei.shape[0], bool),
        jnp.ones(ei.shape[0]), iters=40,
    )
    err0 = float(jnp.mean(jnp.linalg.norm(
        S0[:, :3, 3] - S_gt[:, :3, 3], axis=1)))
    err1 = float(jnp.mean(jnp.linalg.norm(
        S_opt[:, :3, 3] - S_gt[:, :3, 3], axis=1)))
    # a bare chain is the worst case for block-Jacobi CG (long-range
    # modes); require an order-of-magnitude error reduction
    assert err1 < 0.12 * err0, (err0, err1)
    assert np.isfinite(err1)
