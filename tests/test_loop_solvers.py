"""Tests for PnP RANSAC, Sim3 RANSAC/refine, and pose-graph optimization."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.se3 import se3_exp, se3_apply, se3_inverse, se3_log
from orb_slam2_test_tpu.geometry.sim3 import (
    sim3_make, sim3_apply, sim3_inverse, sim3_compose, sim3_scale,
    sim3_from_se3, sim3_log,
)
from orb_slam2_test_tpu.geometry.camera import project
from orb_slam2_test_tpu.geometry.se3 import so3_exp
from orb_slam2_test_tpu.solvers.pnp import pnp_ransac
from orb_slam2_test_tpu.solvers.sim3_solver import sim3_ransac, optimize_sim3
from orb_slam2_test_tpu.solvers.pose_graph import optimize_essential_graph
from orb_slam2_test_tpu.utils.synthetic import default_camera, make_landmarks


class TestPnP:
    def test_recovers_pose_with_outliers(self, rng):
        cam = default_camera(640, 480)
        X = jnp.asarray(make_landmarks(rng, 150, spread=2.0))
        T = se3_exp(jnp.array([0.3, -0.1, 0.2, 0.05, -0.02, 0.1]))
        uv, _ = project(cam, se3_apply(T, X))
        uv = uv + jnp.asarray(rng.normal(0, 0.5, uv.shape), jnp.float32)
        uv = uv.at[:30].set(
            jnp.asarray(rng.uniform(0, 480, (30, 2)), jnp.float32)
        )
        res = pnp_ransac(
            cam, X, uv, jnp.ones(150, bool), jax.random.PRNGKey(0)
        )
        assert bool(res.success)
        err = se3_log(res.Tcw @ se3_inverse(T))
        assert float(jnp.linalg.norm(err[:3])) < 0.05
        assert int(res.n_inliers) > 100
        assert np.asarray(res.inliers)[:30].sum() < 8

    def test_fails_on_garbage(self, rng):
        cam = default_camera(640, 480)
        X = jnp.asarray(make_landmarks(rng, 60, spread=2.0))
        uv = jnp.asarray(rng.uniform(0, 480, (60, 2)), jnp.float32)
        res = pnp_ransac(
            cam, X, uv, jnp.ones(60, bool), jax.random.PRNGKey(1),
            min_inliers=15,
        )
        assert not bool(res.success)


class TestSim3:
    def _pair(self, rng, n=100, scale=1.4, noise=0.0, outlier=0):
        cam = default_camera(640, 480)
        pc2 = jnp.asarray(make_landmarks(rng, n, spread=1.5))
        R = so3_exp(jnp.array([0.1, -0.2, 0.05]))
        t = jnp.array([0.4, -0.2, 0.6])
        S = sim3_make(jnp.asarray(scale), R, t)
        pc1 = sim3_apply(S, pc2)
        if noise:
            pc1 = pc1 + jnp.asarray(rng.normal(0, noise, pc1.shape), jnp.float32)
        if outlier:
            pc1 = pc1.at[:outlier].add(
                jnp.asarray(rng.uniform(0.5, 2.0, (outlier, 3)), jnp.float32)
            )
        return cam, pc1, pc2, S

    def test_ransac_recovers_similarity(self, rng):
        cam, pc1, pc2, S_true = self._pair(rng, noise=0.003, outlier=20)
        res = sim3_ransac(
            cam, pc1, pc2, jnp.ones(100, bool), jax.random.PRNGKey(2)
        )
        assert bool(res.success)
        np.testing.assert_allclose(
            float(sim3_scale(res.S12)), 1.4, rtol=0.02
        )
        err = sim3_log(sim3_compose(res.S12, sim3_inverse(S_true)))
        assert float(jnp.linalg.norm(err)) < 0.05

    def test_fixed_scale(self, rng):
        cam, pc1, pc2, S_true = self._pair(rng, scale=1.0, noise=0.002)
        res = sim3_ransac(
            cam, pc1, pc2, jnp.ones(100, bool), jax.random.PRNGKey(3),
            fix_scale=True,
        )
        assert bool(res.success)
        assert abs(float(sim3_scale(res.S12)) - 1.0) < 1e-5

    def test_optimize_sim3_refines(self, rng):
        cam, pc1, pc2, S_true = self._pair(rng, noise=0.002)
        # perturb the true S and refine
        from orb_slam2_test_tpu.geometry.sim3 import sim3_exp

        S0 = sim3_exp(
            jnp.array([0.05, -0.03, 0.02, 0.01, 0.02, -0.01, 0.03])
        ) @ S_true
        S, inl, n = optimize_sim3(
            cam, S0, pc1, pc2, jnp.ones(100, bool)
        )
        err = sim3_log(sim3_compose(S, sim3_inverse(S_true)))
        assert float(jnp.linalg.norm(err)) < 0.02
        assert int(n) > 90


class TestPoseGraph:
    def test_loop_correction_distributes_drift(self, rng):
        """Chain of keyframes with accumulated drift; a loop edge from
        the last to the first node pulls everything back."""
        K = 12
        true_poses = []
        for i in range(K):
            xi = jnp.asarray(
                np.array([0.3, 0.0, 0.0, 0.0, 0.08, 0.0]) * i, jnp.float32
            )
            true_poses.append(se3_exp(xi))
        true_T = jnp.stack(true_poses)

        # drifted estimates: noise accumulates along the chain
        drift = np.zeros((K, 7), np.float32)
        for i in range(1, K):
            drift[i] = drift[i - 1] + rng.normal(0, 0.01, 7)
        from orb_slam2_test_tpu.geometry.sim3 import sim3_exp

        S_est = jnp.stack(
            [
                sim3_exp(jnp.asarray(drift[i])) @ sim3_from_se3(true_T[i])
                for i in range(K)
            ]
        )

        # edges: consecutive (from drifted relative measurements = true
        # relatives, as odometry would give locally) + loop edge K-1 -> 0
        ei, ej, Sji = [], [], []
        for i in range(K - 1):
            ei.append(i)
            ej.append(i + 1)
            Sji.append(
                sim3_from_se3(true_T[i + 1]) @ sim3_inverse(
                    sim3_from_se3(true_T[i])
                )
            )
        # loop edge
        ei.append(0)
        ej.append(K - 1)
        Sji.append(
            sim3_from_se3(true_T[K - 1]) @ sim3_inverse(sim3_from_se3(true_T[0]))
        )
        edge_i = jnp.asarray(ei, jnp.int32)
        edge_j = jnp.asarray(ej, jnp.int32)
        edge_S = jnp.stack(Sji)

        S_opt = optimize_essential_graph(
            S_est,
            jnp.ones(K, bool),
            jnp.arange(K) == 0,
            edge_i, edge_j, edge_S,
            jnp.ones(len(ei), bool),
            jnp.ones(len(ei)),
        )
        # all nodes should be close to truth after optimization
        for i in range(K):
            err = sim3_log(
                sim3_compose(S_opt[i], sim3_inverse(sim3_from_se3(true_T[i])))
            )
            assert float(jnp.linalg.norm(err)) < 0.01, i

    def test_fixed_node_unmoved(self, rng):
        K = 4
        S = jnp.stack([sim3_from_se3(jnp.eye(4))] * K)
        edge_i = jnp.asarray([0, 1, 2], jnp.int32)
        edge_j = jnp.asarray([1, 2, 3], jnp.int32)
        edge_S = jnp.stack([sim3_from_se3(jnp.eye(4))] * 3)
        out = optimize_essential_graph(
            S, jnp.ones(K, bool), jnp.arange(K) == 0,
            edge_i, edge_j, edge_S, jnp.ones(3, bool), jnp.ones(3),
            iters=3,
        )
        np.testing.assert_allclose(np.asarray(out[0]), np.eye(4), atol=1e-6)


def test_essential_graph_edge_padding_no_truncation():
    """_pad_edges must never drop edges: above EDGE_CAP it grows to the
    next power-of-two bucket (round 1 silently truncated)."""
    import jax.numpy as jnp
    from orb_slam2_test_tpu.engine.loop_closing import EDGE_CAP, _pad_edges

    for E in (5, EDGE_CAP, EDGE_CAP + 1, 3 * EDGE_CAP):
        ei = jnp.arange(E, dtype=jnp.int32)
        ej = jnp.arange(E, dtype=jnp.int32) + 1
        meas = jnp.tile(jnp.eye(4)[None], (E, 1, 1))
        pi, pj, pm, pv, cap = _pad_edges(ei, ej, meas)
        assert cap >= E and cap >= EDGE_CAP
        assert cap & (cap - 1) == 0 or cap == EDGE_CAP
        assert pi.shape == (cap,) and pm.shape == (cap, 4, 4)
        assert int(pv.sum()) == E
        assert (np.asarray(pi[:E]) == np.asarray(ei)).all()
