"""Parity tests for the Pallas TPU kernels (run here in interpret mode
on the CPU mesh; the real-TPU path is exercised by bench.py and the
example CLIs).

Kernels under test:
- ops/patches.py extract_raw_patches — aligned-superset load + roll
- solvers/pose_opt_pallas.py — fused motion-only BA (must match the
  XLA path solvers/pose_opt._pose_optimization_xla)
"""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_test_tpu.geometry.camera import PinholeCamera
from orb_slam2_test_tpu.geometry.se3 import se3_exp
from orb_slam2_test_tpu.ops.patches import (
    PATCH_EX,
    extract_raw_patches,
    orb_from_patches,
)
from orb_slam2_test_tpu.solvers.pose_opt import _pose_optimization_xla
from orb_slam2_test_tpu.solvers.pose_opt_pallas import pose_optimization_tpu


def test_patch_kernel_matches_slices(rng):
    img = jnp.asarray(rng.uniform(0, 255, (120, 160)), jnp.float32)
    xy = jnp.asarray(
        np.stack([rng.uniform(19, 140, 37), rng.uniform(19, 100, 37)], -1),
        jnp.float32,
    )
    got = extract_raw_patches(img, xy, interpret=True)
    half = PATCH_EX // 2
    x0 = np.clip(np.round(np.asarray(xy[:, 0])).astype(int) - half,
                 0, 160 - PATCH_EX)
    y0 = np.clip(np.round(np.asarray(xy[:, 1])).astype(int) - half,
                 0, 120 - PATCH_EX)
    ref = np.stack(
        [np.asarray(img)[y:y + PATCH_EX, x:x + PATCH_EX]
         for y, x in zip(y0, x0)]
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_orb_from_patches_matches_legacy_path(rng):
    """The matmul formulation must reproduce the per-bin gather path
    (brief.compute_descriptors on a whole-image blur) bit for bit in
    exact arithmetic."""
    from orb_slam2_test_tpu.ops.brief import (
        compute_descriptors,
        extract_patches,
        patch_orientations,
    )
    from orb_slam2_test_tpu.ops.pyramid import gaussian_blur

    img = jnp.asarray(rng.uniform(0, 255, (240, 320)), jnp.float32)
    # interior keypoints: margin > 19 so neither path clips
    xy = jnp.asarray(
        np.stack([rng.uniform(25, 290, 64), rng.uniform(25, 210, 64)], -1),
        jnp.float32,
    )
    raw = extract_raw_patches(img, xy)
    angle, desc = orb_from_patches(raw)

    old_patches = extract_patches(img, xy)
    old_angle = patch_orientations(old_patches)
    old_desc = compute_descriptors(gaussian_blur(img), xy, old_angle)

    np.testing.assert_allclose(
        np.asarray(angle), np.asarray(old_angle), atol=1e-5
    )
    a = np.asarray(desc).astype(np.uint32)
    b = np.asarray(old_desc).astype(np.uint32)
    # allow a handful of near-tie bit flips from float assoc. differences
    diff_bits = np.unpackbits(
        (a ^ b).view(np.uint8), axis=-1
    ).sum(axis=-1)
    assert diff_bits.max() <= 2, diff_bits.max()


def _pose_problem(rng, O=300, stereo_frac=0.5, outlier_frac=0.1):
    cam = PinholeCamera(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                        width=640, height=480, bf=40.0)
    X = np.concatenate(
        [rng.uniform(-3, 3, (O, 2)), rng.uniform(4, 10, (O, 1))], 1
    ).astype(np.float32)
    T_true = np.asarray(
        se3_exp(jnp.asarray([0.1, -0.05, 0.2, 0.02, -0.03, 0.01]))
    )
    pc = X @ T_true[:3, :3].T + T_true[:3, 3]
    u = cam.fx * pc[:, 0] / pc[:, 2] + cam.cx
    v = cam.fy * pc[:, 1] / pc[:, 2] + cam.cy
    ur = u - cam.bf / pc[:, 2]
    obs = np.stack([u, v, ur], 1).astype(np.float32)
    obs[:, :2] += rng.normal(0, 0.5, (O, 2))
    obs[int(O * stereo_frac):, 2] = -1.0
    n_out = int(O * outlier_frac)
    idx = rng.choice(O, n_out, replace=False)
    obs[idx, :2] += rng.uniform(20, 60, (n_out, 2))
    T0 = np.asarray(se3_exp(jnp.asarray([0.05, 0.0, 0.15, 0.0, 0.0, 0.0])))
    return cam, T_true, T0, X, obs


def test_pose_kernel_matches_xla(rng):
    cam, T_true, T0, X, obs = _pose_problem(rng)
    isig = jnp.ones(X.shape[0])
    valid = jnp.ones(X.shape[0], bool)
    ref = _pose_optimization_xla(
        cam, jnp.asarray(T0), jnp.asarray(X), jnp.asarray(obs), isig, valid
    )
    T_p, inl_p, chi2_p = pose_optimization_tpu(
        cam, jnp.asarray(T0), jnp.asarray(X), jnp.asarray(obs), isig, valid
    )
    np.testing.assert_allclose(
        np.asarray(T_p), np.asarray(ref.Tcw), atol=1e-4
    )
    assert np.asarray(T_p - T_true)[:3].__abs__().max() < 5e-3
    agree = np.mean(
        (np.asarray(inl_p) & np.asarray(valid)) == np.asarray(ref.inliers)
    )
    assert agree > 0.99, agree
    np.testing.assert_allclose(
        np.asarray(chi2_p), np.asarray(ref.chi2), rtol=1e-3, atol=1e-3
    )


def test_pose_kernel_respects_valid_mask(rng):
    cam, T_true, T0, X, obs = _pose_problem(rng, O=200, outlier_frac=0.0)
    # poison half the observations but mark them invalid
    obs2 = obs.copy()
    obs2[100:, :2] = -1e4
    valid = jnp.arange(200) < 100
    T_p, inl_p, _ = pose_optimization_tpu(
        cam, jnp.asarray(T0), jnp.asarray(X), jnp.asarray(obs2),
        jnp.ones(200), valid,
    )
    assert np.abs(np.asarray(T_p) - T_true).max() < 5e-3
