"""Robust-loss utilities and chi-square gates.

The reference uses g2o::RobustKernelHuber with delta = sqrt(5.991) for
monocular edges and sqrt(7.815) for stereo edges (reference:
Optimizer.cc PoseOptimization / LocalBundleAdjustment thresholds
`thHuberMono`, `thHuberStereo`, and the chi2 outlier gates 5.991 / 7.815).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 95% chi-square quantiles used throughout ORB-SLAM2.
CHI2_MONO = 5.991  # 2 dof (u, v)
CHI2_STEREO = 7.815  # 3 dof (u, v, u_r)

HUBER_MONO = CHI2_MONO ** 0.5
HUBER_STEREO = CHI2_STEREO ** 0.5


def huber_weight(chi2: jax.Array, delta: float) -> jax.Array:
    """IRLS weight for the Huber loss given squared error chi2.

    w = 1 for |r| <= delta, delta/|r| otherwise. Multiplying J^T J and
    J^T r terms by w reproduces one Gauss-Newton step on the robustified
    objective (what g2o's robust kernel does internally).
    """
    r = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.minimum(1.0, delta / r)


def huber_loss(chi2: jax.Array, delta: float) -> jax.Array:
    """rho(chi2) — the robustified cost, for monitoring/termination."""
    r = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    quad = chi2
    lin = 2.0 * delta * r - delta * delta
    return jnp.where(r <= delta, quad, lin)
