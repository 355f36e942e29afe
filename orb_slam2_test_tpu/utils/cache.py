"""Persistent XLA compilation cache.

SLAM sessions re-run the same jitted stages (8 pyramid-level shapes x
several kernels); on a tunneled TPU each compile costs seconds. The
persistent cache makes every run after the first start hot. Safe no-op
if the running JAX build doesn't support it.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "orb_slam2_test_tpu", "xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:
        pass  # older jax / read-only fs: compile-every-run still works
