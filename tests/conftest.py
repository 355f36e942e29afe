"""Test configuration: force an 8-device virtual CPU mesh.

The sandbox's sitecustomize registers the `axon` TPU-tunnel backend and
presets JAX_PLATFORMS=axon before pytest starts, so setting env vars here
is not enough — jax is already imported. Override through jax.config,
which takes effect as long as no backend has been initialized yet.

Multi-chip sharding tests run against the fake 8-device CPU topology; the
driver separately dry-runs the real multi-chip path via __graft_entry__.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
