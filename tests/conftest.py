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
# the persistent XLA compilation cache is for the CLI processes; under
# the long single-process test suite it has produced segfaults on the
# CPU backend (hundreds of distinct programs written/read back to back)
os.environ.setdefault("SLAM_JAX_CACHE", "off")
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "false")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import resource

# the full suite compiles hundreds of XLA programs in one process; with
# the default 1024-fd soft limit the CPU backend crashes (segfault in
# executable serialization) around the ~130th test
_soft, _hard = resource.getrlimit(resource.RLIMIT_NOFILE)
resource.setrlimit(resource.RLIMIT_NOFILE, (min(65536, _hard), _hard))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Hard-disable the persistent compilation cache for the suite: the
# sandbox's backend plugin wires its own cache machinery regardless of
# jax config, and serializing CPU executables for it crashes the
# process (SIGSEGV/SIGABRT inside executable.serialize()) once the
# suite has compiled a few hundred programs.
import jax._src.compiler as _jcompiler

_jcompiler._cache_write = lambda *a, **k: None
_jcompiler._cache_read = lambda *a, **k: (None, None)

import numpy as np
import pytest


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
