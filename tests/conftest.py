"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-host sharding logic (halo exchange, mesh layouts) is tested without
TPU hardware by forcing the host platform and asking XLA for 8 virtual
CPU devices — the TPU-native analogue of a "fake backend" (survey §4).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: repeated test runs skip XLA recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

# Some environments pre-import jax at interpreter startup (sitecustomize)
# and force a hardware platform via jax.config, which overrides the env
# var above.  Re-pin the platform through the config as well — backends
# have not initialized yet at conftest-import time, so this still wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
