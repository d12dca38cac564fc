"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; multi-chip sharding is validated on
virtual CPU devices exactly like the driver's dryrun does.
"""

import os

# Force CPU even if the environment preselects a TPU platform (tests must be
# hardware-independent); opt out with CCT_TEST_PLATFORM=tpu.  Note: a
# sitecustomize may have already set jax_platforms programmatically, so the
# env var alone is not enough — update the config directly before backend
# initialization.
platform = os.environ.get("CCT_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", platform)

# persistent compilation cache: repeat test runs skip recompiles
_cache = os.environ.get("CCT_COMPILE_CACHE", "/tmp/cct_xla_cache")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
