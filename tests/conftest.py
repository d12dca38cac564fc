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

# persistent compilation cache: repeat test runs skip recompiles.  The
# directory is keyed by the host CPU fingerprint: XLA:CPU AOT entries
# compiled on a different host can abort at load time (SIGILL/SIGABRT —
# this container migrates across heterogeneous machines, and a shared
# /tmp/cct_xla_cache flaked the suite with 'Fatal Python error: Aborted').
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from continuous_clustering_tpu.tools.bench_setup import (  # noqa: E402
    compile_cache_dir,
)

_cache = compile_cache_dir()
if _cache:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
