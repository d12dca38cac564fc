"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; multi-chip sharding is validated on
virtual CPU devices exactly like the driver's dryrun does.
"""

import os

# Force CPU even if the environment preselects a TPU platform (tests must be
# hardware-independent); opt out with CCT_TEST_PLATFORM=tpu.
os.environ["JAX_PLATFORMS"] = os.environ.get("CCT_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
