"""Test env: force JAX onto CPU with an 8-device virtual mesh so sharding
tests run without TPU hardware (the driver separately dry-runs the multi-chip
path). Must run before any jax import."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("SUPERSLAM_NO_LOG_FILE", "1")
