"""Test env: force JAX onto CPU with an 8-device virtual mesh so sharding
tests run hermetically and fast without TPU hardware (the driver separately
dry-runs the multi-chip path, and bench.py runs on the real chip).

The container's sitecustomize registers the axon TPU backend and overrides
JAX_PLATFORMS, so the env var alone is not enough — the jax config must be
updated before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("SUPERSLAM_NO_LOG_FILE", "1")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/superslam_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolate_superslam_env():
    """The facade bridges YAML keys into SUPERSLAM_* env vars (by design, the
    reference does the same with setenv) — snapshot and restore them around
    every test so one test's config cannot leak into another's defaults."""
    saved = {k: v for k, v in os.environ.items() if k.startswith("SUPERSLAM_")}
    yield
    for k in [k for k in os.environ if k.startswith("SUPERSLAM_")]:
        if k not in saved:
            del os.environ[k]
    os.environ.update(saved)
