"""Env-var tunables, mirroring the reference's use-site env reads
(``env_double`` in ``/root/reference/src/VoEstimator.cc:15-18``).

Precedence contract (reference README.md:203-205): env var > YAML > default.
The facade bridges YAML keys to env vars without overwriting pre-existing
ones (see superslam_tpu.config).
"""

from __future__ import annotations

import os


def env_float(key: str, fallback: float) -> float:
    v = os.environ.get(key)
    if v is None:
        return fallback
    try:
        return float(v)
    except ValueError:
        return fallback


def env_int(key: str, fallback: int) -> int:
    v = os.environ.get(key)
    if v is None:
        return fallback
    try:
        return int(float(v))
    except ValueError:
        return fallback


def env_flag(key: str, default: bool = False) -> bool:
    v = os.environ.get(key)
    if v is None:
        return default
    return v not in ("", "0", "false", "False")


def device_tracker_wanted() -> bool:
    """Whether the per-frame pose solve runs inside the fused device program
    (ops.frontend_step.track_scan). Default: on for TPU backends — it
    removes the host LM from the drain path (measured +4 fps sustained,
    53.6 vs 49.2 on the KITTI bench) — off on CPU where the scan compile
    dominates test runtime. SUPERSLAM_DEVICE_TRACKER=0/1 overrides."""
    v = os.environ.get("SUPERSLAM_DEVICE_TRACKER")
    if v is not None:
        return v not in ("", "0", "false", "False")
    import jax

    return jax.default_backend() == "tpu"
