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


def env_flag(key: str) -> bool:
    v = os.environ.get(key)
    return v is not None and v not in ("", "0", "false", "False")
