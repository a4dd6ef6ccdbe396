#!/usr/bin/env python
"""Measure 2x2 max-pool formulations on the real chip (canvas shapes).

The canvas pool (ops/pallas/conv.py::pool2_canvas) measured ~1.1 ms for the
full+half-res pair — way off bandwidth. This sweeps XLA formulations to find
one the TPU backend lowers well.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from profile_stages import timed_scan  # noqa: E402


def main() -> None:
    from superslam_tpu.slam import _enable_compilation_cache

    _enable_compilation_cache()

    x = jnp.zeros((2, 64, 400, 1280), jnp.bfloat16)

    def rw_both(t):
        return lax.reduce_window(
            t, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        )

    def rw_vert(t):
        return lax.reduce_window(
            t, -jnp.inf, lax.max, (1, 1, 2, 1), (1, 1, 2, 1), "VALID"
        )

    def rw_horiz(t):
        return lax.reduce_window(
            t, -jnp.inf, lax.max, (1, 1, 1, 2), (1, 1, 1, 2), "VALID"
        )

    def strided(t):
        v = jnp.maximum(t[:, :, 0::2], t[:, :, 1::2])
        return jnp.maximum(v[:, :, :, 0::2], v[:, :, :, 1::2])

    def reshape_minor(t):
        b, c, h, w = t.shape
        v = t.reshape(b, c, h // 2, 2, w).max(axis=3)
        return v.reshape(b, c, h // 2, w // 2, 2).max(axis=4)

    def vert_rw_then_strided(t):
        v = rw_vert(t)
        return jnp.maximum(v[:, :, :, 0::2], v[:, :, :, 1::2])

    xf = jnp.zeros_like(x, jnp.float32)

    def rw_f32_out_bf16(t):
        return rw_both(t.astype(jnp.float32)).astype(jnp.bfloat16)

    xh = jnp.zeros((2, 400, 1280, 64), jnp.bfloat16)  # NHWC-ish: C on lanes

    def rw_nhwc(t):
        return lax.reduce_window(
            t, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    results = {
        "reduce_window 2x2 bf16": timed_scan(rw_both, x),
        "reduce_window 2x2 f32": timed_scan(rw_both, xf),
        "rw f32-compute bf16 io": timed_scan(rw_f32_out_bf16, x),
        "reduce_window nhwc bf16": timed_scan(rw_nhwc, xh),
        "reduce_window vert only": timed_scan(rw_vert, x),
        "reduce_window horiz only": timed_scan(rw_horiz, x),
        "strided slices": timed_scan(strided, x),
        "reshape minor max": timed_scan(reshape_minor, x),
        "vert rw + strided horiz": timed_scan(vert_rw_then_strided, x),
    }
    print()
    for k, v in results.items():
        print(f"{k:28s} {v:7.3f} ms")


if __name__ == "__main__":
    main()
