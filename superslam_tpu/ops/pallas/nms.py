"""Pallas TPU kernel: 9x9 max-window non-maximum suppression.

XLA's reduce_window runs ~5x off bandwidth at full-res score-map shapes
(the same lowering weakness as the 2x2 pools, see conv.py). The window max
is separable; here the vertical 9-max uses per-row sublane slices over a
halo'd fetch and the horizontal 9-max is eight 32-bit lane rolls with edge
masks — all patterns probe-verified on this backend.

Scores are softmax probabilities (>= 0), so zero padding is exact for the
SAME-window semantics: a zero contribution can only tie a suppressed cell,
and ties keep the original score either way (s == pooled keeps s).

Matches the reference's in-engine NMS semantics
(``/root/reference/src/SuperPoint.cc`` score post-processing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..precision import default_matmul_precision
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OUT_ROWS = 16
_IN_ROWS = 32
_PAD = 8  # top/bottom zero pad rows (>= NMS radius, block-aligned)


def _nms_kernel(x_ref, o_ref, *, w, radius):
    xb = x_ref[0]  # (32, W): rows 16i .. 16i+31 of the padded map
    col = jax.lax.broadcasted_iota(jnp.int32, (_OUT_ROWS, w), 1)
    # Vertical (2r+1)-max for the 16 output rows: out row p (global pad row
    # 16i+8+p) windows local rows 8+p-radius .. 8+p+radius.
    vrows = []
    for p in range(_OUT_ROWS):
        m = xb[8 + p - radius, :]
        for dy in range(1, 2 * radius + 1):
            m = jnp.maximum(m, xb[8 + p - radius + dy, :])
        vrows.append(m)
    vmax = jnp.stack(vrows, axis=0)  # (16, W)
    # Horizontal (2r+1)-max: lane rolls with wrapped-edge masking.
    pooled = vmax
    for dx in range(1, radius + 1):
        left = pltpu.roll(vmax, w - dx, axis=1)  # col j+dx
        left = jnp.where(col < w - dx, left, 0.0)
        right = pltpu.roll(vmax, dx, axis=1)  # col j-dx
        right = jnp.where(col >= dx, right, 0.0)
        pooled = jnp.maximum(pooled, jnp.maximum(left, right))
    center = xb[8 : 8 + _OUT_ROWS, :]
    o_ref[0] = jnp.where(center == pooled, center, 0.0)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
@default_matmul_precision
def nms_suppress(
    scores: jnp.ndarray, radius: int = 4, interpret: bool = False
) -> jnp.ndarray:
    """(B, H, W) f32 score map -> NMS'd map (non-peaks zeroed), H % 16 == 0,
    radius <= 8."""
    b, h, w = scores.shape
    assert h % _OUT_ROWS == 0 and radius <= _PAD, (h, radius)
    xp = jnp.pad(scores, ((0, 0), (_PAD, _PAD), (0, 0)))
    n_blocks = h // _OUT_ROWS
    return pl.pallas_call(
        functools.partial(_nms_kernel, w=w, radius=radius),
        out_shape=jax.ShapeDtypeStruct((b, h, w), scores.dtype),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(_IN_ROWS), pl.Element(w)),
                lambda bb, i: (bb, _OUT_ROWS * i, 0),
            )
        ],
        out_specs=pl.BlockSpec(
            (1, _OUT_ROWS, w), lambda bb, i: (bb, i, 0)
        ),
        interpret=interpret,
    )(xp)
