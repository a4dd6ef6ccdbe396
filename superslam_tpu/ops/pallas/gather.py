"""Pallas TPU kernel: descriptor gather + L2 normalize.

The TPU-native counterpart of the reference's one custom CUDA kernel
(``/root/reference/src/DescriptorGather.cu:14-82``): for each selected
keypoint, fetch its nearest descriptor cell from the dense grid and write an
L2-normalized row. The CUDA version runs one block per keypoint with
threads striding the 256 channels and a block reduction for the norm; the
TPU version is one grid step per keypoint TILE, with the cell indices
scalar-prefetched (PrefetchScalarGridSpec) so each tile's rows can be
dynamically sliced out of the HBM-resident grid before compute, and the
norm is a VPU reduction over the 256-lane axis.

The plain-XLA take_along_axis path in models.superpoint is the default (XLA
compiles it well); this kernel exists as the hand-scheduled alternative and
is selected with use_pallas=True / SUPERSLAM_PALLAS=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..precision import default_matmul_precision
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _gather_kernel(cell_ref, row_ref, out_ref):
    """One grid step = one keypoint: the BlockSpec index_map (driven by the
    scalar-prefetched cell indices) has already DMA'd the right grid row into
    VMEM; normalize it on the VPU and write it out."""
    del cell_ref
    row = row_ref[:].astype(jnp.float32)  # (1, D//128, 128)
    inv = jax.lax.rsqrt(jnp.sum(row * row) + 1e-12)
    out_ref[:] = row * inv


@functools.partial(jax.jit, static_argnames=("interpret",))
@default_matmul_precision
def gather_normalize(
    grid: jnp.ndarray,  # (GH, GW, D) descriptor grid
    cells: jnp.ndarray,  # (K,) int32 flat cell index (cy * GW + cx)
    interpret: bool = False,
) -> jnp.ndarray:
    """(K, D) gathered + L2-normalized descriptor rows.

    The gather itself is expressed through the input BlockSpec: block t of
    the grid input is row cells[t], so Pallas's pipeline prefetches each
    keypoint's descriptor row from HBM while the previous one normalizes —
    the same overlap the CUDA kernel gets from its block-per-keypoint
    launch, but scheduled by the Mosaic pipeline instead of hand-written
    shared-memory staging.
    """
    gh, gw, d = grid.shape
    assert d % 128 == 0, "descriptor dim must be lane-aligned"
    # Rows viewed as (d//128, 128) so the block's trailing dims equal the
    # array's (Mosaic tile rule); the leading keypoint axis is block size 1.
    flat = grid.reshape(gh * gw, d // 128, 128).astype(jnp.float32)
    k = cells.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, d // 128, 128), lambda t, cells: (cells[t], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d // 128, 128), lambda t, cells: (t, 0, 0)),
    )
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((k, d // 128, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cells.astype(jnp.int32), flat)
    return out.reshape(k, d)
