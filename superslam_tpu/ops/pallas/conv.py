"""Pallas TPU kernels: 3x3 SAME convolutions in channels-first layout.

Why these exist: XLA's conv lowering on this chip runs the SuperPoint
encoder's large-spatial-extent convolutions at ~10% MXU utilization
(conv1b, 64->64 at 384x1248, measures 3.4 ms — 70 GFLOP that should take
<0.5 ms). The reference gets these convs from cuDNN/TensorRT
(``/root/reference/src/SuperPoint.cc:754-892``); the TPU-native answer is a
kernel shaped for the MXU:

- channels-first (C, H, W) blocks: C rides the sublane axis, W (padded to a
  lane multiple) rides the lanes, so the conv becomes matmuls with NO
  im2col materialization in HBM;
- the 3 dx taps are lane shifts fused into a (C_out, 3*C_in) x
  (3*C_in, TH*W) matmul (K=3*C_in fills the MXU's contraction dim);
- the dy halo comes from overlapping 24-row input blocks (``pl.Element``
  indexing at 8-row-aligned offsets) accumulating into an f32 tile;
- bias + ReLU + padding masking run on the VPU while the next row-stripe's
  DMA is in flight (Mosaic double-buffers blocks).

Canvas convention (shared by inputs and outputs so conv stages chain with
zero inter-stage copies):

    array (B, C, Hp, Wp); image rows PAD_ROWS..PAD_ROWS+H-1, image cols
    0..w_img-1; everything else zero. Wp % 128 == 0, Hp = H + 2*PAD_ROWS.

The zero pad rows/cols double as the conv's SAME zero padding; the kernel
re-zeroes its pad blocks and right-pad columns so the invariant holds for
the next stage. 2x2 max-pooling between stages is XLA reduce_window on the
same canvas (image offset 8 -> 4) followed by a cheap re-pad to offset 8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

PAD_ROWS = 8
_TH = 8  # output rows per grid step
_IN_ROWS = 24  # fetched rows per step (halo via 8-aligned overlap)


def _shift_out(z: jnp.ndarray, dx: int) -> jnp.ndarray:
    """Per-dx f32 row partial (C_out, Wp) aligned to output columns:
    y[:, j] += z[:, j + dx - 1], zero-filled at the row edge.

    The dx taps are applied by rotating the f32 PARTIAL SUMS, not the bf16
    inputs — Mosaic only lowers 2-D 32-bit lane rotates; the wrapped edge
    column is masked to reproduce SAME zero padding."""
    if dx == 1:
        return z
    from jax.experimental.pallas import tpu as pltpu

    wp = z.shape[-1]
    shift = 1 if dx == 0 else wp - 1  # dx=0: take col j-1; dx=2: col j+1
    y = pltpu.roll(z, shift, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    keep = col >= 1 if dx == 0 else col < wp - 1
    return jnp.where(keep, y, 0.0)


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, *, wp, c_out, relu, w_img, n_blocks):
    """One grid step = TH output rows. Per row: the three dy input rows are
    stacked on the sublane axis (K = 3*C_in fills the MXU contraction dim)
    and hit three per-dx matmuls whose f32 results are lane-rotated into
    place. Mosaic constraint notes: per-ROW 2-D slices are used throughout
    because matmuls over differently-offset (C, TH*Wp)-reshaped bands crash
    this backend's remote compiler."""
    i = pl.program_id(1)
    interior = jnp.logical_and(i >= 1, i <= n_blocks - 2)
    xb = x_ref[0]  # (C, IN_ROWS, Wp): rows 8*(i-1) ...
    col = None
    for r in range(_TH):
        # Output image row 8i+r needs input rows 8i+r-1 .. 8i+r+1 =
        # local rows 7+r .. 9+r (for the clamped i=0 block the values are
        # garbage and masked by `interior`).
        cat = jnp.concatenate(
            [xb[:, 7 + r + dy, :] for dy in range(3)], axis=0
        )  # (3C, Wp)
        # ONE (3*C_out, 3C) x (3C, Wp) matmul per row: the three dx weight
        # matrices ride the M axis (3*C_out=192+ fills the MXU rows; three
        # separate M=64 matmuls pay the systolic fill 3x), then the per-dx
        # f32 partials are sliced at 8-aligned sublane offsets and
        # lane-rotated into place.
        z3 = jax.lax.dot_general(
            w_ref[:],  # (3*C_out, 3C)
            cat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = (
            _shift_out(z3[:c_out], 0)
            + z3[c_out : 2 * c_out]
            + _shift_out(z3[2 * c_out :], 2)
        )
        y = acc + b_ref[:]  # bias (C_out, 1) broadcasts over lanes
        if relu:
            y = jnp.maximum(y, 0.0)
        if col is None:
            col = jax.lax.broadcasted_iota(jnp.int32, (c_out, wp), 1)
        y = jnp.where(jnp.logical_and(col < w_img, interior), y, 0.0)
        o_ref[0, :, r, :] = y.astype(o_ref.dtype)


def _conv1a1b_kernel(
    x_ref, wa_ref, ba_ref, wb_ref, bb_ref, o_ref, *, wp, c_mid, c_out, w_img, n_blocks, cdt
):
    """Fused conv1a (1->C_mid) + ReLU + conv1b (C_mid->C_out) + ReLU.

    The block fetches only the 1-channel image rows (61 KB vs the 3.9 MB a
    separate conv1b block would re-read), computes the ten conv1a rows the
    stripe needs on the fly, and runs the conv1b matmuls from VMEM. This
    removes the 2x HHW*C intermediate HBM round trip entirely."""
    i = pl.program_id(1)
    interior = jnp.logical_and(i >= 1, i <= n_blocks - 2)
    xr = x_ref[0, 0].astype(jnp.float32)  # (IN_ROWS, Wp)
    col1 = None

    # conv1a rows for local rows 7..16 (image rows 8i-1 .. 8i+8).
    a_rows = []
    for l in range(7, 17):
        z3 = jax.lax.dot_general(
            wa_ref[:],  # (3*C_mid, 3): dx-stacked on M
            xr[l - 1 : l + 2, :],  # (3, Wp)
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = (
            _shift_out(z3[:c_mid], 0)
            + z3[c_mid : 2 * c_mid]
            + _shift_out(z3[2 * c_mid :], 2)
        )
        a = jnp.maximum(acc + ba_ref[:], 0.0)
        if col1 is None:
            col1 = jax.lax.broadcasted_iota(jnp.int32, (c_mid, wp), 1)
        # Zero conv1a outside the image: the pad columns/rows would
        # otherwise carry relu(bias + edge taps) into conv1b, where the
        # canonical canvas (and XLA SAME padding) has exact zeros.
        row = _TH * (i - 1) + l  # canvas row of this conv1a value
        row_ok = jnp.logical_and(row >= PAD_ROWS, row < _TH * (n_blocks - 1))
        a = jnp.where(jnp.logical_and(col1 < w_img, row_ok), a, 0.0)
        a_rows.append(a.astype(cdt))

    for r in range(_TH):
        cat = jnp.concatenate(a_rows[r : r + 3], axis=0)  # (3*C_mid, Wp)
        z3 = jax.lax.dot_general(
            wb_ref[:],  # (3*C_out, 3*C_mid): dx-stacked on M
            cat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = (
            _shift_out(z3[:c_out], 0)
            + z3[c_out : 2 * c_out]
            + _shift_out(z3[2 * c_out :], 2)
        )
        y = jnp.maximum(acc + bb_ref[:], 0.0)
        y = jnp.where(jnp.logical_and(col1[:c_out] < w_img, interior), y, 0.0)
        o_ref[0, :, r, :] = y.astype(o_ref.dtype)


def _conv_pair_kernel(
    x_ref, wa_ref, ba_ref, wb_ref, bb_ref, o_ref, *, wp, c_mid, c_out, w_img, n_blocks, cdt
):
    """Fused conv_a (C_in->C_mid) + ReLU + conv_b (C_mid->C_out) + ReLU for
    C_in-channel canvases (the conv2a+conv2b pair). Same structure as
    _conv1a1b_kernel but the first conv reads a multi-channel block; the ten
    intermediate rows the stripe needs live only in VMEM, so the C_mid
    half-res activation map never exists in HBM and the block DMA happens
    once for the pair instead of twice."""
    i = pl.program_id(1)
    interior = jnp.logical_and(i >= 1, i <= n_blocks - 2)
    xb = x_ref[0]  # (C_in, IN_ROWS, Wp)
    col = None

    a_rows = []
    for l in range(7, 17):
        cat = jnp.concatenate(
            [xb[:, l - 1 + dy, :] for dy in range(3)], axis=0
        )  # (3*C_in, Wp)
        z3 = jax.lax.dot_general(
            wa_ref[:],  # (3*C_mid, 3*C_in): dx-stacked on M
            cat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = (
            _shift_out(z3[:c_mid], 0)
            + z3[c_mid : 2 * c_mid]
            + _shift_out(z3[2 * c_mid :], 2)
        )
        a = jnp.maximum(acc + ba_ref[:], 0.0)
        if col is None:
            col = jax.lax.broadcasted_iota(jnp.int32, (c_mid, wp), 1)
        row = _TH * (i - 1) + l
        row_ok = jnp.logical_and(row >= PAD_ROWS, row < _TH * (n_blocks - 1))
        a = jnp.where(jnp.logical_and(col < w_img, row_ok), a, 0.0)
        a_rows.append(a.astype(cdt))

    for r in range(_TH):
        cat = jnp.concatenate(a_rows[r : r + 3], axis=0)  # (3*C_mid, Wp)
        z3 = jax.lax.dot_general(
            wb_ref[:],  # (3*C_out, 3*C_mid)
            cat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = (
            _shift_out(z3[:c_out], 0)
            + z3[c_out : 2 * c_out]
            + _shift_out(z3[2 * c_out :], 2)
        )
        y = jnp.maximum(acc + bb_ref[:], 0.0)
        y = jnp.where(jnp.logical_and(col[:c_out] < w_img, interior), y, 0.0)
        o_ref[0, :, r, :] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("w_img", "interpret", "out_dtype"))
def conv_pair_chw(
    x: jnp.ndarray,  # (B, C_in, Hp, Wp) canvas
    wa: jnp.ndarray,  # (3, 3, C_in, C_mid)
    ba: jnp.ndarray,
    wb: jnp.ndarray,  # (3, 3, C_mid, C_out)
    bb: jnp.ndarray,
    *,
    w_img: int,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Two fused 3x3 SAME convs (+ReLU each) -> (B, C_out, Hp, Wp) canvas."""
    cdt = jnp.float32 if interpret else jnp.bfloat16
    bsz, c_in, hp, wp = x.shape
    assert wp % 128 == 0 and hp % _TH == 0 and hp >= _IN_ROWS, x.shape
    c_mid, c_out = wa.shape[3], wb.shape[3]
    assert c_out <= c_mid, "kernel reuses the (C_mid, Wp) column iota"
    n_blocks = hp // _TH

    wak = wa.transpose(1, 3, 0, 2).reshape(3 * c_mid, 3 * c_in).astype(cdt)
    wbk = wb.transpose(1, 3, 0, 2).reshape(3 * c_out, 3 * c_mid).astype(cdt)

    out = pl.pallas_call(
        functools.partial(
            _conv_pair_kernel,
            wp=wp,
            c_mid=c_mid,
            c_out=c_out,
            w_img=w_img,
            n_blocks=n_blocks,
            cdt=cdt,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, c_out, hp, wp), out_dtype),
        grid=(bsz, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(c_in), pl.Element(_IN_ROWS), pl.Element(wp)),
                lambda bb_, i: (bb_, 0, _TH * jnp.maximum(i - 1, 0), 0),
            ),
            pl.BlockSpec((3 * c_mid, 3 * c_in), lambda bb_, i: (0, 0)),
            pl.BlockSpec((c_mid, 1), lambda bb_, i: (0, 0)),
            pl.BlockSpec((3 * c_out, 3 * c_mid), lambda bb_, i: (0, 0)),
            pl.BlockSpec((c_out, 1), lambda bb_, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c_out, _TH, wp), lambda bb_, i: (bb_, 0, i, 0)),
        interpret=interpret,
    )(
        x.astype(cdt),
        wak,
        ba.reshape(c_mid, 1).astype(jnp.float32),
        wbk,
        bb.reshape(c_out, 1).astype(jnp.float32),
    )
    return out


@functools.partial(jax.jit, static_argnames=("w_img", "interpret", "out_dtype"))
def conv1a1b_chw(
    x: jnp.ndarray,  # (B, 1, Hp, Wp) image canvas (f32 in [0,1] or uint8)
    wa: jnp.ndarray,  # (3, 3, 1, C_mid)
    ba: jnp.ndarray,
    wb: jnp.ndarray,  # (3, 3, C_mid, C_out)
    bb: jnp.ndarray,
    *,
    w_img: int,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused first two SuperPoint convs -> (B, C_out, Hp, Wp) canvas."""
    cdt = jnp.float32 if interpret else jnp.bfloat16
    bsz, one, hp, wp = x.shape
    assert one == 1 and wp % 128 == 0 and hp % _TH == 0, x.shape
    c_mid, c_out = wa.shape[3], wb.shape[3]
    assert c_out <= c_mid, "kernel reuses the (C_mid, Wp) column iota"
    n_blocks = hp // _TH

    if x.dtype == jnp.uint8:
        # fold the 1/255 normalization into the conv1a weights
        wa = wa / 255.0
        x = x.astype(cdt)
    # (3dx*C_mid, 3dy) / (3dx*C_out, 3dy*C_mid): dx stacked on the M axis so
    # each output row is ONE matmul (see _conv_kernel).
    wak = wa.transpose(1, 3, 0, 2).reshape(3 * c_mid, 3).astype(jnp.float32)
    wbk = wb.transpose(1, 3, 0, 2).reshape(3 * c_out, 3 * c_mid).astype(cdt)

    out = pl.pallas_call(
        functools.partial(
            _conv1a1b_kernel,
            wp=wp,
            c_mid=c_mid,
            c_out=c_out,
            w_img=w_img,
            n_blocks=n_blocks,
            cdt=cdt,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, c_out, hp, wp), out_dtype),
        grid=(bsz, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(1), pl.Element(_IN_ROWS), pl.Element(wp)),
                lambda bb_, i: (bb_, 0, _TH * jnp.maximum(i - 1, 0), 0),
            ),
            pl.BlockSpec((3 * c_mid, 3), lambda bb_, i: (0, 0)),
            pl.BlockSpec((c_mid, 1), lambda bb_, i: (0, 0)),
            pl.BlockSpec((3 * c_out, 3 * c_mid), lambda bb_, i: (0, 0)),
            pl.BlockSpec((c_out, 1), lambda bb_, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c_out, _TH, wp), lambda bb_, i: (bb_, 0, i, 0)),
        interpret=interpret,
    )(
        x.astype(cdt),
        wak,
        ba.reshape(c_mid, 1).astype(jnp.float32),
        wbk,
        bb.reshape(c_out, 1).astype(jnp.float32),
    )
    return out


@functools.partial(
    jax.jit, static_argnames=("relu", "w_img", "interpret", "out_dtype")
)
def conv3x3_chw(
    x: jnp.ndarray,  # (B, C, Hp, Wp) canvas, see module docstring
    w: jnp.ndarray,  # (3, 3, C, C_out) HWIO
    b: jnp.ndarray,  # (C_out,)
    *,
    relu: bool = True,
    w_img: int,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """3x3 SAME conv (+bias, optional ReLU) -> (B, C_out, Hp, Wp)."""
    # Interpret mode (CPU tests) lacks a bf16 x bf16 -> f32 dot thunk.
    cdt = jnp.float32 if interpret else jnp.bfloat16
    bsz, c_in, hp, wp = x.shape
    assert wp % 128 == 0, wp
    assert hp % _TH == 0 and hp >= _IN_ROWS, hp
    c_out = w.shape[3]
    n_blocks = hp // _TH

    # (3dx*C_out, 3dy*C): dx stacked on the M axis (one matmul per output
    # row), K contracting the (dy, ci) axis in the row-concat's sublane order.
    wk = (
        w.transpose(1, 3, 0, 2)  # (3dx, C_out, 3dy, C)
        .reshape(3 * c_out, 3 * c_in)
        .astype(cdt)
    )
    kernel = _conv_kernel
    wspec = pl.BlockSpec((3 * c_out, 3 * c_in), lambda bb, i: (0, 0))

    bias = b.reshape(c_out, 1).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            kernel, wp=wp, c_out=c_out, relu=relu, w_img=w_img, n_blocks=n_blocks
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, c_out, hp, wp), out_dtype),
        grid=(bsz, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(c_in),
                    pl.Element(_IN_ROWS),
                    pl.Element(wp),
                ),
                # PAD_ROWS == _TH, so the halo'd fetch starts at row
                # 8*max(i-1, 0) — written as 8*k so Mosaic's divisibility
                # prover accepts the element offset against the (8, 128)
                # tiling.
                lambda bb, i: (bb, 0, _TH * jnp.maximum(i - 1, 0), 0),
            ),
            wspec,
            pl.BlockSpec((c_out, 1), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c_out, _TH, wp), lambda bb, i: (bb, 0, i, 0)),
        interpret=interpret,
    )(x.astype(cdt), wk, bias)
    return out


def to_canvas(img: jnp.ndarray, wp: int) -> jnp.ndarray:
    """(B, H, W) image -> (B, 1, H+2*PAD_ROWS, wp) canvas."""
    b, h, w = img.shape
    x = jnp.pad(img, ((0, 0), (PAD_ROWS, PAD_ROWS), (0, wp - w)))
    return x[:, None]


def pool2_canvas(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 max pool on a canvas, re-establishing the PAD_ROWS offset.

    Image rows PAD..PAD+H-1 pool to rows PAD/2..PAD/2+H/2-1; shift back to
    PAD by padding (image content is non-negative post-ReLU, so the pooled
    pad region stays exactly zero)."""
    p = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )
    half = PAD_ROWS // 2
    core = p[:, :, half : p.shape[2] - half]  # (B, C, H/2, Wp/2)
    return jnp.pad(core, ((0, 0), (0, 0), (PAD_ROWS, PAD_ROWS), (0, 0)))
