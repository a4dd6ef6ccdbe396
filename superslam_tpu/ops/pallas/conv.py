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

from ..precision import default_matmul_precision
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

    y_even = None
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


def _pool_rows_spec(c_in, hp_deep):
    """Input BlockSpec for the pooled kernels: 32 fetched rows per 16-row
    output step, 8-aligned, clipped into the deepened canvas."""
    smax = (hp_deep - 32) // 8

    def index_map(bb_, i):
        return (bb_, 0, 8 * jnp.clip(2 * i - 1, 0, smax), 0)

    def spec(wp):
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(c_in), pl.Element(32), pl.Element(wp)),
            index_map,
        )

    return spec


def _pool_conv_b_loop(a_ref, wb2_ref, bb_ref, o_ref, y_ref, *, wp, c_out, interior, col, w_img):
    """Shared second-conv + vertical-pool loop of the pooled kernels.

    a_ref: (18, C_mid, Wp) VMEM scratch holding conv_a rows at indices
    0..17. Each pooled output row p max-combines conv rows (2p, 2p+1) —
    computed as ONE joint matmul: the two rows' dy windows overlap
    (a-rows 2p..2p+3), so stacking both rows' dx-tap weight blocks on M
    against the 4-row K span gives a (6*C_out, 4*C_mid) x (4*C_mid, Wp)
    product with EXACT 128-tile M/K at C=64 (384, 256) — the per-row
    (192, 192) form padded both dims to 256 on the MXU, wasting ~45% of
    its tiles, and paid the systolic fill twice per pooled row.

    A lax.fori_loop (NOT a fully unrolled Python loop) bounds liveness to
    a few iterations' f32 products — fully unrolled, Mosaic blows the
    16 MB scoped-vmem stack at Wp=1280. Pooled rows land in the
    (8, C_out, Wp) y_ref scratch (dynamic MAJOR-dim stores are legal;
    dynamic second-minor stores into o_ref must be 8-aligned) and copy
    out statically."""

    def body(p, _):
        cat = jnp.concatenate(
            [a_ref[2 * p + t] for t in range(4)], axis=0
        )  # (4*C_mid, Wp)
        z = jax.lax.dot_general(
            wb2_ref[:],  # (6*C_out, 4*C_mid): [row0|row1] x dx blocks on M
            cat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        def ext(z3):
            return (
                _shift_out(z3[:c_out], 0)
                + z3[c_out : 2 * c_out]
                + _shift_out(z3[2 * c_out :], 2)
            )

        y = jnp.maximum(
            jnp.maximum(ext(z[: 3 * c_out]) + bb_ref[:], 0.0),
            jnp.maximum(ext(z[3 * c_out :]) + bb_ref[:], 0.0),
        )
        y = jnp.where(jnp.logical_and(col[:c_out] < w_img, interior), y, 0.0)
        y_ref[p] = y.astype(y_ref.dtype)
        return 0

    # 4x unroll recovers most of the matmul pipelining the loop costs while
    # keeping only 4 iterations' (6*C_out, Wp) f32 products live.
    def quad(q, c):
        for t in range(4):
            body(4 * q + t, c)
        return c

    jax.lax.fori_loop(0, 2, quad, 0, unroll=False)
    for p in range(8):
        o_ref[0, :, p, :] = y_ref[p]


def _prep_wb2(wb, c_mid, c_out, cdt):
    """Paired conv_b weights for _pool_conv_b_loop: (6*C_out, 4*C_mid) with
    the (3dx*C_out, 3dy*C_mid) block repeated for the two conv rows, the
    second shifted one dy (= one C_mid K-block) right."""
    wbk = wb.transpose(1, 3, 0, 2).reshape(3 * c_out, 3 * c_mid).astype(cdt)
    wb2 = jnp.zeros((6 * c_out, 4 * c_mid), cdt)
    wb2 = wb2.at[: 3 * c_out, : 3 * c_mid].set(wbk)
    return wb2.at[3 * c_out :, c_mid:].set(wbk)


def _conv_pair_pool_kernel(
    x_ref, wa_ref, ba_ref, wb_ref, bb_ref, o_ref, a_ref, y_ref, *, wp, c_mid, c_out, w_img, n_blocks, hp_deep, cdt, shifted_a
):
    """conv_a + ReLU + conv_b + ReLU + vertical half of the 2x2 max-pool.

    One grid step emits 8 POOLED rows (16 conv rows): the row pair is
    max-combined in registers on the way out, so the full-res conv_b map
    never exists in HBM (XLA's reduce_window on it measured ~5x off
    bandwidth). The input is the 16-row-padded "deep" canvas so interior
    fetches (rows 16i-8..16i+23) never clamp; the 8-row top/bottom pad
    blocks of the standard-output canvas are written as zeros.

    Serves both fused pairs: conv2a+conv2b (C_in=64, bf16 blocks, dx taps
    as partial-sum rotates) and conv1a+conv1b (C_in=1, ``shifted_a``: the
    dx taps are lane-rolls of the f32 INPUT rows — two rolls for the whole
    block — and six a-rows batch into one (6*C_mid, 24) x (24, Wp) matmul;
    the per-row K=3 form ran one matmul per a-row at ~2% contraction
    utilization plus 36 partial-sum rotates per block)."""
    i = pl.program_id(1)
    interior = jnp.logical_and(i >= 1, i <= n_blocks - 2)
    xb = x_ref[0]  # (C_in, 32, Wp)
    col = jax.lax.broadcasted_iota(jnp.int32, (c_mid, wp), 1)

    def a_mask(a, l):
        row = 16 * i - 8 + l  # deep-canvas row of this conv_a value
        row_ok = jnp.logical_and(row >= 2 * PAD_ROWS, row < hp_deep - 2 * PAD_ROWS)
        return jnp.where(jnp.logical_and(col < w_img, row_ok), a, 0.0)

    if shifted_a:
        from jax.experimental.pallas import tpu as pltpu

        r20 = xb[0, 6:26, :]  # the 20 input rows a-rows 7..24 touch
        c20 = jax.lax.broadcasted_iota(jnp.int32, (20, wp), 1)
        left = jnp.where(c20 >= 1, pltpu.roll(r20, 1, axis=1), 0.0)  # x[j-1]
        right = jnp.where(c20 < wp - 1, pltpu.roll(r20, wp - 1, axis=1), 0.0)
        for q in range(3):  # chunks of 6 a-rows sharing an 8-row K window
            s = 6 * q
            xq = jnp.concatenate(
                [left[s : s + 8], r20[s : s + 8], right[s : s + 8]], axis=0
            )  # (24, Wp): [dx0 | dx1 | dx2] x 8 rows
            z = jax.lax.dot_general(
                wa_ref[:],  # (6*C_mid, 24), identical for every chunk
                xq,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for t in range(6):
                a = jnp.maximum(z[t * c_mid : (t + 1) * c_mid] + ba_ref[:], 0.0)
                a_ref[s + t] = a_mask(a, 7 + s + t).astype(cdt)
    else:
        for l in range(7, 25):
            cat = jnp.concatenate(
                [xb[:, l - 1 + dy, :] for dy in range(3)], axis=0
            )  # (3*C_in, Wp)
            z3 = jax.lax.dot_general(
                wa_ref[:],  # (3*C_mid, 3*C_in)
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
            a_ref[l - 7] = a_mask(a, l).astype(cdt)

    _pool_conv_b_loop(
        a_ref, wb_ref, bb_ref, o_ref, y_ref,
        wp=wp, c_out=c_out, interior=interior, col=col, w_img=w_img,
    )


@functools.partial(
    jax.jit, static_argnames=("w_img", "interpret", "out_dtype", "pool_vert")
)
@default_matmul_precision
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
    pool_vert: bool = False,
) -> jnp.ndarray:
    """Two fused 3x3 SAME convs (+ReLU each) -> (B, C_out, Hp, Wp) canvas.

    With ``pool_vert`` the output is additionally vertically pooled: a
    standard canvas (B, C_out, Hp//2 + PAD_ROWS, Wp) whose row k is
    max(conv rows 2k', 2k'+1) — finish with hpool_canvas for the full 2x2.
    """
    cdt = jnp.float32 if interpret else jnp.bfloat16
    bsz, c_in, hp, wp = x.shape
    assert wp % 128 == 0 and hp % _TH == 0 and hp >= _IN_ROWS, x.shape
    c_mid, c_out = wa.shape[3], wb.shape[3]
    assert c_out <= c_mid, "kernel reuses the (C_mid, Wp) column iota"

    wak = wa.transpose(1, 3, 0, 2).reshape(3 * c_mid, 3 * c_in).astype(cdt)
    wbk = wb.transpose(1, 3, 0, 2).reshape(3 * c_out, 3 * c_mid).astype(cdt)
    weights = (
        wak,
        ba.reshape(c_mid, 1).astype(jnp.float32),
        wbk,
        bb.reshape(c_out, 1).astype(jnp.float32),
    )
    wspecs = [
        pl.BlockSpec((3 * c_mid, 3 * c_in), lambda bb_, i: (0, 0)),
        pl.BlockSpec((c_mid, 1), lambda bb_, i: (0, 0)),
        pl.BlockSpec((3 * c_out, 3 * c_mid), lambda bb_, i: (0, 0)),
        pl.BlockSpec((c_out, 1), lambda bb_, i: (0, 0)),
    ]

    if pool_vert:
        assert hp % 16 == 0, hp
        from jax.experimental.pallas import tpu as pltpu

        wb2 = _prep_wb2(wb, c_mid, c_out, cdt)
        pweights = (wak, weights[1], wb2, weights[3])
        pwspecs = [
            wspecs[0],
            wspecs[1],
            pl.BlockSpec((6 * c_out, 4 * c_mid), lambda bb_, i: (0, 0)),
            wspecs[3],
        ]
        xd = jnp.pad(x.astype(cdt), ((0, 0), (0, 0), (PAD_ROWS, PAD_ROWS), (0, 0)))
        hp_deep = hp + 2 * PAD_ROWS
        n_blocks = hp_deep // 16
        return pl.pallas_call(
            functools.partial(
                _conv_pair_pool_kernel,
                wp=wp, c_mid=c_mid, c_out=c_out, w_img=w_img,
                n_blocks=n_blocks, hp_deep=hp_deep, cdt=cdt, shifted_a=False,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (bsz, c_out, hp_deep // 2, wp), out_dtype
            ),
            grid=(bsz, n_blocks),
            in_specs=[_pool_rows_spec(c_in, hp_deep)(wp)] + pwspecs,
            out_specs=pl.BlockSpec(
                (1, c_out, 8, wp), lambda bb_, i: (bb_, 0, i, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((18, c_mid, wp), cdt),
                pltpu.VMEM((8, c_out, wp), out_dtype),
            ],
            interpret=interpret,
        )(xd, *pweights)

    n_blocks = hp // _TH
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
        ]
        + wspecs,
        out_specs=pl.BlockSpec((1, c_out, _TH, wp), lambda bb_, i: (bb_, 0, i, 0)),
        interpret=interpret,
    )(x.astype(cdt), *weights)
    return out


@functools.partial(
    jax.jit, static_argnames=("w_img", "interpret", "out_dtype", "pool_vert")
)
@default_matmul_precision
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
    pool_vert: bool = False,
) -> jnp.ndarray:
    """Fused first two SuperPoint convs -> (B, C_out, Hp, Wp) canvas
    (a vertically pooled (B, C_out, Hp//2 + PAD_ROWS, Wp) standard canvas
    when ``pool_vert``; finish with hpool_canvas)."""
    cdt = jnp.float32 if interpret else jnp.bfloat16
    bsz, one, hp, wp = x.shape
    assert one == 1 and wp % 128 == 0 and hp % _TH == 0, x.shape
    c_mid, c_out = wa.shape[3], wb.shape[3]
    assert c_out <= c_mid, "kernel reuses the (C_mid, Wp) column iota"

    if x.dtype == jnp.uint8:
        # fold the 1/255 normalization into the conv1a weights
        wa = wa / 255.0
        x = x.astype(cdt)
    # (3dx*C_mid, 3dy) / (3dx*C_out, 3dy*C_mid): dx stacked on the M axis so
    # each output row is ONE matmul (see _conv_kernel).
    wak = wa.transpose(1, 3, 0, 2).reshape(3 * c_mid, 3).astype(jnp.float32)
    wbk = wb.transpose(1, 3, 0, 2).reshape(3 * c_out, 3 * c_mid).astype(cdt)
    weights = (
        wak,
        ba.reshape(c_mid, 1).astype(jnp.float32),
        wbk,
        bb.reshape(c_out, 1).astype(jnp.float32),
    )
    wspecs = [
        pl.BlockSpec((3 * c_mid, 3), lambda bb_, i: (0, 0)),
        pl.BlockSpec((c_mid, 1), lambda bb_, i: (0, 0)),
        pl.BlockSpec((3 * c_out, 3 * c_mid), lambda bb_, i: (0, 0)),
        pl.BlockSpec((c_out, 1), lambda bb_, i: (0, 0)),
    ]

    if pool_vert:
        assert hp % 16 == 0, hp
        from jax.experimental.pallas import tpu as pltpu

        # Shared pooled kernel in its shifted_a mode: image rows and conv1a
        # weights stay f32; the dx taps ride lane-rolled input copies, so
        # the conv1a weights pack as (6 a-rows * C_mid, 3dx * 8 K-rows)
        # with the SAME block serving every 6-row chunk.
        waT = wa[:, :, 0, :].transpose(2, 1, 0).astype(jnp.float32)  # (c, dx, dy)
        wa6 = jnp.zeros((6, c_mid, 3, 8), jnp.float32)
        for r in range(6):
            wa6 = wa6.at[r, :, :, r : r + 3].set(waT)
        wa6 = wa6.reshape(6 * c_mid, 24)
        wb2 = _prep_wb2(wb, c_mid, c_out, cdt)
        pweights = (wa6, weights[1], wb2, weights[3])
        pwspecs = [
            pl.BlockSpec((6 * c_mid, 24), lambda bb_, i: (0, 0)),
            wspecs[1],
            pl.BlockSpec((6 * c_out, 4 * c_mid), lambda bb_, i: (0, 0)),
            wspecs[3],
        ]
        xd = jnp.pad(
            x.astype(jnp.float32), ((0, 0), (0, 0), (PAD_ROWS, PAD_ROWS), (0, 0))
        )
        hp_deep = hp + 2 * PAD_ROWS
        n_blocks = hp_deep // 16
        return pl.pallas_call(
            functools.partial(
                _conv_pair_pool_kernel,
                wp=wp, c_mid=c_mid, c_out=c_out, w_img=w_img,
                n_blocks=n_blocks, hp_deep=hp_deep, cdt=cdt, shifted_a=True,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (bsz, c_out, hp_deep // 2, wp), out_dtype
            ),
            grid=(bsz, n_blocks),
            in_specs=[_pool_rows_spec(1, hp_deep)(wp)] + pwspecs,
            out_specs=pl.BlockSpec(
                (1, c_out, 8, wp), lambda bb_, i: (bb_, 0, i, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((18, c_mid, wp), cdt),
                pltpu.VMEM((8, c_out, wp), out_dtype),
            ],
            interpret=interpret,
        )(xd, *pweights)

    n_blocks = hp // _TH
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
        ]
        + wspecs,
        out_specs=pl.BlockSpec((1, c_out, _TH, wp), lambda bb_, i: (bb_, 0, i, 0)),
        interpret=interpret,
    )(x.astype(cdt), *weights)
    return out


@functools.partial(
    jax.jit, static_argnames=("relu", "w_img", "interpret", "out_dtype")
)
@default_matmul_precision
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


def hpool_canvas(x: jnp.ndarray) -> jnp.ndarray:
    """Finish a 2x2 max-pool whose vertical half was folded into the
    producing conv kernel (``pool_vert=True``): horizontal pair max only.
    The pooled kernel already emits a standard PAD_ROWS canvas (its deep
    input pads pool down to exactly PAD_ROWS), so rows are untouched."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 1, 2), (1, 1, 1, 2), "VALID"
    )


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
