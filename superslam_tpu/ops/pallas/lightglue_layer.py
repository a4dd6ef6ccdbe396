"""Fused LightGlue transformer layer as Pallas TPU kernels.

The XLA lowering of a LightGlue layer runs at ~25-30% MXU: the GEMMs are
fine but each layer dispatches ~20 ops (head split/merge relayouts, f32
layer-norm/softmax, rotary shuffles) whose HBM round-trips dominate at
SLAM sizes (K~600, D=256). These kernels run one whole self- or
cross-attention block per sequence (pair) in VMEM — the reference gets the
equivalent fusion from TensorRT's engine compiler
(``/root/reference/src/LightGlue.cc``); on TPU it has to be written.

Mosaic-specific choices (all probe-verified on this backend):
- Wqkv columns are PRE-PERMUTED host-side from cvg/LightGlue's interleaved
  (head, channel, qkv) packing into [q | k | v] blocks with each head's
  channels split [evens | odds], so q/k/v and per-head slices are plain
  64/128-aligned lane slices (strided lane access is unsupported).
- In the [evens | odds] per-head layout, rotate_half becomes two 32-lane
  rolls + a select on f32 (Mosaic only lowers 2-D 32-bit lane rotates);
  cos/sin arrive pre-permuted as (K, 256) tiles.
- Attention logits use an NT dot_general (contract dim 1 with dim 1); the
  cross block computes the pair similarity once per direction instead of
  transposing (transposed-LHS dots don't lower).
- GELU uses the Abramowitz-Stegun 7.1.26 erf polynomial (|err| < 1.5e-7):
  erf/erfc primitives have no Mosaic lowering.
- The FFN's cat([x, message]) @ W0 is computed as x @ W0[:256] +
  message @ W0[256:] (lane-dim concats crash this backend's compiler).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..precision import default_matmul_precision
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DIM = 256
HEADS = 4
HEAD_DIM = 64
NEG = -1e9


def _erf(z: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 polynomial erf (f32, |err| < 1.5e-7)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(z)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + p * za)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-za * za))


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))


def _rot_half_perm(t: jnp.ndarray) -> jnp.ndarray:
    """rotate_half in the per-head [evens | odds] lane layout:
    [e | o] -> [-o | e] within every 64-lane head block (f32 rolls)."""
    r32 = pltpu.roll(t, 32, axis=1)  # x[l-32]
    rneg = pltpu.roll(t, t.shape[1] - 32, axis=1)  # x[l+32]
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    return jnp.where(lane % HEAD_DIM < 32, -rneg, r32)


def _masked_softmax(logits: jnp.ndarray, mask_row: jnp.ndarray) -> jnp.ndarray:
    """Softmax over lanes with a (1, K) 0/1 key mask broadcast over rows."""
    lg = jnp.where(mask_row > 0.0, logits, NEG)
    mx = jnp.max(lg, axis=1, keepdims=True)
    e = jnp.exp(lg - mx)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _ffn_tail(x_bf, msg_f32, w0x_ref, w0m_ref, b0_ref, g_ref, be_ref, w3_ref, b3_ref):
    """x + Linear(GELU(LN(x @ W0x + msg @ W0m + b0))) — all in VMEM."""
    h = (
        jax.lax.dot_general(
            x_bf, w0x_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            msg_f32.astype(x_bf.dtype), w0m_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b0_ref[:]
    )  # (K, 512) f32
    mu = jnp.mean(h, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=1, keepdims=True)
    hn = (h - mu) * jax.lax.rsqrt(var + 1e-5) * g_ref[:] + be_ref[:]
    h2 = _gelu(hn).astype(x_bf.dtype)
    y = (
        jax.lax.dot_general(
            h2, w3_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b3_ref[:]
    )
    return x_bf.astype(jnp.float32) + y


def _self_kernel(
    x_ref, cs_ref, sn_ref, m_ref,
    wqkv_ref, bqkv_ref, wout_ref, bout_ref,
    w0x_ref, w0m_ref, b0_ref, g_ref, be_ref, w3_ref, b3_ref,
    o_ref, ctx_ref,
):
    x = x_ref[0]  # (K, 256) bf16
    qkv = (
        jax.lax.dot_general(
            x, wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[:]
    )  # (K, 768) f32, columns [q | k | v] head-major, channels [e | o]
    cos = cs_ref[0]
    sin = sn_ref[0]
    q = qkv[:, 0:DIM]
    k = qkv[:, DIM : 2 * DIM]
    qb = (q * cos + _rot_half_perm(q) * sin).astype(x.dtype)
    kb = (k * cos + _rot_half_perm(k) * sin).astype(x.dtype)
    vb = qkv[:, 2 * DIM :].astype(x.dtype)
    mask_row = m_ref[0, 0:1, :]  # (1, K) f32
    scale = np.float32(1.0 / np.sqrt(HEAD_DIM))
    for h in range(HEADS):
        sl = slice(h * HEAD_DIM, (h + 1) * HEAD_DIM)
        lg = (
            jax.lax.dot_general(
                qb[:, sl], kb[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (K, K)
        attn = _masked_softmax(lg, mask_row).astype(x.dtype)
        ctx_ref[:, sl] = jax.lax.dot_general(
            attn, vb[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(ctx_ref.dtype)
    msg = (
        jax.lax.dot_general(
            ctx_ref[:], wout_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bout_ref[:]
    )
    out = _ffn_tail(
        x, msg, w0x_ref, w0m_ref, b0_ref, g_ref, be_ref, w3_ref, b3_ref
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _cross_kernel(
    x_ref, m_ref,
    wqk_ref, bqk_ref, wv_ref, bv_ref, wout_ref, bout_ref,
    w0x_ref, w0m_ref, b0_ref, g_ref, be_ref, w3_ref, b3_ref,
    o_ref, c0_ref, c1_ref,
):
    """One pair (2, K, 256): row 0 attends row 1 and vice versa."""
    x0 = x_ref[0]
    x1 = x_ref[1]

    def proj(xx, w_ref, b_ref):
        return (
            jax.lax.dot_general(
                xx, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_ref[:]
        )

    qk0 = proj(x0, wqk_ref, bqk_ref).astype(x0.dtype)
    qk1 = proj(x1, wqk_ref, bqk_ref).astype(x0.dtype)
    v0 = proj(x0, wv_ref, bv_ref).astype(x0.dtype)
    v1 = proj(x1, wv_ref, bv_ref).astype(x0.dtype)
    m0 = m_ref[0, 0:1, :]
    m1 = m_ref[1, 0:1, :]
    scale = np.float32(1.0 / np.sqrt(HEAD_DIM))
    for h in range(HEADS):
        sl = slice(h * HEAD_DIM, (h + 1) * HEAD_DIM)

        def nt(a, b):
            return (
                jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )

        a01 = _masked_softmax(nt(qk0[:, sl], qk1[:, sl]), m1).astype(x0.dtype)
        c0_ref[:, sl] = jax.lax.dot_general(
            a01, v1[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(c0_ref.dtype)
        a10 = _masked_softmax(nt(qk1[:, sl], qk0[:, sl]), m0).astype(x0.dtype)
        c1_ref[:, sl] = jax.lax.dot_general(
            a10, v0[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(c1_ref.dtype)

    for side, (xx, ctx_ref) in enumerate(((x0, c0_ref), (x1, c1_ref))):
        msg = (
            jax.lax.dot_general(
                ctx_ref[:], wout_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bout_ref[:]
        )
        out = _ffn_tail(
            xx, msg, w0x_ref, w0m_ref, b0_ref, g_ref, be_ref, w3_ref, b3_ref
        )
        o_ref[side] = out.astype(o_ref.dtype)


# -- host-side weight preparation -------------------------------------------


def _perm_channels() -> np.ndarray:
    """Per-head channel order d -> [evens | odds]: new position of d."""
    pe = np.empty(HEAD_DIM, np.int64)
    for d in range(HEAD_DIM):
        pe[d] = d // 2 if d % 2 == 0 else 32 + d // 2
    return pe


def qkv_permutation() -> np.ndarray:
    """old column index for each new column of the permuted Wqkv.

    Old cvg packing: col = (h * 64 + d) * 3 + j  (j in q,k,v).
    New: col' = j * 256 + h * 64 + perm(d), perm = [evens | odds].
    """
    pe = _perm_channels()
    old = np.empty(3 * DIM, np.int64)
    for j in range(3):
        for h in range(HEADS):
            for d in range(HEAD_DIM):
                new = j * DIM + h * HEAD_DIM + pe[d]
                old[new] = (h * HEAD_DIM + d) * 3 + j
    return old


def head_permutation() -> np.ndarray:
    """old column index per new column for plain (to_qk/to_v) projections:
    per-head channels reordered [evens | odds] (no qkv interleave)."""
    pe = _perm_channels()
    old = np.empty(DIM, np.int64)
    for h in range(HEADS):
        for d in range(HEAD_DIM):
            old[h * HEAD_DIM + pe[d]] = h * HEAD_DIM + d
    return old


_QKV_PERM = qkv_permutation()
_HEAD_PERM = head_permutation()


def _row2(v, n):
    return v.reshape(1, n).astype(jnp.float32)


def augment_fused_layer_params(params, dtype=jnp.bfloat16, num_layers=9):
    """Return a params dict with the fused kernels' permuted weights
    precomputed under ``<prefix>.__fused`` keys. Called once at pipeline /
    matcher construction so the per-layer column permutations and casts run
    at load time, not inside every traced forward (~18 gather+cast passes
    over ~1.5 MB of parameters per matcher call otherwise). Inference-only:
    the training path keeps the raw torch-layout dict."""
    if "transformers.0.self_attn.Wqkv.weight" not in params:
        return params  # stub/partial params: leave untouched
    out = dict(params)
    for i in range(num_layers):
        sp = f"transformers.{i}.self_attn"
        cp = f"transformers.{i}.cross_attn"
        out[f"{sp}.__fused"] = prep_self_weights(params, sp, dtype)
        out[f"{cp}.__fused"] = prep_cross_weights(params, cp, dtype)
    return out


def prep_self_weights(params, prefix, dtype):
    """Kernel operand list for one self-attention block."""
    pre = params.get(f"{prefix}.__fused")
    if pre is not None and pre[0].dtype == dtype:
        return pre
    p = params
    wqkv = jnp.asarray(p[f"{prefix}.Wqkv.weight"])[:, _QKV_PERM].astype(dtype)
    bqkv = _row2(jnp.asarray(p[f"{prefix}.Wqkv.bias"])[_QKV_PERM], 3 * DIM)
    # out_proj consumes the ctx in permuted-head layout: permute its ROWS.
    wout = jnp.asarray(p[f"{prefix}.out_proj.weight"])[_HEAD_PERM, :].astype(dtype)
    bout = _row2(jnp.asarray(p[f"{prefix}.out_proj.bias"]), DIM)
    w0 = jnp.asarray(p[f"{prefix}.ffn.0.weight"])
    w0x = w0[:DIM].astype(dtype)
    w0m = w0[DIM:].astype(dtype)
    b0 = _row2(jnp.asarray(p[f"{prefix}.ffn.0.bias"]), 2 * DIM)
    g = _row2(jnp.asarray(p[f"{prefix}.ffn.1.weight"]), 2 * DIM)
    be = _row2(jnp.asarray(p[f"{prefix}.ffn.1.bias"]), 2 * DIM)
    w3 = jnp.asarray(p[f"{prefix}.ffn.3.weight"]).astype(dtype)
    b3 = _row2(jnp.asarray(p[f"{prefix}.ffn.3.bias"]), DIM)
    return [wqkv, bqkv, wout, bout, w0x, w0m, b0, g, be, w3, b3]


def prep_cross_weights(params, prefix, dtype):
    pre = params.get(f"{prefix}.__fused")
    if pre is not None and pre[0].dtype == dtype:
        return pre
    p = params
    wqk = jnp.asarray(p[f"{prefix}.to_qk.weight"])[:, _HEAD_PERM].astype(dtype)
    bqk = _row2(jnp.asarray(p[f"{prefix}.to_qk.bias"])[_HEAD_PERM], DIM)
    wv = jnp.asarray(p[f"{prefix}.to_v.weight"])[:, _HEAD_PERM].astype(dtype)
    bv = _row2(jnp.asarray(p[f"{prefix}.to_v.bias"])[_HEAD_PERM], DIM)
    wout = jnp.asarray(p[f"{prefix}.to_out.weight"])[_HEAD_PERM, :].astype(dtype)
    bout = _row2(jnp.asarray(p[f"{prefix}.to_out.bias"]), DIM)
    w0 = jnp.asarray(p[f"{prefix}.ffn.0.weight"])
    w0x = w0[:DIM].astype(dtype)
    w0m = w0[DIM:].astype(dtype)
    b0 = _row2(jnp.asarray(p[f"{prefix}.ffn.0.bias"]), 2 * DIM)
    g = _row2(jnp.asarray(p[f"{prefix}.ffn.1.weight"]), 2 * DIM)
    be = _row2(jnp.asarray(p[f"{prefix}.ffn.1.bias"]), 2 * DIM)
    w3 = jnp.asarray(p[f"{prefix}.ffn.3.weight"]).astype(dtype)
    b3 = _row2(jnp.asarray(p[f"{prefix}.ffn.3.bias"]), DIM)
    return [wqk, bqk, wv, bv, wout, bout, w0x, w0m, b0, g, be, w3, b3]


def _wspecs(shapes):
    return [
        pl.BlockSpec(s, functools.partial(lambda b, _n=len(s): (0,) * _n))
        for s in shapes
    ]


@functools.partial(jax.jit, static_argnames=("interpret",))
@default_matmul_precision
def fused_self_block(x, cos_p, sin_p, mask, weights, interpret=False):
    """x (B, K, 256) bf16; cos_p/sin_p (B, K, 256) f32 in permuted layout;
    mask (B, 8, K) f32 0/1. Returns the block output (B, K, 256)."""
    b, kk, _ = x.shape
    assert kk % 8 == 0, kk
    dtype = x.dtype
    wshapes = [tuple(w.shape) for w in weights]
    return pl.pallas_call(
        _self_kernel,
        out_shape=jax.ShapeDtypeStruct((b, kk, DIM), dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kk, DIM), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, kk, DIM), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, kk, DIM), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, kk), lambda i: (i, 0, 0)),
        ]
        + _wspecs(wshapes),
        out_specs=pl.BlockSpec((1, kk, DIM), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((kk, DIM), dtype)],
        interpret=interpret,
    )(x, cos_p, sin_p, mask, *weights)


@functools.partial(jax.jit, static_argnames=("interpret",))
@default_matmul_precision
def fused_cross_block(x, mask, weights, interpret=False):
    """x (2P, K, 256) pair-interleaved; mask (2P, 8, K) f32 0/1."""
    b2, kk, _ = x.shape
    assert b2 % 2 == 0 and kk % 8 == 0, x.shape
    dtype = x.dtype
    wshapes = [tuple(w.shape) for w in weights]
    return pl.pallas_call(
        _cross_kernel,
        out_shape=jax.ShapeDtypeStruct((b2, kk, DIM), dtype),
        grid=(b2 // 2,),
        in_specs=[
            pl.BlockSpec((2, kk, DIM), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, 8, kk), lambda i: (i, 0, 0)),
        ]
        + _wspecs(wshapes),
        out_specs=pl.BlockSpec((2, kk, DIM), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((kk, DIM), dtype),
            pltpu.VMEM((kk, DIM), dtype),
        ],
        interpret=interpret,
    )(x, mask, *weights)
