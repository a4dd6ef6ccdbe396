"""LightGlue feature matcher as a single padded-shape XLA program.

Reimplements the matcher the reference exports matcher-only to TensorRT
(``/root/reference/utils/convert_lightglue_to_onnx.py:56-125``; engine I/O in
``src/LightGlue.cc:174-227``): 9 transformer layers over 256-d SuperPoint
descriptors with learnable-Fourier rotary positional self-attention,
bidirectional cross-attention, and a dual-softmax + matchability assignment.
Early-exit and point pruning are disabled, matching the export contract.

TPU-first design decisions:
- **Static padded shapes**: both keypoint sets are padded to a fixed K with
  validity masks threaded through attention, the assignment softmaxes, and
  match extraction (the -1/unmatched convention absorbs padding naturally).
  The reference instead re-allocates TRT bindings per frame
  (``src/LightGlue.cc:174-227``); here one compiled program serves every
  frame, so there are no recompiles and no allocator on the hot path.
- bfloat16 matmuls with f32 softmax/logsumexp.
- Keypoints are pre-normalized by the caller as (kpt - size/2)/(max(w,h)/2),
  the same contract as the reference wrapper (``src/LightGlue.cc:163-172``).

Parameter names mirror the cvg/LightGlue torch state dict
(``transformers.{i}.self_attn.Wqkv.weight`` etc., linear weights transposed
to (in, out) at load) so published checkpoints load without renaming —
including the interleaved (head, channel, qkv) packing of Wqkv.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

DIM = 256
NUM_HEADS = 4
HEAD_DIM = DIM // NUM_HEADS
NUM_LAYERS = 9
NEG = -1e9


def _linear(x, params, name, dtype):
    w = params[f"{name}.weight"].astype(dtype)  # (in, out)
    b = params.get(f"{name}.bias")
    y = x.astype(dtype) @ w
    if b is not None:
        y = y + b.astype(dtype)
    return y


def _layer_norm(x, params, name, dtype):
    g = params[f"{name}.weight"].astype(jnp.float32)
    b = params[f"{name}.bias"].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(dtype)


def _ffn(x, message, params, prefix, dtype):
    """x + MLP(cat[x, message]): Linear(2d,2d) -> LayerNorm -> GELU -> Linear."""
    h = jnp.concatenate([x, message], axis=-1)
    h = _linear(h, params, f"{prefix}.0", dtype)
    h = _layer_norm(h, params, f"{prefix}.1", dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = _linear(h, params, f"{prefix}.3", dtype)
    return x + h


def _rotary_encoding(kpts, params, dtype):
    """Learnable Fourier features -> (cos, sin) each (B, N, HEAD_DIM).

    projected = kpts @ Wr^T (no bias); cos/sin repeated-interleaved x2 so the
    rotary pairs (2i, 2i+1) share a frequency.
    """
    wr = params["posenc.Wr.weight"].astype(jnp.float32)  # (2, HEAD_DIM//2)
    proj = kpts.astype(jnp.float32) @ wr  # (B, N, 32)
    cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)
    return cos.astype(dtype), sin.astype(dtype)


def _rotate_half(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


def _apply_rotary(t, cos, sin):
    # t: (B, H, N, D), cos/sin: (B, N, D) broadcast over heads.
    return t * cos[:, None] + _rotate_half(t) * sin[:, None]


def _split_heads(x):
    b, n, _ = x.shape
    return x.reshape(b, n, NUM_HEADS, HEAD_DIM).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _pallas_attn_wanted() -> bool:
    """Whether attention routes through the fused VMEM kernel
    (ops/pallas/attention.py). Default: on for TPU backends, off on CPU
    (where the XLA path is the oracle and interpret-mode Pallas is orders
    of magnitude slower). SUPERSLAM_PALLAS_ATTN=0/1 overrides.

    Read at TRACE time: the choice is baked into each compiled program, so
    set the env var before the first matcher call — flipping it later only
    affects programs compiled for new shapes (same contract as
    SUPERSLAM_PALLAS_CONV and SUPERSLAM_DEVICE_TRACKER's backend probe)."""
    import os

    v = os.environ.get("SUPERSLAM_PALLAS_ATTN")
    if v is not None:
        return v not in ("0", "", "false")
    return jax.default_backend() == "tpu"


def _pallas_layer_wanted() -> bool:
    """Whether whole transformer layers run as fused Pallas kernels
    (ops/pallas/lightglue_layer.py) instead of ~20 XLA ops per layer.
    Default: on for TPU backends, off on CPU (XLA path is the oracle).
    SUPERSLAM_PALLAS_LG=0/1 overrides; read at trace time. An explicit
    SUPERSLAM_PALLAS_ATTN=0 (the force-XLA-attention debug knob) also
    disables the fused layers unless PALLAS_LG overrides it — otherwise
    that A/B would silently keep Pallas attention inside the fused path."""
    import os

    v = os.environ.get("SUPERSLAM_PALLAS_LG")
    if v is not None:
        return v not in ("0", "", "false")
    a = os.environ.get("SUPERSLAM_PALLAS_ATTN")
    if a is not None and a in ("0", "", "false"):
        return False
    return jax.default_backend() == "tpu"


def _forward_pallas_layers(params, x, kpts, mask, compute_dtype, interpret=False):
    """All 9 self+cross layers via the fused kernels. x (2B, K, 256)
    (K % 8 == 0), kpts (2B, K, 2) normalized, mask (2B, K) bool."""
    from ..ops.pallas.lightglue_layer import (
        fused_cross_block,
        fused_self_block,
        prep_cross_weights,
        prep_self_weights,
    )

    wr = params["posenc.Wr.weight"].astype(jnp.float32)  # (2, 32)
    proj = kpts.astype(jnp.float32) @ wr  # (2B, K, 32)
    # Permuted [evens | odds] rotary tiles: both halves of a head share the
    # frequency, heads share the encoding.
    cos_p = jnp.tile(jnp.concatenate([jnp.cos(proj)] * 2, -1), (1, 1, NUM_HEADS))
    sin_p = jnp.tile(jnp.concatenate([jnp.sin(proj)] * 2, -1), (1, 1, NUM_HEADS))
    mask8 = jnp.broadcast_to(
        mask.astype(jnp.float32)[:, None, :], (x.shape[0], 8, x.shape[1])
    )
    # CPU interpret mode lacks a bf16 x bf16 -> f32 dot thunk (same
    # limitation as the conv kernels): run the kernels in f32 there.
    kdt = jnp.float32 if interpret else compute_dtype
    x = x.astype(kdt)
    for i in range(NUM_LAYERS):
        p = f"transformers.{i}"
        ws = prep_self_weights(params, f"{p}.self_attn", kdt)
        x = fused_self_block(x, cos_p, sin_p, mask8, ws, interpret=interpret)
        wc = prep_cross_weights(params, f"{p}.cross_attn", kdt)
        x = fused_cross_block(x, mask8, wc, interpret=interpret)
    return x.astype(compute_dtype)


def _attention(q, k, v, key_mask):
    """Masked SDPA. q,k,v: (B, H, N, D); key_mask: (B, N) bool."""
    if _pallas_attn_wanted():
        from ..ops.pallas.attention import masked_attention

        return masked_attention(q, k, v, key_mask)
    scale = 1.0 / np.sqrt(HEAD_DIM)
    logits = jnp.einsum(
        "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(key_mask[:, None, None, :], logits, NEG)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)


def _self_block(x, enc, mask, params, prefix, dtype):
    b, n, _ = x.shape
    qkv = _linear(x, params, f"{prefix}.Wqkv", dtype)
    # cvg/LightGlue packs Wqkv output as (head, channel, qkv) interleaved.
    qkv = qkv.reshape(b, n, NUM_HEADS, HEAD_DIM, 3).transpose(0, 2, 1, 3, 4)
    q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
    cos, sin = enc
    q = _apply_rotary(q, cos, sin)
    k = _apply_rotary(k, cos, sin)
    context = _attention(q, k, v, mask)
    message = _linear(_merge_heads(context), params, f"{prefix}.out_proj", dtype)
    return _ffn(x, message, params, f"{prefix}.ffn", dtype)


def _cross_block_paired(x, mask, params, prefix, dtype):
    """Cross-attention over interleaved pair rows: (2P, K, D) where rows
    (2p, 2p+1) attend each other. One set of projections for all rows; the
    similarity is computed once per pair and used in both directions."""
    qk = _split_heads(_linear(x, params, f"{prefix}.to_qk", dtype))  # (2P,H,K,Dh)
    v = _split_heads(_linear(x, params, f"{prefix}.to_v", dtype))
    p2, h, k, dh = qk.shape
    if _pallas_attn_wanted():
        # One fused-SDPA call over all 2P rows: row 2p attends row 2p+1 and
        # vice versa, so keys/values/mask are the pair-swapped views.
        def swap(a):
            return a.reshape(p2 // 2, 2, *a.shape[1:])[:, ::-1].reshape(a.shape)

        out = _attention(qk, swap(qk), swap(v), swap(mask))
        msg = _linear(_merge_heads(out), params, f"{prefix}.to_out", dtype)
        return _ffn(x, msg, params, f"{prefix}.ffn", dtype)
    qk = qk.reshape(p2 // 2, 2, h, k, dh)
    v = v.reshape(p2 // 2, 2, h, k, dh)
    m = mask.reshape(p2 // 2, 2, k)
    scale = 1.0 / np.sqrt(HEAD_DIM)
    sim = jnp.einsum(
        "phid,phjd->phij", qk[:, 0], qk[:, 1], preferred_element_type=jnp.float32
    ) * scale
    sim01 = jnp.where(m[:, 1][:, None, None, :], sim, NEG)
    sim10 = jnp.where(m[:, 0][:, None, None, :], sim.transpose(0, 1, 3, 2), NEG)
    m0 = jnp.einsum(
        "phij,phjd->phid", jax.nn.softmax(sim01, axis=-1).astype(v.dtype), v[:, 1]
    )
    m1 = jnp.einsum(
        "phij,phjd->phid", jax.nn.softmax(sim10, axis=-1).astype(v.dtype), v[:, 0]
    )
    msg = jnp.stack([m0, m1], axis=1).reshape(p2, h, k, dh)
    msg = _linear(_merge_heads(msg), params, f"{prefix}.to_out", dtype)
    return _ffn(x, msg, params, f"{prefix}.ffn", dtype)


def _log_assignment(x0, x1, mask0, mask1, params, prefix):
    """Dual-softmax + matchability log-assignment (f32)."""
    d0 = _linear(x0, params, f"{prefix}.final_proj", jnp.float32)
    d1 = _linear(x1, params, f"{prefix}.final_proj", jnp.float32)
    s = float(DIM) ** 0.25
    sim = jnp.einsum(
        "bmd,bnd->bmn", d0 / s, d1 / s, preferred_element_type=jnp.float32
    )
    sim = jnp.where(mask0[:, :, None] & mask1[:, None, :], sim, NEG)
    z0 = _linear(x0, params, f"{prefix}.matchability", jnp.float32)[..., 0]
    z1 = _linear(x1, params, f"{prefix}.matchability", jnp.float32)[..., 0]
    certainties = (
        jax.nn.log_sigmoid(z0)[:, :, None] + jax.nn.log_sigmoid(z1)[:, None, :]
    )
    scores0 = jax.nn.log_softmax(sim, axis=2)
    scores1 = jax.nn.log_softmax(sim, axis=1)
    return scores0 + scores1 + certainties  # (B, M, N) log P(match)


def lightglue_forward(
    params: Params,
    kpts0: jnp.ndarray,
    desc0: jnp.ndarray,
    kpts1: jnp.ndarray,
    desc1: jnp.ndarray,
    mask0: jnp.ndarray,
    mask1: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    fused: bool | None = None,
) -> jnp.ndarray:
    """Run the full matcher; returns the (B, M, N) log-assignment matrix.

    kpts already normalized to ~[-1, 1]; desc L2-normalized rows; masks mark
    real (non-padding) keypoints. ``fused=None`` consults the Pallas env
    gate; pass ``fused=False`` to force the XLA layers (required under
    differentiation — the fused kernels have no JVP rule).

    Implementation: both sides of every pair problem are stacked on the batch
    axis so each self-attention layer is ONE (2B, K, D) call instead of two —
    on TPU the transformer's GEMMs are latency-bound at SLAM sizes (K~600,
    D=256), so halving the op count matters more than the FLOPs.
    """
    b = desc0.shape[0]
    m_len, n_len = desc0.shape[1], desc1.shape[1]
    use_fused = _pallas_layer_wanted() if fused is None else fused
    K = max(m_len, n_len)
    if use_fused:
        # Tokens ride sublanes (pad to 8) AND the (K, K) logits' lane dim
        # must be at least one full 128-tile: the remote Mosaic compiler
        # HANGS (not errors) on sub-128 lane dims (measured at K=96).
        K = max(-(-K // 8) * 8, 128)

    def pad_to(a, k):
        if a.shape[1] == k:
            return a
        widths = [(0, 0), (0, k - a.shape[1])] + [(0, 0)] * (a.ndim - 2)
        return jnp.pad(a, widths)

    kpts0p, desc0p, mask0p = pad_to(kpts0, K), pad_to(desc0, K), pad_to(mask0, K)
    kpts1p, desc1p, mask1p = pad_to(kpts1, K), pad_to(desc1, K), pad_to(mask1, K)
    # Interleave sides: rows (2p, 2p+1) = (side0, side1) of pair p.
    x = jnp.stack([desc0p, desc1p], axis=1).reshape(2 * b, K, -1)
    kpts = jnp.stack([kpts0p, kpts1p], axis=1).reshape(2 * b, K, 2)
    mask = jnp.stack([mask0p, mask1p], axis=1).reshape(2 * b, K)

    x = _linear(x, params, "input_proj", compute_dtype)

    if use_fused:
        x = _forward_pallas_layers(
            params, x, kpts, mask, compute_dtype,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        enc = _rotary_encoding(kpts, params, compute_dtype)
        for i in range(NUM_LAYERS):
            p = f"transformers.{i}"
            x = _self_block(x, enc, mask, params, f"{p}.self_attn", compute_dtype)
            x = _cross_block_paired(
                x, mask, params, f"{p}.cross_attn", compute_dtype
            )

    x0 = x[0::2, :m_len]
    x1 = x[1::2, :n_len]
    # Early-exit disabled: only the final layer's assignment head is used
    # (matches the export contract, convert_lightglue_to_onnx.py:73-74).
    return _log_assignment(
        x0, x1, mask0, mask1, params, f"log_assignment.{NUM_LAYERS - 1}"
    )


def extract_matches(
    log_assignment: jnp.ndarray,
    mask0: jnp.ndarray,
    mask1: jnp.ndarray,
    threshold: float = 0.1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mutual-argmax match extraction with score threshold, fully on device.

    Returns matches0 (B, M) int32 (index into set1, -1 if unmatched) and
    mscores0 (B, M) f32 — the exact output contract of the reference engine
    (src/LightGlue.cc:326-363).
    """
    p = log_assignment  # (B, M, N)
    m0 = jnp.argmax(p, axis=2).astype(jnp.int32)  # (B, M) minor-dim argmax
    max0 = jnp.max(p, axis=2)
    # Mutual check without the (slow on TPU) sublane-axis argmax: row i is
    # mutual iff it is the FIRST row achieving the column max of its chosen
    # column. The column winner is an int min-reduce over rows that reach
    # the column max — tie-safe (two tied rows cannot both claim a column)
    # and identical to the reference's exact mutual argmax
    # (src/LightGlue.cc:326-363, first-occurrence semantics).
    m_len = p.shape[1]
    max1 = jnp.max(p, axis=1)  # (B, N) reduce, not argmax
    rows = jnp.arange(m_len, dtype=jnp.int32)
    winner1 = jnp.min(
        jnp.where(p >= max1[:, None, :], rows[None, :, None], m_len), axis=1
    )  # (B, N) first row index achieving each column's max
    mutual = jnp.take_along_axis(winner1, m0, axis=1) == rows[None, :]
    scores = jnp.exp(max0)
    valid = mutual & (scores > threshold) & mask0
    valid = valid & jnp.take_along_axis(mask1, m0, axis=1)
    matches0 = jnp.where(valid, m0, -1)
    mscores0 = jnp.where(valid, scores, 0.0)
    return matches0, mscores0


@functools.partial(jax.jit, static_argnames=("threshold",))
def lightglue_match(
    params: Params,
    kpts0: jnp.ndarray,
    desc0: jnp.ndarray,
    kpts1: jnp.ndarray,
    desc1: jnp.ndarray,
    mask0: jnp.ndarray,
    mask1: jnp.ndarray,
    threshold: float = 0.1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One jitted program: transformer + assignment + match extraction."""
    la = lightglue_forward(params, kpts0, desc0, kpts1, desc1, mask0, mask1)
    return extract_matches(la, mask0, mask1, threshold)


def normalize_keypoints(
    kpts: jnp.ndarray, width: float, height: float
) -> jnp.ndarray:
    """(kpt - size/2) / (max(w,h)/2) — the wrapper-side normalization
    contract (src/LightGlue.cc:163-172)."""
    scale = max(width, height) / 2.0
    center = jnp.array([width / 2.0, height / 2.0], dtype=jnp.float32)
    return (kpts - center) / scale


# -- parameter init -----------------------------------------------------------


def init_lightglue_params(
    seed: int = 0, dtype=jnp.float32, passthrough: bool = False
) -> Params:
    """Random init (torch-name-compatible layout) for tests/benches.

    With ``passthrough``, the message projections (out_proj/to_out) and the
    FFN output layers are zeroed so every transformer layer reduces to the
    residual identity: compute is IDENTICAL (same matmuls over the same
    shapes — zeros multiply like any weight), but descriptors survive the 9
    layers, so the dual-softmax assignment recovers true correspondences.
    Fully random layers decorrelate the features and yield ~0 matches,
    which would let a benchmark's host-side estimator coast on constant
    velocity instead of doing real tracking work."""
    rng = np.random.default_rng(seed)
    params: Params = {}

    def lin(name, fin, fout, bias=True, std=None):
        std = std if std is not None else float(np.sqrt(1.0 / fin))
        params[f"{name}.weight"] = jnp.asarray(
            rng.standard_normal((fin, fout)) * std, dtype
        )
        if bias:
            params[f"{name}.bias"] = jnp.zeros((fout,), dtype)

    lin("input_proj", DIM, DIM)
    lin("posenc.Wr", 2, HEAD_DIM // 2, bias=False, std=1.0)
    for i in range(NUM_LAYERS):
        s = f"transformers.{i}.self_attn"
        lin(f"{s}.Wqkv", DIM, 3 * DIM)
        lin(f"{s}.out_proj", DIM, DIM)
        lin(f"{s}.ffn.0", 2 * DIM, 2 * DIM)
        params[f"{s}.ffn.1.weight"] = jnp.ones((2 * DIM,), dtype)
        params[f"{s}.ffn.1.bias"] = jnp.zeros((2 * DIM,), dtype)
        lin(f"{s}.ffn.3", 2 * DIM, DIM)
        c = f"transformers.{i}.cross_attn"
        lin(f"{c}.to_qk", DIM, DIM)
        lin(f"{c}.to_v", DIM, DIM)
        lin(f"{c}.to_out", DIM, DIM)
        lin(f"{c}.ffn.0", 2 * DIM, 2 * DIM)
        params[f"{c}.ffn.1.weight"] = jnp.ones((2 * DIM,), dtype)
        params[f"{c}.ffn.1.bias"] = jnp.zeros((2 * DIM,), dtype)
        lin(f"{c}.ffn.3", 2 * DIM, DIM)
    for i in range(NUM_LAYERS):
        a = f"log_assignment.{i}"
        lin(f"{a}.final_proj", DIM, DIM)
        lin(f"{a}.matchability", DIM, 1)
    if passthrough:
        zero = {"out_proj", "to_out", "ffn.3"}
        for k in list(params):
            if any(k.endswith(f"{z}.weight") for z in zero):
                params[k] = jnp.zeros_like(params[k])
            elif k.endswith("final_proj.weight"):
                # Boost the assignment logit scale: with ~unit features the
                # default 1/sqrt(D) init gives sim ~ 1/16, which a softmax
                # over hundreds of candidates cannot concentrate (trained
                # checkpoints produce large-magnitude projections). Random
                # SuperPoint descriptors are also heavily correlated
                # (background cos ~0.9), so the boost must push the small
                # true-pair margin well past the softmax noise floor.
                params[k] = params[k] * 160.0
    return params
