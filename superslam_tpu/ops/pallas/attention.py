"""Fused masked attention for LightGlue as a Pallas TPU kernel.

At SLAM sizes (K≈600 keypoints, 4 heads of 64) the transformer's attention
is HBM-bandwidth-bound, not FLOP-bound: the XLA path materializes the
(B, H, K, K) f32 logits to HBM three times per layer (QK^T out, softmax
out, AV in) — ~165 MB of traffic per self-attention layer at the bench
shapes, ~0.2 ms each, ~2-3 ms of the 3.9 ms frame program across the 9
LightGlue layers (the reference instead runs the matcher as a TensorRT
engine, ``src/LightGlue.cc:174-227``; this is the TPU answer to the same
"keep the matmul pipeline on-chip" requirement).

This kernel computes one (query-row-block × full-K) attention per grid
step entirely in VMEM: logits, masked softmax and the value contraction
never touch HBM. The full K×K f32 logits block is only ~1.6 MB — no flash
decomposition needed; one grid step per (batch row, head).

Mosaic constraints honored (measured on this v5e, see CLAUDE.md):
- N is padded to a 128 multiple OUTSIDE the kernel (XLA-side pad), so all
  kernel blocks are tile-aligned for both f32 and bf16 operands.
- The key mask enters as an additive f32 bias row (0 / -1e9), broadcast
  over query sublanes — no lane-dim boolean ops.
- Matmuls contract over the last dim of both operands (q @ k^T and
  attn @ v as dot_general), which Mosaic lowers directly to the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..precision import default_matmul_precision
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _sdpa_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)  # (N, Dh)
    k = k_ref[0, 0].astype(jnp.float32)
    logits = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # (N, N)
    logits = logits + bias_ref[0]  # (1, N) bias broadcast over query rows
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    attn = e / s
    v = v_ref[0, 0]
    out = jax.lax.dot_general(
        attn.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
@default_matmul_precision
def masked_attention(
    q: jnp.ndarray,  # (B, H, N, Dh)
    k: jnp.ndarray,  # (B, H, N, Dh)
    v: jnp.ndarray,  # (B, H, N, Dh)
    key_mask: jnp.ndarray,  # (B, N) bool — True = real key
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for the XLA masked SDPA in models.lightglue
    (same masking semantics: softmax over keys with invalid keys at -1e9).
    Returns (B, H, N, Dh) in v.dtype.

    Differentiable: pallas_call has no reverse-mode rule, so the float core
    (_sdpa) carries a custom VJP that recomputes the attention weights in
    plain XLA for the backward pass (flash-style rematerialization — the
    K x K probabilities are never saved as residuals). This keeps the
    LightGlue fine-tuning step (parallel.training) working on TPU where
    this kernel is the default forward route."""
    bias = jnp.where(key_mask, 0.0, NEG).astype(jnp.float32)  # (B, N)
    return _sdpa(q, k, v, bias, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sdpa(q, k, v, bias, interpret=False):
    return _sdpa_fwd_pallas(q, k, v, bias, interpret)


def _sdpa_fwd(q, k, v, bias, interpret):
    return _sdpa_fwd_pallas(q, k, v, bias, interpret), (q, k, v, bias)


def _sdpa_bwd(interpret, res, g):
    """XLA-math SDPA gradients (probabilities rematerialized in f32)."""
    q, k, v, bias = res
    dh = q.shape[-1]
    scale = 1.0 / float(dh) ** 0.5
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    logits = jnp.einsum("bhid,bhjd->bhij", qf, kf) * scale + bias[:, None, None, :]
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("bhij,bhid->bhjd", p, gf)
    dp = jnp.einsum("bhid,bhjd->bhij", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhij,bhjd->bhid", ds, kf) * scale
    dk = jnp.einsum("bhij,bhid->bhjd", ds, qf) * scale
    dbias = jnp.sum(ds, axis=(1, 2))  # (B, N); upstream where() zeroes it
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        dbias.astype(bias.dtype),
    )


_sdpa.defvjp(_sdpa_fwd, _sdpa_bwd)


def _sdpa_fwd_pallas(q, k, v, bias, interpret):
    b, h, n, dh = q.shape
    scale = 1.0 / float(dh) ** 0.5
    n_pad = _round_up(n, 128)
    if n_pad != n:
        pad = [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        bias = jnp.pad(bias, [(0, 0), (0, n_pad - n)], constant_values=NEG)
    # (B, 1, n_pad): the singleton row keeps the block's second-minor dim
    # equal to the array dim (Mosaic's tiling rule for sub-8 blocks).
    bias = bias[:, None, :]

    out = pl.pallas_call(
        functools.partial(_sdpa_kernel, scale=scale),
        grid=(b, h),
        in_specs=[
            pl.BlockSpec(
                (1, 1, n_pad, dh), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, n_pad, dh), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, n_pad, dh), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, n_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n_pad, dh), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, dh), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_pad * n_pad * dh,
            bytes_accessed=4 * b * h * n_pad * dh * q.dtype.itemsize,
            transcendentals=b * h * n_pad * n_pad,
        ),
        interpret=interpret,
    )(q, k, v, bias)
    return out[:, :, :n, :]
