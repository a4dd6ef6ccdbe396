"""Pallas fused masked-SDPA kernel vs the plain-XLA attention path.

Runs in interpreter mode on CPU (the same kernel compiles and matches on
the real TPU; see the fused-pipeline benches). The kernel keeps LightGlue's
(B, H, K, K) logits in VMEM — the XLA path's three HBM round trips per
layer are the matcher's dominant cost at SLAM sizes."""

import numpy as np

import jax.numpy as jnp

from superslam_tpu.models import lightglue as lg
from superslam_tpu.ops.pallas.attention import masked_attention


def _xla_attention(q, k, v, key_mask):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = (
        jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    logits = jnp.where(key_mask[:, None, None, :], logits, -1e9)
    attn = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)


def test_masked_attention_matches_xla():
    rng = np.random.default_rng(0)
    b, h, n, dh = 2, 4, 72, 64  # n deliberately NOT a multiple of 128
    q = rng.standard_normal((b, h, n, dh)).astype(np.float32)
    k = rng.standard_normal((b, h, n, dh)).astype(np.float32)
    v = rng.standard_normal((b, h, n, dh)).astype(np.float32)
    mask = rng.uniform(size=(b, n)) > 0.3
    mask[:, 0] = True  # keep at least one key per row

    out = np.asarray(
        masked_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
            interpret=True,
        )
    )
    ref = np.asarray(_xla_attention(q, k, v, jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, atol=2e-5)
    # Masked keys must contribute nothing: perturbing them is a no-op.
    v2 = v + 100.0 * ~mask[:, None, :, None]
    out2 = np.asarray(
        masked_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v2), jnp.asarray(mask),
            interpret=True,
        )
    )
    np.testing.assert_allclose(out2, out, atol=2e-5)


def test_masked_attention_bf16():
    rng = np.random.default_rng(1)
    b, h, n, dh = 1, 2, 40, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.bfloat16)
    mask = jnp.asarray(rng.uniform(size=(b, n)) > 0.2)
    out = masked_attention(q, k, v, mask, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _xla_attention(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_masked_attention_gradients_match_xla():
    """The custom VJP (XLA-rematerialized backward) must match autodiff
    through the plain XLA attention — without it, jax.grad through the
    Pallas route fails entirely and the TPU fine-tuning step crashes."""
    import jax

    from superslam_tpu.ops.pallas import attention as pattn

    rng = np.random.default_rng(3)
    b, h, n, dh = 1, 2, 24, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, n)) > 0.25)
    w = jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(masked_attention(q, k, v, mask, interpret=True) * w)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, mask) * w)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_lightglue_forward_pallas_route_matches_xla(monkeypatch):
    """The full matcher with the Pallas route forced on (interpret mode via
    monkeypatched masked_attention) must reproduce the XLA route's
    assignment scores — pins the pair-swap wiring in _cross_block_paired."""
    import superslam_tpu.ops.pallas.attention as pattn

    params = lg.init_lightglue_params(0)
    rng = np.random.default_rng(2)
    m, n = 24, 18
    kpts0 = jnp.asarray(rng.uniform(-1, 1, (1, m, 2)), jnp.float32)
    kpts1 = jnp.asarray(rng.uniform(-1, 1, (1, n, 2)), jnp.float32)
    d0 = rng.standard_normal((1, m, 256)).astype(np.float32)
    d1 = rng.standard_normal((1, n, 256)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    mask0 = jnp.asarray(np.arange(m)[None] < m - 2)
    mask1 = jnp.asarray(np.arange(n)[None] < n - 1)

    args = (params, kpts0, jnp.asarray(d0), kpts1, jnp.asarray(d1), mask0, mask1)
    monkeypatch.setenv("SUPERSLAM_PALLAS_ATTN", "0")
    ref = np.asarray(lg.lightglue_forward(*args, compute_dtype=jnp.float32))

    monkeypatch.setenv("SUPERSLAM_PALLAS_ATTN", "1")
    orig = pattn.masked_attention
    monkeypatch.setattr(
        pattn,
        "masked_attention",
        lambda q, k, v, km, interpret=False: orig(q, k, v, km, interpret=True),
    )
    out = np.asarray(lg.lightglue_forward(*args, compute_dtype=jnp.float32))
    valid = np.asarray(mask0)[0][:, None] & np.asarray(mask1)[0][None, :]
    np.testing.assert_allclose(out[0][valid], ref[0][valid], atol=1e-3)
