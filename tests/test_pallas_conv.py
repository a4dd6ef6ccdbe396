"""Pallas CHW conv kernels (interpret mode) pinned to the XLA conv oracle,
and the Pallas SuperPoint encoder path pinned to the default path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from superslam_tpu.models.superpoint import init_superpoint_params, superpoint_dense
from superslam_tpu.ops.pallas.conv import (
    PAD_ROWS,
    conv3x3_chw,
    pool2_canvas,
    to_canvas,
)

rng = np.random.default_rng(0)


def _ref_conv(x_nhwc, w, b, relu=True):
    y = (
        jax.lax.conv_general_dilated(
            x_nhwc.astype(jnp.float32),
            w.astype(jnp.float32),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b
    )
    return jnp.maximum(y, 0) if relu else y


@pytest.mark.parametrize(
    "B,C,H,W,CO,wimg",
    [(2, 64, 16, 256, 64, 250), (1, 1, 8, 128, 64, 120), (2, 64, 16, 256, 128, 256)],
)
def test_conv3x3_matches_xla(B, C, H, W, CO, wimg):
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    x[:, :, wimg:, :] = 0.0
    w = (rng.normal(size=(3, 3, C, CO)) * 0.1).astype(np.float32)
    b = (rng.normal(size=(CO,)) * 0.1).astype(np.float32)
    ref = np.asarray(_ref_conv(jnp.asarray(x[:, :, :wimg]), jnp.asarray(w), jnp.asarray(b)))

    xc = np.zeros((B, C, H + 2 * PAD_ROWS, W), np.float32)
    xc[:, :, PAD_ROWS : PAD_ROWS + H, :wimg] = x.transpose(0, 3, 1, 2)[:, :, :, :wimg]
    out = np.asarray(
        conv3x3_chw(
            jnp.asarray(xc), jnp.asarray(w), jnp.asarray(b),
            relu=True, w_img=wimg, interpret=True,
        )
    )
    # canvas invariant: pad region exactly zero
    assert np.all(out[:, :, :PAD_ROWS] == 0)
    assert np.all(out[:, :, PAD_ROWS + H :] == 0)
    assert np.all(out[:, :, :, wimg:] == 0)
    got = out[:, :, PAD_ROWS : PAD_ROWS + H, :wimg].transpose(0, 2, 3, 1)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.02, err


def test_conv_pair_matches_two_convs():
    """Fused conv_a+conv_b kernel vs two XLA SAME convs on a canvas."""
    from superslam_tpu.ops.pallas.conv import conv_pair_chw

    B, C, H, W, wimg = 2, 64, 16, 256, 250
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    x[:, :, wimg:, :] = 0.0
    wa = (rng.normal(size=(3, 3, C, 64)) * 0.1).astype(np.float32)
    ba = (rng.normal(size=(64,)) * 0.1).astype(np.float32)
    wb = (rng.normal(size=(3, 3, 64, 64)) * 0.1).astype(np.float32)
    bb = (rng.normal(size=(64,)) * 0.1).astype(np.float32)
    ref = _ref_conv(jnp.asarray(x[:, :, :wimg]), jnp.asarray(wa), jnp.asarray(ba))
    ref = np.asarray(_ref_conv(ref, jnp.asarray(wb), jnp.asarray(bb)))

    xc = np.zeros((B, C, H + 2 * PAD_ROWS, W), np.float32)
    xc[:, :, PAD_ROWS : PAD_ROWS + H, :wimg] = x.transpose(0, 3, 1, 2)[:, :, :, :wimg]
    out = np.asarray(
        conv_pair_chw(
            jnp.asarray(xc), jnp.asarray(wa), jnp.asarray(ba),
            jnp.asarray(wb), jnp.asarray(bb), w_img=wimg, interpret=True,
        )
    )
    assert np.all(out[:, :, :PAD_ROWS] == 0)
    assert np.all(out[:, :, PAD_ROWS + H :] == 0)
    assert np.all(out[:, :, :, wimg:] == 0)
    got = out[:, :, PAD_ROWS : PAD_ROWS + H, :wimg].transpose(0, 2, 3, 1)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.02, err


def test_conv_pair_pool_vert_matches_conv_then_pool():
    """pool_vert pair kernel == two XLA convs + vertical 2x max, emitted as
    a standard PAD_ROWS canvas."""
    from superslam_tpu.ops.pallas.conv import conv_pair_chw

    B, C, H, W, wimg = 1, 64, 32, 256, 250
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    x[:, :, wimg:, :] = 0.0
    wa = (rng.normal(size=(3, 3, C, 64)) * 0.1).astype(np.float32)
    ba = (rng.normal(size=(64,)) * 0.1).astype(np.float32)
    wb = (rng.normal(size=(3, 3, 64, 64)) * 0.1).astype(np.float32)
    bb = (rng.normal(size=(64,)) * 0.1).astype(np.float32)
    ref = _ref_conv(jnp.asarray(x[:, :, :wimg]), jnp.asarray(wa), jnp.asarray(ba))
    ref = _ref_conv(ref, jnp.asarray(wb), jnp.asarray(bb))
    ref = np.asarray(
        jax.lax.reduce_window(
            ref, -jnp.inf, jax.lax.max, (1, 2, 1, 1), (1, 2, 1, 1), "VALID"
        )
    )

    xc = np.zeros((B, C, H + 2 * PAD_ROWS, W), np.float32)
    xc[:, :, PAD_ROWS : PAD_ROWS + H, :wimg] = x.transpose(0, 3, 1, 2)[:, :, :, :wimg]
    out = np.asarray(
        conv_pair_chw(
            jnp.asarray(xc), jnp.asarray(wa), jnp.asarray(ba),
            jnp.asarray(wb), jnp.asarray(bb), w_img=wimg, interpret=True,
            pool_vert=True,
        )
    )
    assert out.shape == (B, 64, H // 2 + 2 * PAD_ROWS, W)
    assert np.all(out[:, :, :PAD_ROWS] == 0)
    assert np.all(out[:, :, PAD_ROWS + H // 2 :] == 0)
    assert np.all(out[:, :, :, wimg:] == 0)
    got = out[:, :, PAD_ROWS : PAD_ROWS + H // 2, :wimg].transpose(0, 2, 3, 1)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.02, err


def test_conv_pool_chain_matches_xla():
    B, H, W, wimg = 1, 16, 256, 250
    img = rng.uniform(0, 1, (B, H, W)).astype(np.float32)
    img[:, :, wimg:] = 0
    w1 = (rng.normal(size=(3, 3, 1, 64)) * 0.3).astype(np.float32)
    b1 = (rng.normal(size=(64,)) * 0.1).astype(np.float32)
    w2 = (rng.normal(size=(3, 3, 64, 64)) * 0.1).astype(np.float32)
    b2 = (rng.normal(size=(64,)) * 0.1).astype(np.float32)

    c = to_canvas(jnp.asarray(img), W)
    c = conv3x3_chw(c, jnp.asarray(w1), jnp.asarray(b1), relu=True, w_img=wimg, interpret=True)
    c = pool2_canvas(c)
    c = conv3x3_chw(c, jnp.asarray(w2), jnp.asarray(b2), relu=True, w_img=wimg // 2, interpret=True)
    got = np.asarray(c)[:, :, PAD_ROWS : PAD_ROWS + H // 2, : wimg // 2].transpose(0, 2, 3, 1)

    r = _ref_conv(jnp.asarray(img[:, :, :wimg, None]), jnp.asarray(w1), jnp.asarray(b1))
    r = jax.lax.reduce_window(r, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    r = np.asarray(_ref_conv(r, jnp.asarray(w2), jnp.asarray(b2)))
    err = np.abs(got - r).max() / (np.abs(r).max() + 1e-9)
    assert err < 0.02, err


def test_pallas_nms_matches_reduce_window():
    from superslam_tpu.ops.pallas.nms import nms_suppress

    s = np.abs(rng.normal(size=(2, 32, 200)).astype(np.float32))
    # Sprinkle exact zeros (suppressed cells) like a real NMS'd map input.
    s[s < 0.5] = 0.0
    x = jnp.asarray(s)
    k = 9
    pooled = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k), (1, 1, 1), "SAME"
    )
    pooled = jax.lax.reduce_window(
        pooled, -jnp.inf, jax.lax.max, (1, k, 1), (1, 1, 1), "SAME"
    )
    ref = np.asarray(jnp.where(x == pooled, x, 0.0))
    got = np.asarray(nms_suppress(x, 4, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_superpoint_dense_pallas_path_matches_default():
    """The Pallas encoder path must reproduce the XLA path's dense heads
    (the selection downstream is pinned by the facade equivalence tests)."""
    params = init_superpoint_params(0)
    img = jnp.asarray(rng.uniform(0, 1, (2, 32, 160)).astype(np.float32))
    # f32 on both paths: the comparison isolates the Pallas kernels from
    # bf16 rounding (whose downstream effect the bf16-vs-f32 stability test
    # already bounds at the match level).
    s_ref, d_ref = superpoint_dense(
        params, img, use_pallas_convs=False, compute_dtype=jnp.float32
    )
    s_pal, d_pal = superpoint_dense(
        params, img, use_pallas_convs=True, compute_dtype=jnp.float32
    )
    assert s_pal.shape == s_ref.shape and d_pal.shape == d_ref.shape
    s_ref, s_pal = np.asarray(s_ref), np.asarray(s_pal)
    denom = np.abs(s_ref).max()
    agree = ((s_ref > 0) == (s_pal > 0)).mean()
    assert agree > 0.999, agree
    both = (s_ref > 0) & (s_pal > 0)
    err = np.abs(np.where(both, s_pal - s_ref, 0)).max() / denom
    assert err < 5e-3, err
    cos = np.sum(
        np.asarray(d_ref, np.float32) * np.asarray(d_pal, np.float32), axis=-1
    )
    assert np.quantile(cos, 0.01) > 0.9999, cos.min()
