#!/usr/bin/env python
"""Stage-level device-time decomposition of the SuperPoint/LightGlue frame
program on the real chip.

Per CLAUDE.md, per-dispatch timings through the relay are NOT device time:
every stage is timed as the difference of two lax.scan iteration counts with
carry-fed input variation, which cancels all fixed relay costs. Run on the
real TPU (no env overrides); each stage prints device-ms per iteration.

Usage: python scripts/profile_stages.py [stage ...]
  (default: all stages)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

WIDTH, HEIGHT = 1241, 376
PW, PH = 1248, 384  # padded to the frontends' quantum (H % 32, W % 8)
MAX_KP = 600


def timed_scan(f, x, lo=4, hi=16, reps=3):
    """Device ms/iter for y = f(x): scan with a scalar carry perturbing the
    input each iteration (so iterations can't be cached or overlapped),
    differenced over two iteration counts."""

    def make(iters):
        @jax.jit
        def run(x):
            def body(s, _):
                y = f(jax.tree.map(lambda t: t + s.astype(t.dtype), x))
                leaves = [
                    jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(y)
                ]
                out = sum(leaves)
                return (out * 1e-9) % 1.0, out

            _, outs = lax.scan(body, jnp.float32(0.0), None, length=iters)
            return outs

        return run

    run_lo, run_hi = make(lo), make(hi)
    np.asarray(run_lo(x))
    np.asarray(run_hi(x))
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run_lo(x))
        tlo = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run_hi(x))
        thi = time.perf_counter() - t0
        samples.append((thi - tlo) / (hi - lo) * 1e3)
    return min(samples)


def main() -> None:
    from superslam_tpu.models.superpoint import (
        init_superpoint_params,
        select_keypoints,
        superpoint_dense,
    )
    from superslam_tpu.models.lightglue import init_lightglue_params, lightglue_forward
    from superslam_tpu.slam import _enable_compilation_cache

    _enable_compilation_cache()
    want = set(sys.argv[1:])

    def on(name):
        return not want or name in want

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (2, PH, PW)).astype(np.float32))
    sp = init_superpoint_params(0)
    lg = init_lightglue_params(0)

    results = {}

    if on("dense_pallas"):
        results["dense_pallas"] = timed_scan(
            lambda x: superpoint_dense(sp, x, use_pallas_convs=True), img
        )
    if on("dense_xla"):
        results["dense_xla"] = timed_scan(
            lambda x: superpoint_dense(sp, x, use_pallas_convs=False), img
        )

    # Individual encoder stages (pallas canvas path)
    from superslam_tpu.ops.pallas.conv import (
        conv1a1b_chw,
        conv3x3_chw,
        pool2_canvas,
        to_canvas,
    )

    canvas = to_canvas(img, PW)  # W already %128? 1248 = 9.75*128 -> pad
    wp = -(-PW // 128) * 128
    canvas = jnp.pad(canvas, ((0, 0), (0, 0), (0, 0), (0, wp - PW)))

    if on("conv1a1b"):
        results["conv1a1b"] = timed_scan(
            lambda x: conv1a1b_chw(
                x, sp["conv1a.weight"], sp["conv1a.bias"],
                sp["conv1b.weight"], sp["conv1b.bias"], w_img=PW,
            ),
            canvas,
        )

    wp_half = -(-(PW // 2) // 128) * 128
    half = jnp.zeros((2, 64, PH // 2 + 16, wp_half), jnp.bfloat16)
    if on("conv2"):
        results["conv2a"] = timed_scan(
            lambda x: conv3x3_chw(
                x, sp["conv2a.weight"], sp["conv2a.bias"], w_img=PW // 2
            ),
            half,
        )
    if on("conv_pair"):
        from superslam_tpu.ops.pallas.conv import conv_pair_chw

        results["conv_pair(2a+2b)"] = timed_scan(
            lambda x: conv_pair_chw(
                x, sp["conv2a.weight"], sp["conv2a.bias"],
                sp["conv2b.weight"], sp["conv2b.bias"], w_img=PW // 2,
            ),
            half,
        )
    if on("conv_pair_pool"):
        from superslam_tpu.ops.pallas.conv import conv_pair_chw

        results["conv_pair_pool"] = timed_scan(
            lambda x: conv_pair_chw(
                x, sp["conv2a.weight"], sp["conv2a.bias"],
                sp["conv2b.weight"], sp["conv2b.bias"], w_img=PW // 2,
                pool_vert=True,
            ),
            half,
        )
    if on("conv1a1b_pool"):
        results["conv1a1b_pool"] = timed_scan(
            lambda x: conv1a1b_chw(
                x, sp["conv1a.weight"], sp["conv1a.bias"],
                sp["conv1b.weight"], sp["conv1b.bias"], w_img=PW,
                pool_vert=True,
            ),
            canvas,
        )
    if on("pools"):
        full = jnp.zeros((2, 64, PH + 16, wp), jnp.bfloat16)
        results["pool2_full+half"] = timed_scan(
            lambda x: pool2_canvas(pool2_canvas(x)), full
        )

    # XLA tail from quarter-res NHWC
    quarter = jnp.zeros((2, PH // 4, PW // 4, 64), jnp.bfloat16)

    def xla_tail(x):
        from superslam_tpu.models.superpoint import _conv, _pool2

        relu = jax.nn.relu
        dt = jnp.bfloat16
        x = relu(_conv(x, sp, "conv3a", dt))
        x = relu(_conv(x, sp, "conv3b", dt))
        x = _pool2(x)
        x = relu(_conv(x, sp, "conv4a", dt))
        x = relu(_conv(x, sp, "conv4b", dt))
        cPa = relu(_conv(x, sp, "convPa", dt))
        logits = _conv(cPa, sp, "convPb", dt).astype(jnp.float32)
        cDa = relu(_conv(x, sp, "convDa", dt))
        desc = _conv(cDa, sp, "convDb", dt)
        return logits, desc

    if on("xla_tail"):
        results["xla_tail(conv3..heads)"] = timed_scan(xla_tail, quarter)

    def conv3_only(x):
        from superslam_tpu.models.superpoint import _conv

        relu = jax.nn.relu
        x = relu(_conv(x, sp, "conv3a", jnp.bfloat16))
        return relu(_conv(x, sp, "conv3b", jnp.bfloat16))

    if on("conv3"):
        results["conv3a+b_xla"] = timed_scan(conv3_only, quarter)

    # Score post-processing: softmax + d2s + NMS
    logits = jnp.asarray(
        rng.standard_normal((2, PH // 8, PW // 8, 65)).astype(np.float32)
    )

    def score_post(lg_):
        scores = jax.nn.softmax(lg_, axis=-1)[..., :-1]
        b, h, w, _ = scores.shape
        scores = scores.reshape(b, h, w, 8, 8)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)
        k = 9
        pooled = lax.reduce_window(
            scores, -jnp.inf, lax.max, (1, 1, k), (1, 1, 1), "SAME"
        )
        pooled = lax.reduce_window(
            pooled, -jnp.inf, lax.max, (1, k, 1), (1, 1, 1), "SAME"
        )
        return jnp.where(scores == pooled, scores, 0.0)

    if on("score_post"):
        results["score_post(softmax+nms)"] = timed_scan(score_post, logits)

    # Selection
    scores = jnp.abs(jnp.asarray(
        rng.standard_normal((2, PH, PW)).astype(np.float32)
    ))
    grid = jnp.asarray(
        rng.standard_normal((2, PH // 8, PW // 8, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)

    if on("select"):
        results["select_keypoints"] = timed_scan(
            lambda s: select_keypoints(
                s, grid, MAX_KP, true_width=WIDTH, true_height=HEIGHT
            ),
            scores,
        )

    # LightGlue 2 pairs
    kpts = jnp.asarray(rng.uniform(0, 300, (4, MAX_KP, 2)).astype(np.float32))
    desc = jnp.asarray(rng.standard_normal((4, MAX_KP, 256)).astype(np.float32))
    valid = jnp.ones((4, MAX_KP), bool)

    def lg_fn(d):
        return lightglue_forward(
            lg, kpts[0::2], d[0::2], kpts[1::2], d[1::2], valid[0::2], valid[1::2]
        )

    if on("lightglue"):
        results["lightglue_2pair"] = timed_scan(lg_fn, desc)

    # LightGlue sub-stages at the same shapes (B=4 rows of K=600, D=256).
    # Sub-ms stages need wide iteration spans or relay noise swamps the
    # scan difference.
    small = dict(lo=8, hi=72)
    from superslam_tpu.models import lightglue as lgm

    xtok = jnp.asarray(
        rng.standard_normal((4, MAX_KP, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    vmask = jnp.ones((4, MAX_KP), bool)
    enc = lgm._rotary_encoding(
        jnp.asarray(rng.uniform(-1, 1, (4, MAX_KP, 2)).astype(np.float32)),
        lg, jnp.bfloat16,
    )

    if on("lg_self"):
        results["lg_self_block"] = timed_scan(
            lambda t: lgm._self_block(
                t, enc, vmask, lg, "transformers.0.self_attn", jnp.bfloat16
            ),
            xtok, **small,
        )
    if on("lg_cross"):
        results["lg_cross_block"] = timed_scan(
            lambda t: lgm._cross_block_paired(
                t, vmask, lg, "transformers.0.cross_attn", jnp.bfloat16
            ),
            xtok, **small,
        )
    if on("lg_attn"):
        qkv4 = jnp.asarray(
            rng.standard_normal((4, 4, MAX_KP, 64)).astype(np.float32)
        ).astype(jnp.bfloat16)
        results["lg_attention"] = timed_scan(
            lambda q: lgm._attention(q, qkv4, qkv4, vmask), qkv4, **small
        )
    if on("lg_ffn"):
        results["lg_ffn"] = timed_scan(
            lambda t: lgm._ffn(t, t, lg, "transformers.0.self_attn.ffn", jnp.bfloat16),
            xtok, **small,
        )
    if on("lg_assign"):
        results["lg_log_assignment"] = timed_scan(
            lambda t: lgm._log_assignment(
                t[0::2], t[1::2], vmask[0::2], vmask[1::2], lg, "log_assignment.8"
            ),
            xtok, **small,
        )

    print()
    for k, v in results.items():
        print(f"{k:32s} {v:7.3f} ms")


if __name__ == "__main__":
    main()
