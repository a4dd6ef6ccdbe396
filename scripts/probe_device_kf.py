#!/usr/bin/env python
"""Compile-and-time probe for the zero-lag keyframe program on the CURRENT
backend at production (KITTI bench) shapes.

Run this FIRST after a relay recovery, before bench.py: the kf program
(ops.frontend_step.fused_stereo_track_kf_step_multi) moves the LightGlue
keyframe forward inside a lax.scan at pair-batch 1, which the fused Pallas
kernels had never executed on hardware when it was written — a Mosaic
failure here falls back gracefully in the tracker, but entry()'s driver
compile check and the bench's device-only line would still suffer. The
probe compiles once (bounded by your shell timeout), runs a few steps, and
prints per-frame device time by scan differencing.

Usage:  timeout 900 python scripts/probe_device_kf.py [--width 1241 ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1241)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--max-keypoints", type=int, default=600)
    ap.add_argument("--batch", type=int, default=1, help="frames per dispatch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    from superslam_tpu.core.keyframe_gate import (
        MIN_FRAMES_DEFAULT,
        MIN_MATCHES_DEFAULT,
    )
    from superslam_tpu.frontend.extractor import pad_to_multiple
    from superslam_tpu.models.lightglue import init_lightglue_params
    from superslam_tpu.models.superpoint import init_superpoint_params
    from superslam_tpu.ops.frontend_step import (
        fused_stereo_track_kf_step_multi,
        fused_stereo_track_step_multi,
    )
    from superslam_tpu.ops.pallas.lightglue_layer import (
        augment_fused_layer_params,
    )

    W, H, K, S = args.width, args.height, args.max_keypoints, args.batch
    pw, ph = pad_to_multiple(W), pad_to_multiple(H)
    sp = init_superpoint_params(0)
    lg = augment_fused_layer_params(init_lightglue_params(0, passthrough=True))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (2 * S, ph, pw), dtype=np.uint8))
    kf0 = (
        jnp.zeros((K, 2), jnp.float32),
        jnp.zeros((K, 256), jnp.float32),
        jnp.zeros((K,), bool),
        jnp.zeros((K, 3), jnp.float32),
        jnp.zeros((K,), bool),
        jnp.zeros((), jnp.int32),
    )
    eye, zero = jnp.eye(3, dtype=jnp.float32), jnp.zeros((3,), jnp.float32)
    common = dict(
        max_keypoints=K, keypoint_threshold=0.0005, remove_borders=4,
        nms_radius=4, true_width=W, true_height=H, min_disparity=1.0,
        match_threshold=0.1,
        calib=(718.856, 718.856, 607.1928, 185.2157, 386.1448 / 718.856),
        min_matches=10, track_sigma_px=10.0, disp_sigma0=8.0,
        disp_cond=386.1448 / 40.0, accept_frac=0.4, support_px=4.0,
        kf_min_frames=MIN_FRAMES_DEFAULT, kf_max_frames=20,
        kf_min_matches=MIN_MATCHES_DEFAULT, covis_ratio=0.3,
    )

    trk_common = {
        k: v for k, v in common.items()
        if k not in (
            "accept_frac", "support_px", "kf_min_frames", "kf_max_frames",
            "kf_min_matches", "covis_ratio",
        )
    }

    def step_nokf(im, kf, carry):
        packed, _d, _k, _v, _t, carry = fused_stereo_track_step_multi(
            sp, lg, im, kf0[0], kf0[1], kf0[2], kf0[3], kf0[4],
            *carry, **trk_common
        )
        return packed, kf, carry

    def step_kf(hybrid):
        def f(im, kf, carry):
            packed, _d, _k, _v, _t, kf, carry = (
                fused_stereo_track_kf_step_multi(
                    sp, lg, im, kf, carry, hybrid=hybrid, **common
                )
            )
            return packed, kf, carry
        return f

    legs = [
        ("hybrid", step_kf(True)),
        ("rematch-always (r3)", step_kf(False)),
        ("nokf track (r2 dispatch-frozen)", step_nokf),
    ]
    for tag, step in legs:
        t0 = time.perf_counter()
        out = step(imgs, kf0, (eye, zero, eye, zero))
        np.asarray(out[0])
        print(f"[{tag}] single dispatch compile+run: "
              f"{time.perf_counter() - t0:.1f} s (packed {out[0].shape})")

        def prog(iters, step=step):
            @jax.jit
            def run(images):
                def body(c, _):
                    im, kf, carry = c
                    packed, kf, carry = step(im, kf, carry)
                    nxt = (
                        jnp.roll(im, 1, axis=2) + packed[0, 0].astype(jnp.uint8)
                    ).astype(jnp.uint8)
                    return (nxt, kf, carry), packed[0, 1]
                _, outs = lax.scan(
                    body, (images, kf0, (eye, zero, eye, zero)), None,
                    length=iters,
                )
                return outs.reshape(iters, 1)
            return run

        lo, hi = 3, 12
        run_lo, run_hi = prog(lo), prog(hi)
        np.asarray(run_lo(imgs)); np.asarray(run_hi(imgs))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(run_lo(imgs))
            tlo = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(run_hi(imgs))
            thi = time.perf_counter() - t0
            samples.append((thi - tlo) / (hi - lo) * 1e3 / S)
        print(f"[{tag}] device-only per frame: {min(samples):.2f} ms "
              f"(samples {[round(s, 2) for s in samples]})")


if __name__ == "__main__":
    main()
