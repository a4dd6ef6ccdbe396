#!/usr/bin/env python
"""Benchmark: per-frame stereo SLAM tracking rate on KITTI-shaped frames.

Mirrors the reference benchmark binary
(``/root/reference/examples/stereo/benchmark.cc:96-107``): per-frame
latency percentiles over ``track_stereo`` plus sustained fps over wall
clock, on the KITTI 00 camera geometry (1241x376, fx=718.856, bf=386.1448)
with the KITTI00 config's max_keypoints=600 front-end. The reference's
KITTI 00 number on its RTX PRO 1000 / TensorRT FP16 baseline is 79 fps
(BASELINE.md), which is what ``vs_baseline`` is measured against.

Measurement: 15 s of unmeasured sustained tracking settles the host link
past its initial transient, then the value is the whole-run sustained rate
over a further 135 s — long enough to average over several of the link's
fast/slow phases (each lasting tens of seconds, server-side; see the
window diagnostic on stderr). Device time is phase-independent and is
reported separately by differencing two on-device scan lengths.

Frames are rendered (no datasets are bundled in this environment): a
textured-sprite room world (eval/synthetic_sequence.py) scaled by
fx_kitti/fx_train so the apparent feature scale matches the committed
render-trained checkpoints' domain, rendered as a closed-loop 144-frame
circuit at the KITTI 00 camera geometry. The bench runs the REAL trained
model stack (weights/superpoint_render.safetensors +
weights/lightglue_synth.safetensors) at the natural keyframe cadence —
the same stack the accuracy suite scores (ACCURACY.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 79.0  # reference KITTI 00, README.md:23
WIDTH, HEIGHT = 1241, 376
FX, CX, CY, BF = 718.856, 607.1928, 185.2157, 386.1448  # KITTI 00
TRAIN_FX = 320.0  # the committed checkpoints' render-domain focal length
N_WARMUP = 5
N_FRAMES = 144  # one full closed circuit lap; the run cycles seamlessly
REPO = os.path.dirname(os.path.abspath(__file__))


def make_slam():
    from superslam_tpu.core.vo_estimator import VoEstimator
    from superslam_tpu.frontend.fused import FusedStereoPipeline
    from superslam_tpu.frontend.matcher import LightGlueMatcher
    from superslam_tpu.geometry.stereo_camera import StereoCalib
    from superslam_tpu.models.lightglue import init_lightglue_params
    from superslam_tpu.models.superpoint import init_superpoint_params
    from superslam_tpu.models.weights import load_params

    calib = StereoCalib(fx=FX, fy=FX, cx=CX, cy=CY, baseline=BF / FX)
    # The real trained stack — the same committed checkpoints the accuracy
    # suite scores (ACCURACY.json): render-trained SuperPoint + the
    # synthetically-trained LightGlue transformer.
    sp_params = load_params(
        os.path.join(REPO, "weights", "superpoint_render.safetensors"),
        lambda: init_superpoint_params(0),
    )
    lg_params = load_params(
        os.path.join(REPO, "weights", "lightglue_synth.safetensors"),
        lambda: init_lightglue_params(0, passthrough=True),
    )
    max_kp = 600  # KITTI00-02.yaml superpoint.max_keypoints
    pipeline = FusedStereoPipeline(
        sp_params,
        lg_params,
        calib,
        width=WIDTH,
        height=HEIGHT,
        max_keypoints=max_kp,
        keypoint_threshold=0.010,  # trained-checkpoint operating point
    )
    matcher = LightGlueMatcher(
        lg_params, image_width=WIDTH, image_height=HEIGHT, max_keypoints=max_kp
    )
    estimator = VoEstimator(matcher, calib, window_size=10)
    # Natural keyframe cadence at the accuracy stack's covisibility gate
    # (KeyFrame.covis_ratio 0.75, make_synthetic_sequence.py config).
    estimator.set_keyframe_params(covisibility_ratio=0.75, max_frames=20)
    return pipeline, estimator


def synth_sequence(n: int, seed: int = 0):
    """Closed-loop rendered circuit at the KITTI 00 camera geometry.

    The sprite-room world (eval/synthetic_sequence.py — the accuracy
    suite's ground-truth renderer) scaled by FX/TRAIN_FX: apparent feature
    size is fx*size/z, so scaling the room, sprites, and circuit radius by
    the focal-length ratio keeps the rendered statistics inside the
    committed checkpoints' training domain while the camera intrinsics are
    KITTI's. laps=1.0 with n frames closes the loop exactly — cycling
    through the buffer is seamless camera motion, no teleports.

    Rendering ~50 s of host time is paid once per geometry and cached in
    /tmp (keyed by shape/count/seed AND a hash of every render parameter +
    a renderer version tag, so a render-path change can never silently
    benchmark stale frames from a prior build)."""
    import hashlib

    import superslam_tpu.eval.synthetic_sequence as _renderer_mod

    with open(_renderer_mod.__file__, "rb") as f:
        renderer_src_hash = hashlib.sha1(f.read()).hexdigest()

    render_key = hashlib.sha1(
        "|".join(
            str(v)
            for v in (
                renderer_src_hash,  # any renderer edit invalidates the cache
                FX,
                TRAIN_FX,
                CX,
                CY,
                BF,
                8.0,  # half_x/half_z
                2.4,  # height
                420,  # n_sprites
                0.28,
                0.55,  # sprite_half
                4.5,  # radius_x/z
                1.0,  # laps
            )
        ).encode()
    ).hexdigest()[:10]
    cache = (
        f"/tmp/superslam_bench_frames_{WIDTH}x{HEIGHT}_{n}_{seed}_{render_key}.npz"
    )
    if os.path.exists(cache):
        try:
            z = np.load(cache)
            # Materialize each compressed array exactly ONCE: indexing the
            # NpzFile lazily re-decompresses the full (n, H, W) array per
            # access, so the old per-frame z["left"][i] pattern paid 2n full
            # decompressions and pinned 2n distinct 67 MB bases through the
            # returned views (~19 GB RSS, ~10 min) before the bench started.
            left, right = z["left"], z["right"]
            return [(left[i], right[i]) for i in range(n)]
        except Exception:
            pass
    from superslam_tpu.eval.synthetic_sequence import (
        circuit_trajectory,
        make_room_world,
        render_stereo,
    )
    from superslam_tpu.geometry.stereo_camera import StereoCalib

    s = FX / TRAIN_FX
    rng = np.random.default_rng(seed)
    world = make_room_world(
        rng,
        half_x=8.0 * s,
        half_z=8.0 * s,
        height=2.4 * s,
        n_sprites=420,
        sprite_half=(0.28 * s, 0.55 * s),
    )
    calib = StereoCalib(fx=FX, fy=FX, cx=CX, cy=CY, baseline=BF / FX)
    poses = circuit_trajectory(n, radius_x=4.5 * s, radius_z=4.5 * s, laps=1.0)
    rrng = np.random.default_rng(seed + 1)
    frames = []
    for p in poses:
        left, right = render_stereo(world, p, calib, HEIGHT, WIDTH, rrng)
        frames.append(
            (
                np.round(left * 255).astype(np.uint8),
                np.round(right * 255).astype(np.uint8),
            )
        )
    try:
        np.savez_compressed(
            cache,
            left=np.stack([f[0] for f in frames]),
            right=np.stack([f[1] for f in frames]),
        )
    except Exception:
        pass
    return frames


def _device_tracker_flag() -> bool:
    from superslam_tpu.utils.env import device_tracker_wanted

    return device_tracker_wanted()


def main() -> None:
    from superslam_tpu.frontend.pipelined import PipelinedStereoTracker

    # Persist XLA compilations like the facade does — the bench compiles
    # several large programs (fused step, track variant, nested device-only
    # scans) and re-runs often.
    from superslam_tpu.slam import _enable_compilation_cache

    _enable_compilation_cache()

    pipeline, estimator = make_slam()
    tracker = PipelinedStereoTracker(
        pipeline,
        estimator,
        depth=int(os.environ.get("BENCH_DEPTH", "3")),
        batch=int(os.environ.get("BENCH_BATCH", "4")),
        device_tracking=_device_tracker_flag(),
    )
    frames = synth_sequence(N_FRAMES)

    # Warmup: compile the fused program and settle caches. The flush drains
    # the in-flight window so first-use compiles of the auxiliary programs
    # (host re-match on the pre-keyframe frames) also land here. The lap is
    # closed (laps=1.0), so indexing mod N_FRAMES is seamless camera motion.
    for i in range(N_WARMUP):
        l, r = frames[i]
        tracker.track(l, r, 0.1 * i)
    tracker.flush()

    # Methodology (r3): the host tunnel alternates between fast and slow
    # phases lasting tens of seconds, and sustained load itself degrades the
    # link over the first seconds (both server-side: pacing experiments in
    # scripts/profile_pacing.py refuted a client-side cause; device time is
    # constant throughout — see the device-only line). A short measurement
    # therefore samples ONE phase and recorded 20-56 fps for the identical
    # build (round 2). So: (1) a fixed settle phase of sustained tracking,
    # unmeasured, carries the link past the initial burst/transient; (2) the
    # measurement then runs the FULL budget unconditionally — ~10 phase-
    # length windows — and the reported value is the whole-run sustained
    # rate (frames / wall time, tail drain included). Per-window rates are
    # printed as the link-weather diagnostic.
    SETTLE_S, MEASURE_S, WIN_S = 15.0, 135.0, 10.0
    idx = N_WARMUP
    t_end = time.perf_counter() + SETTLE_S
    while time.perf_counter() < t_end:
        l, r = frames[idx % len(frames)]
        tracker.track(l, r, 0.1 * idx)
        idx += 1

    lat = []
    window_fps = []
    bench_start = time.perf_counter()
    t_win = bench_start
    win_n = 0
    while True:
        l, r = frames[idx % len(frames)]
        t0 = time.perf_counter()
        tracker.track(l, r, 0.1 * idx)
        now = time.perf_counter()
        lat.append(now - t0)
        idx += 1
        win_n += 1
        if now - t_win >= WIN_S:
            window_fps.append(win_n / (now - t_win))
            t_win, win_n = now, 0
        if now - bench_start >= MEASURE_S:
            break
    if win_n:
        # Close the partial diagnostic window BEFORE the flush so the tail
        # drain is not charged to it (it IS part of the sustained value).
        window_fps.append(win_n / (time.perf_counter() - t_win))
    tracker.flush()  # the tail drain belongs to the measured run

    lat_ms = np.array(lat) * 1e3
    fps = len(lat) / (time.perf_counter() - bench_start)
    print(
        f"[bench] windows ({WIN_S:.0f}s each): "
        f"{[round(f, 1) for f in window_fps]} fps "
        f"(spread {min(window_fps):.1f}-{max(window_fps):.1f})",
        file=sys.stderr,
    )
    print(
        f"[bench] frames={len(lat_ms)} mean={lat_ms.mean():.2f}ms "
        f"p50={np.percentile(lat_ms, 50):.2f}ms p95={np.percentile(lat_ms, 95):.2f}ms "
        f"max={lat_ms.max():.2f}ms sustained={fps:.1f}fps",
        file=sys.stderr,
    )

    # Device-only per-frame time: the fused program looped inside ONE
    # lax.scan with per-iteration input variation (the carry feeds back a
    # value derived from each frame's output, so iterations can neither be
    # cached nor overlapped), timed as the difference of two iteration
    # counts — this cancels ALL fixed relay costs (dispatch submit AND
    # fetch), which dominate any per-dispatch measurement on this tunnel.
    # On a locally-attached chip this is the achievable frame time.
    try:
        import jax
        import jax.numpy as jnp
        from jax import lax

        from superslam_tpu.core.keyframe_gate import (
            MIN_FRAMES_DEFAULT as KF_MIN_FRAMES,
            MIN_MATCHES_DEFAULT as KF_MIN_MATCHES,
        )
        from superslam_tpu.ops.frontend_step import (
            fused_stereo_step_multi,
            fused_stereo_track_kf_step_multi,
            fused_stereo_track_step_multi,
        )

        img0 = jnp.asarray(pipeline._prepare_np(*frames[0]))
        # Mirror the MEASURED run's final mode: tracker.device_kf is the
        # post-run state (False if SUPERSLAM_DEVICE_KF=0 or if the kf
        # program fell back at first dispatch), so the device-only number
        # always times the program the run actually used.
        device_kf = tracker.device_kf
        device_tracking = tracker.device_tracking
        common = dict(
            max_keypoints=pipeline.K,
            keypoint_threshold=pipeline.keypoint_threshold,
            remove_borders=pipeline.remove_borders,
            nms_radius=pipeline.nms_radius,
            true_width=pipeline.width, true_height=pipeline.height,
            min_disparity=pipeline.min_disparity,
            match_threshold=pipeline.match_threshold,
        )

        def prog(iters):
            """The SAME program family as the measured run: the plain fused
            step, the dispatch-frozen track variant, or the zero-lag
            keyframe-promotion variant — threading the REAL cross-frame
            state (keyframe + pose carry) through the scan, exactly like
            consecutive production dispatches."""
            if device_kf:
                eye = jnp.eye(3, dtype=jnp.float32)
                zero = jnp.zeros((3,), jnp.float32)
                K = pipeline.K
                kf0 = (
                    jnp.zeros((K, 2), jnp.float32),
                    jnp.zeros((K, 256), jnp.float32),
                    jnp.zeros((K,), bool),
                    jnp.zeros((K, 3), jnp.float32),
                    jnp.zeros((K,), bool),
                    jnp.zeros((), jnp.int32),
                )

                @jax.jit
                def run(images):
                    def body(c, _):
                        imgs, kf_state, pose_carry = c
                        packed, _d, _k, _v, _t, kf_state, pose_carry = (
                            fused_stereo_track_kf_step_multi(
                                pipeline.sp_params, pipeline.lg_params, imgs,
                                kf_state, pose_carry,
                                calib=tracker._trk_calib,
                                min_matches=tracker._trk_min_matches,
                                track_sigma_px=tracker._trk_sigma_px,
                                disp_sigma0=tracker._trk_disp_sigma0,
                                disp_cond=tracker._trk_disp_cond,
                                accept_frac=tracker._kf_accept_frac,
                                support_px=tracker._kf_support_px,
                                kf_min_frames=KF_MIN_FRAMES,
                                kf_max_frames=tracker._kf_max_frames,
                                kf_min_matches=KF_MIN_MATCHES,
                                covis_ratio=tracker._kf_covis,
                                **common,
                            )
                        )
                        nxt = (
                            jnp.roll(imgs, 1, axis=2)
                            + packed[0, 0].astype(jnp.uint8)
                        ).astype(jnp.uint8)
                        return (nxt, kf_state, pose_carry), packed[0, 1]
                    _, outs = lax.scan(
                        body, (images, kf0, (eye, zero, eye, zero)), None,
                        length=iters,
                    )
                    return outs.reshape(iters, 1)
                return run

            if device_tracking:
                eye = jnp.eye(3, dtype=jnp.float32)
                zero = jnp.zeros((3,), jnp.float32)

                @jax.jit
                def run(images):
                    def body(c, _):
                        packed, *_ = fused_stereo_track_step_multi(
                            pipeline.sp_params, pipeline.lg_params, c,
                            pipeline._kf_kpts, pipeline._kf_desc,
                            pipeline._kf_valid, pipeline._kf_xw,
                            pipeline._kf_depth_ok, eye, zero, eye, zero,
                            calib=tracker._trk_calib,
                            min_matches=tracker._trk_min_matches,
                            track_sigma_px=tracker._trk_sigma_px,
                            disp_sigma0=tracker._trk_disp_sigma0,
                            disp_cond=tracker._trk_disp_cond,
                            **common,
                        )
                        nxt = (
                            jnp.roll(c, 1, axis=2)
                            + packed[0, 0].astype(jnp.uint8)
                        ).astype(jnp.uint8)
                        return nxt, packed[0, 1]
                    _, outs = lax.scan(body, images, None, length=iters)
                    return outs.reshape(iters, 1)
                return run

            @jax.jit
            def run(images):
                def body(c, _):
                    packed, _desc, _kpts, _valid = fused_stereo_step_multi(
                        pipeline.sp_params, pipeline.lg_params, c,
                        pipeline._kf_kpts, pipeline._kf_desc,
                        pipeline._kf_valid, **common,
                    )
                    nxt = (
                        jnp.roll(c, 1, axis=2) + packed[0, 0].astype(jnp.uint8)
                    ).astype(jnp.uint8)
                    return nxt, packed[0, 1]
                _, outs = lax.scan(body, images, None, length=iters)
                return outs.reshape(iters, 1)
            return run

        lo, hi = 3, 12
        run_lo, run_hi = prog(lo), prog(hi)
        np.asarray(run_lo(img0)); np.asarray(run_hi(img0))  # compile + settle
        samples = []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(run_lo(img0))
            tlo = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(run_hi(img0))
            thi = time.perf_counter() - t0
            samples.append((thi - tlo) / (hi - lo) * 1e3)
        dev_ms = min(samples)
        print(
            f"[bench] device-only per-frame program: {dev_ms:.1f} ms "
            f"({1000 / dev_ms:.0f} fps equivalent on a locally-attached chip)",
            file=sys.stderr,
        )
    except Exception:
        pass
    print(
        json.dumps(
            {
                "metric": "kitti00_stereo_tracking_fps",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
