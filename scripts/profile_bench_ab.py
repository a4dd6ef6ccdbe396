#!/usr/bin/env python
"""Same-process bench decomposition: attribute the r3->r4 sustained-fps
regression (32.8 -> 22.4, BENCH_r03/r04.json) between its three confounds
— trained stack, natural keyframe cadence (covis 0.75 vs the old tuned
0.3), and the device-kf program — plus a no-smoother leg bounding what
deferring the window solve off the drain path could buy.

All legs run in ONE process, round-robin in short windows, so every
cross-leg delta is measured inside the same relay-weather phase (cross-run
timings swing up to 2x — CLAUDE.md). Reports per-leg sustained fps
aggregated over all rounds plus the host profiler's per-leg breakdown
(vo_gtsam_optimize / pl_fetch_wait / pl_prepare / pl_upload).

Usage:
  SUPERSLAM_PROFILE=1 python scripts/profile_bench_ab.py \
      [--rounds 3] [--settle 6] [--measure 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SUPERSLAM_PROFILE", "1")

LEGS = [
    # (name, passthrough_lg, covis, device_kf, leg_env)
    ("r3ish_passthrough_covis03_nokf", True, 0.3, False, {}),
    ("trained_covis03_nokf", False, 0.3, False, {}),
    ("trained_covis075_nokf", False, 0.75, False, {}),
    ("trained_covis075_kf", False, 0.75, True, {}),
    ("trained_covis075_kf_nosmoother", False, 0.75, True,
     {"SUPERSLAM_VO_NO_SMOOTHER": "1"}),
    # Window-solve cadence (SUPERSLAM_WS_SOLVE_EVERY): full LM every k-th
    # insertion, 1-iteration warm polish between — the designed recovery
    # for ws_solve's 46.7 ms/frame share of the kf leg.
    ("trained_covis075_kf_ws2", False, 0.75, True,
     {"SUPERSLAM_WS_SOLVE_EVERY": "2"}),
    ("trained_covis075_kf_ws4", False, 0.75, True,
     {"SUPERSLAM_WS_SOLVE_EVERY": "4"}),
]

# Every env key any leg may set: cleared before each leg so settings never
# leak across the round-robin.
LEG_ENV_KEYS = ("SUPERSLAM_VO_NO_SMOOTHER", "SUPERSLAM_WS_SOLVE_EVERY")


def _apply_leg_env(leg_env: dict) -> None:
    for k in LEG_ENV_KEYS:
        os.environ.pop(k, None)
    os.environ.update(leg_env)


def build_tracker(passthrough: bool, covis: float, device_kf: bool):
    import bench
    from superslam_tpu.core.vo_estimator import VoEstimator
    from superslam_tpu.frontend.fused import FusedStereoPipeline
    from superslam_tpu.frontend.matcher import LightGlueMatcher
    from superslam_tpu.frontend.pipelined import PipelinedStereoTracker
    from superslam_tpu.geometry.stereo_camera import StereoCalib
    from superslam_tpu.models.lightglue import init_lightglue_params
    from superslam_tpu.models.superpoint import init_superpoint_params
    from superslam_tpu.models.weights import load_params

    calib = StereoCalib(
        fx=bench.FX, fy=bench.FX, cx=bench.CX, cy=bench.CY,
        baseline=bench.BF / bench.FX,
    )
    sp_params = load_params(
        os.path.join(bench.REPO, "weights", "superpoint_render.safetensors"),
        lambda: init_superpoint_params(0),
    )
    if passthrough:
        lg_params = init_lightglue_params(0, passthrough=True)
    else:
        lg_params = load_params(
            os.path.join(bench.REPO, "weights", "lightglue_synth.safetensors"),
            lambda: init_lightglue_params(0, passthrough=True),
        )
    pipeline = FusedStereoPipeline(
        sp_params, lg_params, calib,
        width=bench.WIDTH, height=bench.HEIGHT,
        max_keypoints=600, keypoint_threshold=0.010,
    )
    matcher = LightGlueMatcher(
        lg_params, image_width=bench.WIDTH, image_height=bench.HEIGHT,
        max_keypoints=600,
    )
    estimator = VoEstimator(matcher, calib, window_size=10)
    estimator.set_keyframe_params(covisibility_ratio=covis, max_frames=20)
    os.environ["SUPERSLAM_DEVICE_KF"] = "1" if device_kf else "0"
    # SUPERSLAM_KF_COVIS would override the estimator's value at tracker
    # init; clear it so each leg's covis comes from set_keyframe_params.
    os.environ.pop("SUPERSLAM_KF_COVIS", None)
    return PipelinedStereoTracker(
        pipeline, estimator, depth=3, batch=4, device_tracking=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--settle", type=float, default=6.0)
    ap.add_argument("--measure", type=float, default=20.0)
    ap.add_argument("--legs", nargs="*", default=None)
    args = ap.parse_args()

    import bench
    from superslam_tpu.slam import _enable_compilation_cache
    from superslam_tpu.utils.profiler import Profiler

    _enable_compilation_cache()
    legs = [l for l in LEGS if args.legs is None or l[0] in args.legs]
    frames = bench.synth_sequence(bench.N_FRAMES)

    print("[ab] building trackers + compiling...", flush=True)
    trackers = {}
    idx = {}
    for name, pt, covis, dkf, leg_env in legs:
        _apply_leg_env(leg_env)
        t0 = time.time()
        tr = build_tracker(pt, covis, dkf)
        # Warm: compile the fused program + settle first keyframes.
        for i in range(8):
            l, r = frames[i % len(frames)]
            tr.track(l, r, 0.1 * i)
        tr.flush()
        trackers[name] = tr
        idx[name] = 8
        print(f"[ab]   {name}: ready in {time.time() - t0:.0f}s", flush=True)
    _apply_leg_env({})

    fps_acc = {name: [] for name, *_ in legs}
    prof_acc = {name: {} for name, *_ in legs}
    frames_acc = {name: 0 for name, *_ in legs}
    for rnd in range(args.rounds):
        for name, pt, covis, dkf, leg_env in legs:
            _apply_leg_env(leg_env)
            tr = trackers[name]
            i = idx[name]
            t_end = time.perf_counter() + args.settle
            while time.perf_counter() < t_end:
                l, r = frames[i % len(frames)]
                tr.track(l, r, 0.1 * i)
                i += 1
            p0 = Profiler.instance().stats()
            n0 = i
            t0 = time.perf_counter()
            t_end = t0 + args.measure
            while time.perf_counter() < t_end:
                l, r = frames[i % len(frames)]
                tr.track(l, r, 0.1 * i)
                i += 1
            dt = time.perf_counter() - t0
            p1 = Profiler.instance().stats()
            idx[name] = i
            fps = (i - n0) / dt
            fps_acc[name].append(round(fps, 2))
            frames_acc[name] += i - n0
            for label in ("vo_gtsam_optimize", "ws_rebuild", "ws_solve",
                          "pl_fetch_wait", "pl_prepare", "pl_upload",
                          "vo_lg_track_match"):
                d_ms = p1.get(label, (0, 0))[0] - p0.get(label, (0, 0))[0]
                d_n = p1.get(label, (0, 0))[1] - p0.get(label, (0, 0))[1]
                acc = prof_acc[name].setdefault(label, [0.0, 0])
                acc[0] += d_ms
                acc[1] += d_n
            print(f"[ab] round {rnd} {name}: {fps:.1f} fps", flush=True)

    out = {"config": vars(args), "legs": []}
    for name, *_ in legs:
        prof = {
            k: {"ms_per_frame": round(v[0] / max(1, frames_acc[name]), 3),
                "total_ms": round(v[0], 1), "n": v[1]}
            for k, v in prof_acc[name].items()
        }
        out["legs"].append({
            "leg": name,
            "fps_rounds": fps_acc[name],
            "fps_mean": round(float(np.mean(fps_acc[name])), 2),
            "profile": prof,
        })
        print(f"[ab] {name}: rounds {fps_acc[name]} mean "
              f"{np.mean(fps_acc[name]):.1f} fps", flush=True)
    path = "/tmp/bench_ab.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[ab] wrote {path}")


if __name__ == "__main__":
    main()
