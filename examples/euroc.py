#!/usr/bin/env python
"""EuRoC MAV stereo runner with on-the-fly rectification.

Equivalent of ``/root/reference/examples/stereo/euroc.cc``: build left/right
rectification maps from the LEFT.*/RIGHT.* matrices in the settings yaml
(cv::initUndistortRectifyMap semantics), remap each raw cam0/cam1 image,
track, and save the TUM-format trajectory (EuRoC ground truth is TUM-style).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.example_common import (  # noqa: E402
    load_gray,
    parse_example_args,
    report_timing,
)


def build_rectify_maps(settings_path: str):
    from superslam_tpu.config import Config
    from superslam_tpu.io.undistort import RectifyMap

    cfg = Config.load(settings_path)
    maps = []
    for side in ("LEFT", "RIGHT"):
        K = cfg.matrix(f"{side}.K")
        D = cfg.matrix(f"{side}.D").ravel()
        R = cfg.matrix(f"{side}.R")
        P = cfg.matrix(f"{side}.P")
        w = int(cfg.get(f"{side}.width"))
        h = int(cfg.get(f"{side}.height"))
        if K is None or D is None or R is None or P is None:
            raise ValueError("Rectification matrices (LEFT.*/RIGHT.*) missing")
        maps.append(RectifyMap(K, D, R, P, w, h))
    return maps


def load_euroc_sequence(seq_dir: str):
    """mav0/cam0/data.csv drives the timestamps; cam1 images share names."""
    cam0 = os.path.join(seq_dir, "mav0", "cam0")
    cam1 = os.path.join(seq_dir, "mav0", "cam1")
    if not os.path.isdir(cam0):  # allow pointing directly at mav0/
        cam0 = os.path.join(seq_dir, "cam0")
        cam1 = os.path.join(seq_dir, "cam1")
    frames = []
    with open(os.path.join(cam0, "data.csv")) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            ts_ns, name = line.strip().split(",")[:2]
            lp = os.path.join(cam0, "data", name)
            rp = os.path.join(cam1, "data", name)
            if os.path.exists(lp) and os.path.exists(rp):
                frames.append((int(ts_ns) * 1e-9, lp, rp))
    return frames


def main() -> None:
    args = parse_example_args("euroc")
    from superslam_tpu.slam import SuperSLAM

    rect_l, rect_r = build_rectify_maps(args.settings)
    slam = SuperSLAM(args.settings, use_viewer=args.viewer)
    frames = load_euroc_sequence(args.sequence)
    if args.max_frames:
        frames = frames[: args.max_frames]

    times_ms = []
    for t, lp, rp in frames:
        left = rect_l.remap(load_gray(lp))
        right = rect_r.remap(load_gray(rp))
        t0 = time.perf_counter()
        slam.track_stereo(left, right, t)
        times_ms.append((time.perf_counter() - t0) * 1e3)

    report_timing(times_ms)
    print(f"loop closures: {slam.loop_closure_count()}")
    seq = os.path.basename(os.path.normpath(args.sequence))
    out = args.out or os.path.join("results", "euroc", f"{seq}.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    slam.save_trajectory(out, "tum")
    print(f"trajectory -> {out}")
    slam.shutdown()


if __name__ == "__main__":
    main()
