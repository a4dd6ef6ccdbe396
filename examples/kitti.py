#!/usr/bin/env python
"""KITTI odometry stereo runner.

Equivalent of ``/root/reference/examples/stereo/kitti.cc``: load times.txt +
image_0/image_1, track every stereo pair, report timing, save the KITTI-
format trajectory to results/kitti/<seq>.txt. Enable loop closure with
SUPERSLAM_ENABLE_LOOP=1 (the reference Makefile's run target does).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.example_common import (  # noqa: E402
    load_gray,
    pace_to_timestamp,
    parse_example_args,
    report_timing,
)


def load_kitti_sequence(seq_dir: str):
    with open(os.path.join(seq_dir, "times.txt")) as f:
        times = [float(line) for line in f if line.strip()]
    left_dir = os.path.join(seq_dir, "image_0")
    right_dir = os.path.join(seq_dir, "image_1")
    names = sorted(os.listdir(left_dir))
    return [
        (times[i], os.path.join(left_dir, n), os.path.join(right_dir, n))
        for i, n in enumerate(names[: len(times)])
    ]


def main() -> None:
    args = parse_example_args("kitti")
    from superslam_tpu.slam import SuperSLAM

    slam = SuperSLAM(args.settings, use_viewer=args.viewer)
    frames = load_kitti_sequence(args.sequence)
    if args.max_frames:
        frames = frames[: args.max_frames]

    times_ms = []
    prev_t = None
    for t, lp, rp in frames:
        left, right = load_gray(lp), load_gray(rp)
        t0 = time.perf_counter()
        slam.track_stereo(left, right, t)
        ms = (time.perf_counter() - t0) * 1e3
        times_ms.append(ms)
        if args.pace and prev_t is not None:
            pace_to_timestamp(ms, t - prev_t)
        prev_t = t

    report_timing(times_ms)
    print(f"loop closures: {slam.loop_closure_count()}")

    seq = os.path.basename(os.path.normpath(args.sequence))
    out = args.out or os.path.join("results", "kitti", f"{seq}.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    slam.save_trajectory(out, "kitti")
    print(f"trajectory -> {out}")
    slam.shutdown()


if __name__ == "__main__":
    main()
