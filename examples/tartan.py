#!/usr/bin/env python
"""TartanAir / TartanGround stereo runner.

Equivalent of ``/root/reference/examples/stereo/tartan.cc``: image_left /
image_right directories, timestamps synthesized at 10 Hz, trajectory saved
in TUM format (TartanAir ground truth is pose-list style).
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


def load_tartan_sequence(seq_dir: str):
    left_dir = os.path.join(seq_dir, "image_left")
    right_dir = os.path.join(seq_dir, "image_right")
    names_l = sorted(n for n in os.listdir(left_dir) if n.endswith(".png"))
    names_r = sorted(n for n in os.listdir(right_dir) if n.endswith(".png"))
    frames = []
    for i, (nl, nr) in enumerate(zip(names_l, names_r)):
        frames.append(
            (0.1 * i, os.path.join(left_dir, nl), os.path.join(right_dir, nr))
        )
    return frames


def main() -> None:
    args = parse_example_args("tartan")
    from superslam_tpu.slam import SuperSLAM

    slam = SuperSLAM(args.settings, use_viewer=args.viewer)
    frames = load_tartan_sequence(args.sequence)
    if args.max_frames:
        frames = frames[: args.max_frames]

    times_ms = []
    for t, lp, rp in frames:
        left, right = load_gray(lp), load_gray(rp)
        t0 = time.perf_counter()
        slam.track_stereo(left, right, t)
        times_ms.append((time.perf_counter() - t0) * 1e3)

    report_timing(times_ms)
    print(f"loop closures: {slam.loop_closure_count()}")
    seq = os.path.basename(os.path.normpath(args.sequence))
    out = args.out or os.path.join("results", "tartan", f"{seq}.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    slam.save_trajectory(out, "tum")
    print(f"trajectory -> {out}")
    slam.shutdown()


if __name__ == "__main__":
    main()
