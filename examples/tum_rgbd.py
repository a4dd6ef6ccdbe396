#!/usr/bin/env python
"""TUM RGB-D runner.

Equivalent of ``/root/reference/examples/rgbd/tum.cc``: associate rgb.txt
and depth.txt by nearest timestamp (<= 20 ms), track RGB-D frames, save the
TUM-format trajectory.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.example_common import parse_example_args, report_timing  # noqa: E402


def _read_list(path: str):
    out = []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            t, name = line.strip().split()[:2]
            out.append((float(t), name))
    return out


def associate(seq_dir: str, max_dt: float = 0.02):
    """Nearest-timestamp rgb/depth association (tum.cc:81-90)."""
    rgb = _read_list(os.path.join(seq_dir, "rgb.txt"))
    depth = _read_list(os.path.join(seq_dir, "depth.txt"))
    dts = np.array([t for t, _ in depth])
    pairs = []
    for t, name in rgb:
        i = int(np.argmin(np.abs(dts - t)))
        if abs(dts[i] - t) <= max_dt:
            pairs.append((t, name, depth[i][1]))
    return pairs


def main() -> None:
    args = parse_example_args("tum_rgbd")
    import cv2

    from superslam_tpu.slam import SuperSLAM

    slam = SuperSLAM(args.settings, use_viewer=args.viewer)
    pairs = associate(args.sequence)
    if args.max_frames:
        pairs = pairs[: args.max_frames]

    times_ms = []
    for t, rgb_name, depth_name in pairs:
        rgb = cv2.imread(os.path.join(args.sequence, rgb_name), cv2.IMREAD_GRAYSCALE)
        depth = cv2.imread(
            os.path.join(args.sequence, depth_name), cv2.IMREAD_UNCHANGED
        )
        if rgb is None or depth is None:
            continue
        t0 = time.perf_counter()
        slam.track_rgbd(rgb, depth, t)
        times_ms.append((time.perf_counter() - t0) * 1e3)

    report_timing(times_ms)
    print(f"loop closures: {slam.loop_closure_count()}")
    seq = os.path.basename(os.path.normpath(args.sequence))
    out = args.out or os.path.join("results", "tum", f"{seq}.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    slam.save_trajectory(out, "tum")
    print(f"trajectory -> {out}")
    slam.shutdown()


if __name__ == "__main__":
    main()
