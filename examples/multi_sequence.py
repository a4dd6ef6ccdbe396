#!/usr/bin/env python
"""Multi-sequence batched stereo tracking (BASELINE config 5).

The TPU-native capability the reference's single-stream design cannot
express: S independent KITTI-style sequences tracked through ONE fused
device program per step (SuperPoint over all 2S images, 2S LightGlue pair
problems, one packed readback), with the sequence axis data-parallel over a
``jax.sharding`` mesh when more than one device is attached — each chip
owns S/n sequences with zero cross-sequence communication.

Usage:
    python examples/multi_sequence.py <settings.yaml> <seq_dir> [seq_dir ...]
        [--replicate N] [--max-frames M] [--out-dir results/multi]

A single sequence dir with ``--replicate N`` tracks N copies (throughput
measurement); distinct dirs track truly independent streams. Trajectories
are written per sequence in KITTI format.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.example_common import load_gray, report_timing  # noqa: E402
from examples.kitti import load_kitti_sequence  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(prog="multi_sequence")
    ap.add_argument("settings")
    ap.add_argument("sequences", nargs="+", help="one or more sequence dirs")
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--out-dir", default=os.path.join("results", "multi"))
    args = ap.parse_args()

    import jax

    from superslam_tpu.config import Config, apply_tuning_overrides, read_calib
    from superslam_tpu.frontend.matcher import LightGlueMatcher
    from superslam_tpu.io.trajectory import save_trajectory_kitti
    from superslam_tpu.models.lightglue import init_lightglue_params
    from superslam_tpu.models.superpoint import init_superpoint_params
    from superslam_tpu.models.weights import load_params
    from superslam_tpu.parallel.multi_tracker import MultiSequenceTracker
    from superslam_tpu.slam import _enable_compilation_cache

    _enable_compilation_cache()
    cfg = Config.load(args.settings)
    apply_tuning_overrides(cfg)
    calib = read_calib(cfg)

    seq_dirs = [d for d in args.sequences for _ in range(args.replicate)]
    S = len(seq_dirs)
    seqs = [load_kitti_sequence(d) for d in seq_dirs]
    n_frames = min(len(s) for s in seqs)
    if args.max_frames:
        n_frames = min(n_frames, args.max_frames)

    model_dir = str(cfg.get("SuperPoint.model_dir", "weights/"))
    sp_params = load_params(
        os.path.join(model_dir, "superpoint_v1.safetensors"),
        lambda: init_superpoint_params(),
    )
    lg_params = load_params(
        os.path.join(model_dir, "lightglue_superpoint.safetensors"),
        lambda: init_lightglue_params(),
    )
    w = int(cfg.get("lightglue.image_width", cfg.get("Camera.width", 640)))
    h = int(cfg.get("lightglue.image_height", cfg.get("Camera.height", 480)))
    max_kp = int(cfg.get("superpoint.max_keypoints", 512))

    mesh = None
    if len(jax.devices()) > 1:
        from superslam_tpu.parallel.mesh import make_mesh

        # Largest device count whose data axis divides S (each chip owns
        # whole sequences); 1 device -> no mesh.
        n = max(
            (d for d in range(1, len(jax.devices()) + 1) if S % d == 0),
            default=1,
        )
        if n > 1:
            mesh = make_mesh(n, model_axis=1)
            print(f"data-parallel mesh: {mesh.devices.shape} over {S} sequences")

    tracker = MultiSequenceTracker(
        sp_params,
        lg_params,
        calib,
        num_sequences=S,
        width=w,
        height=h,
        max_keypoints=max_kp,
        keypoint_threshold=float(cfg.get("superpoint.keypoint_threshold", 0.005)),
        remove_borders=int(cfg.get("superpoint.remove_borders", 4)),
        window_size=int(cfg.get("Backend.window_size", 8)),
        matcher=LightGlueMatcher(
            lg_params, image_width=w, image_height=h, max_keypoints=max_kp
        ),
        mesh=mesh,
    )

    times_ms = []
    t_start = time.perf_counter()
    for i in range(n_frames):
        lefts, rights, stamps = [], [], []
        for s in range(S):
            t, lp, rp = seqs[s][i]
            lefts.append(load_gray(lp))
            rights.append(load_gray(rp))
            stamps.append(t)
        t0 = time.perf_counter()
        tracker.step(lefts, rights, stamps)
        times_ms.append((time.perf_counter() - t0) * 1e3)
    wall = time.perf_counter() - t_start

    report_timing(times_ms)
    print(
        f"aggregate throughput: {S * n_frames / wall:.1f} frames/s "
        f"({S} sequences x {n_frames} frames in {wall:.1f}s)"
    )
    os.makedirs(args.out_dir, exist_ok=True)
    for s, traj in enumerate(tracker.trajectories()):
        out = os.path.join(args.out_dir, f"seq{s:02d}.txt")
        save_trajectory_kitti(out, traj)
        print(f"trajectory -> {out}")


if __name__ == "__main__":
    main()
