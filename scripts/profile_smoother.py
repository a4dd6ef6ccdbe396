#!/usr/bin/env python
"""Standalone WindowSmoother cost model at bench cadence.

The bench decomposition (/tmp/bench_ab.json, CLAUDE.md round-5 findings)
attributes 46.7 ms/frame of the flagship kf leg to ws_solve: the covis-0.75
keyframe gate inserts every ~2 frames and every insertion runs a full
window LM (~93 ms at window 20 with long tracks). This script reproduces
that window shape on CPU incrementally (add_keyframe + optimize per step,
like production) and scans the knobs that could cut the per-insertion
cost — max_iters, window size, solve cadence — reporting steady-state
ms/optimize and the pose drift each variant introduces vs the default.

Usage: python scripts/profile_smoother.py [--steps 40] [--obs-per-kf 500]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from superslam_tpu.core.window_smoother import StereoObs, WindowSmoother
from superslam_tpu.geometry import Pose3, stereo_project
from helpers import make_calib


def build_sequence(rng, steps, obs_per_kf, survival=0.9):
    """Per-KF observation lists over a moving landmark pool whose tracks
    die with prob (1-survival) per step -> mean track length ~1/(1-s)."""
    calib = make_calib()
    gt = [Pose3(t=np.array([0.25 * k, 0.02 * np.sin(0.3 * k), 0.9 * k])) for k in range(steps)]
    alive: dict[int, np.ndarray] = {}
    next_id = 0
    per_kf = []
    for k in range(steps):
        # kill + mint to hold the pool at obs_per_kf
        for lm in list(alive):
            if rng.random() > survival:
                del alive[lm]
        base = gt[k].t
        while len(alive) < obs_per_kf:
            alive[next_id] = base + rng.uniform([-8, -4, 6], [8, 4, 30])
            next_id += 1
        obs = []
        for lm, X in alive.items():
            try:
                m = stereo_project(gt[k], calib, X)
            except Exception:
                continue
            obs.append(StereoObs(lm, m + rng.normal(0, 0.4, 3)))
        per_kf.append(obs)
    return calib, gt, per_kf


def run(calib, gt, per_kf, window, max_iters, solve_every=1, seed_noise=0.03):
    rng = np.random.default_rng(7)
    os.environ["SUPERSLAM_WS_MAX_ITERS"] = str(max_iters)
    sm = WindowSmoother(calib, window_size=window)
    times = []
    n_solved = 0
    for k, (tp, obs) in enumerate(zip(gt, per_kf)):
        seed = tp * Pose3.expmap(rng.normal(0, seed_noise, 6) * np.array([0.1, 0.1, 0.1, 1, 1, 1]))
        sm.add_keyframe(k, seed if k else tp, obs)
        if k % solve_every == 0 or k == len(gt) - 1:
            t0 = time.perf_counter()
            sm.optimize()
            dt = (time.perf_counter() - t0) * 1e3
            n_solved += 1
            if k >= window:  # steady state only
                times.append(dt)
    # error vs ground truth over the final window
    errs = [np.linalg.norm(sm.pose_of(k).t - gt[k].t)
            for k in list(sm._window)]
    return {
        "window": window, "max_iters": max_iters, "solve_every": solve_every,
        "ms_mean": float(np.mean(times)) if times else None,
        "ms_p90": float(np.percentile(times, 90)) if times else None,
        "n_timed": len(times),
        "final_err_mean_m": float(np.mean(errs)),
        "final_err_max_m": float(np.max(errs)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--obs-per-kf", type=int, default=500)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    calib, gt, per_kf = build_sequence(rng, args.steps, args.obs_per_kf)
    n_obs = sum(len(o) for o in per_kf) / len(per_kf)
    print(f"[smoother-bench] {args.steps} KFs, {n_obs:.0f} obs/KF, mean track ~10")

    for window, iters, every in [
        (20, 4, 1),   # bench default shape
        (20, 8, 1),   # does the solver early-exit?
        (20, 2, 1),
        (20, 1, 1),
        (10, 4, 1),
        (8, 4, 1),
        (20, 4, 2),   # solve every 2nd insertion
        (20, 4, 4),
    ]:
        r = run(calib, gt, per_kf, window, iters, every)
        print(f"  window={window:2d} iters={iters} every={every}: "
              f"{r['ms_mean']:.1f} ms mean / {r['ms_p90']:.1f} p90 "
              f"(n={r['n_timed']}), err mean {r['final_err_mean_m']*100:.2f} cm "
              f"max {r['final_err_max_m']*100:.2f} cm")


if __name__ == "__main__":
    main()
