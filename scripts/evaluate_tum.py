#!/usr/bin/env python
"""Evaluate a TUM-format estimated trajectory against TUM ground truth.

Equivalent of ``/root/reference/scripts/benchmarks/evaluate_tum.py``:
timestamp association (nearest, <= 20 ms) then SE(3)-aligned ATE and RPE.

Usage: python scripts/evaluate_tum.py <est_tum.txt> <groundtruth.txt>
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superslam_tpu.eval.metrics import ate, rpe  # noqa: E402
from superslam_tpu.io.trajectory import load_trajectory_tum  # noqa: E402


def associate(ts_a, ts_b, max_dt=0.02):
    tb = np.asarray(ts_b)
    pairs = []
    for i, t in enumerate(ts_a):
        j = int(np.argmin(np.abs(tb - t)))
        if abs(tb[j] - t) <= max_dt:
            pairs.append((i, j))
    return pairs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("est")
    ap.add_argument("gt")
    args = ap.parse_args()

    ts_e, est = load_trajectory_tum(args.est)
    ts_g, gt = load_trajectory_tum(args.gt)
    pairs = associate(ts_e, ts_g)
    est_m = [est[i] for i, _ in pairs]
    gt_m = [gt[j] for _, j in pairs]
    a = ate(est_m, gt_m)
    r = rpe(est_m, gt_m, delta_m=1.0)
    print(
        json.dumps(
            {
                "ate_rmse_m": round(a.rmse, 4),
                "ate_mean_m": round(a.mean, 4),
                "ate_max_m": round(a.max, 4),
                "rpe_rmse_m": round(r.rmse, 4),
                "matched_frames": len(pairs),
            }
        )
    )


if __name__ == "__main__":
    main()
