#!/usr/bin/env python
"""Evaluate a EuRoC run: the estimate is TUM-format; ground truth is the
sequence's state_groundtruth_estimate0/data.csv. Equivalent of the
reference's evaluate_euroc.py (timestamp association + SE3-aligned ATE/RPE).

Usage: python scripts/evaluate_euroc.py <est_tum.txt> <sequence_dir_or_gt_csv>
"""
import argparse
import csv
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superslam_tpu.eval.metrics import ate, rpe  # noqa: E402
from superslam_tpu.geometry import Pose3  # noqa: E402
from superslam_tpu.io.trajectory import load_trajectory_tum  # noqa: E402
from scripts.evaluate_tum import associate  # noqa: E402


def load_euroc_gt(path):
    if os.path.isdir(path):
        path = os.path.join(path, "mav0", "state_groundtruth_estimate0", "data.csv")
    ts, poses = [], []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            t = float(row[0]) * 1e-9
            tx, ty, tz = map(float, row[1:4])
            qw, qx, qy, qz = map(float, row[4:8])
            n = np.linalg.norm([qx, qy, qz, qw])
            qx, qy, qz, qw = qx / n, qy / n, qz / n, qw / n
            R = np.array(
                [
                    [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
                    [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
                    [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
                ]
            )
            ts.append(t)
            poses.append(Pose3(R, np.array([tx, ty, tz])))
    return ts, poses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("est")
    ap.add_argument("gt")
    args = ap.parse_args()
    ts_e, est = load_trajectory_tum(args.est)
    ts_g, gt = load_euroc_gt(args.gt)
    pairs = associate(ts_e, ts_g)
    est_m = [est[i] for i, _ in pairs]
    gt_m = [gt[j] for _, j in pairs]
    a = ate(est_m, gt_m)
    r = rpe(est_m, gt_m, delta_m=1.0)
    print(json.dumps({
        "ate_rmse_m": round(a.rmse, 4), "ate_mean_m": round(a.mean, 4),
        "ate_max_m": round(a.max, 4), "rpe_rmse_m": round(r.rmse, 4),
        "matched_frames": len(pairs),
    }))


if __name__ == "__main__":
    main()
