#!/usr/bin/env python
"""Evaluate a TartanAir/TartanGround run: the estimate is TUM-format at
synthesized 10 Hz; ground truth is pose_left.txt (x y z qx qy qz qw per
frame, NED). Equivalent of the reference's evaluate_tartan.py.

Usage: python scripts/evaluate_tartan.py <est_tum.txt> <pose_left.txt>
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superslam_tpu.eval.metrics import ate, kitti_segment_errors, rpe  # noqa: E402
from superslam_tpu.geometry import Pose3  # noqa: E402
from superslam_tpu.io.trajectory import load_trajectory_tum  # noqa: E402


def load_tartan_gt(path):
    poses = []
    for line in open(path):
        v = np.fromstring(line, sep=" ")
        if v.size < 7:
            continue
        tx, ty, tz, qx, qy, qz, qw = v[:7]
        n = np.linalg.norm([qx, qy, qz, qw])
        qx, qy, qz, qw = qx / n, qy / n, qz / n, qw / n
        R = np.array(
            [
                [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
                [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
                [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
            ]
        )
        poses.append(Pose3(R, np.array([tx, ty, tz])))
    return poses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("est")
    ap.add_argument("gt")
    args = ap.parse_args()
    _, est = load_trajectory_tum(args.est)
    gt = load_tartan_gt(args.gt)
    a = ate(est, gt)
    r = rpe(est, gt, delta_m=1.0)
    t_rel, r_rel = kitti_segment_errors(est, gt)
    print(json.dumps({
        "ate_rmse_m": round(a.rmse, 4), "ate_mean_m": round(a.mean, 4),
        "rpe_rmse_m": round(r.rmse, 4), "t_rel_percent": round(t_rel, 3),
        "frames": min(len(est), len(gt)),
    }))


if __name__ == "__main__":
    main()
