"""Quantify RGB-D depth-sampling quality at real extractor keypoints.

The ablation tool behind the round-4 RGB-D accuracy note in
COMPONENTS.md: renders frames of the TUM-leg circuit (unscaled world,
640x352, fx=320), runs the trained extractor, samples depth the way
RgbdFrontEnd does (rounded pixel — mirroring the reference's raw-pixel
lookup in /root/reference/src/RgbdFrontEnd.cc), and reports:
  - fraction of keypoints with Z == 0 (background / no data -> dropped)
  - among valid, the error of the synthesized uR vs the ground-truth uR
    (GT disparity from the exact depth at the subpixel keypoint; bilinear
    over valid pixels as the reference depth)

Measured 2026-08-19: uR err mean 0.002 px (p95 ~0.006), Z==0 dropout
8.4% — the depth-sampling path is not the source of any RGB-D ATE gap.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from superslam_tpu.eval.synthetic_sequence import (
    circuit_trajectory, make_room_world, render_view,
)
from superslam_tpu.geometry import StereoCalib
from superslam_tpu.frontend.extractor import SuperPointExtractor
from superslam_tpu.models.superpoint import init_superpoint_params
from superslam_tpu.models.weights import load_params

W, H, FX = 640, 352, 320.0
rng = np.random.default_rng(0)
world = make_room_world(rng, n_sprites=300)
calib = StereoCalib(fx=FX, fy=FX, cx=W / 2, cy=H / 2, baseline=0.3)
poses = circuit_trajectory(150)

sp = load_params(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "weights", "superpoint_render.safetensors"),
                 lambda: init_superpoint_params())
ext = SuperPointExtractor(sp, W, H, max_keypoints=512, keypoint_threshold=0.010)

rrng = np.random.default_rng(1)
n_kp = n_zero = 0
ur_err_round = []   # uR error with rounded-pixel sampling
ur_err_bilin = []   # uR error with valid-bilinear sampling
ur_err_med = []     # uR error with 3x3 valid-median sampling
bf = calib.fx * calib.baseline

def bilinear_valid(depth, u, v):
    u0, v0 = int(np.floor(u)), int(np.floor(v))
    zs, ws = [], []
    for (du, dv) in [(0, 0), (1, 0), (0, 1), (1, 1)]:
        x, y = u0 + du, v0 + dv
        if 0 <= x < depth.shape[1] and 0 <= y < depth.shape[0]:
            z = depth[y, x]
            if z > 0:
                w = (1 - abs(u - x)) * (1 - abs(v - y))
                zs.append(z); ws.append(w)
    if not zs or sum(ws) < 1e-6:
        return 0.0
    return float(np.dot(zs, ws) / sum(ws))

def median3(depth, u, v):
    ui, vi = int(round(u)), int(round(v))
    vals = []
    for dv in (-1, 0, 1):
        for du in (-1, 0, 1):
            x, y = ui + du, vi + dv
            if 0 <= x < depth.shape[1] and 0 <= y < depth.shape[0]:
                z = depth[y, x]
                if z > 0:
                    vals.append(z)
    return float(np.median(vals)) if vals else 0.0

for i in range(0, 150, 10):
    img, depth = render_view(world, poses[i], calib, H, W, rrng,
                             return_depth=True)
    # quantize like the PNG round-trip
    depth = np.round(depth * 5000).astype(np.uint16).astype(np.float64) / 5000
    feats = ext.extract(np.round(img * 255).astype(np.uint8))
    kps = feats.keypoints
    n_kp += len(kps)
    for (u, v) in kps:
        ui, vi = int(round(u)), int(round(v))
        if not (0 <= ui < W and 0 <= vi < H):
            continue
        z_round = depth[vi, ui]
        z_gt = bilinear_valid(depth, u, v)
        if z_round <= 0:
            n_zero += 1
            continue
        if z_gt <= 0:
            continue
        ur_gt = u - bf / z_gt
        ur_err_round.append(abs((u - bf / z_round) - ur_gt))
        z_m = median3(depth, u, v)
        if z_m > 0:
            ur_err_med.append(abs((u - bf / z_m) - ur_gt))

e = np.array(ur_err_round)
m = np.array(ur_err_med)
print(f"keypoints: {n_kp}, Z==0 at rounded pixel: {n_zero} "
      f"({100.0 * n_zero / max(n_kp,1):.1f}%)")
print(f"uR err (rounded-pixel): mean {e.mean():.3f}px p95 "
      f"{np.percentile(e, 95):.3f}px max {e.max():.3f}px")
print(f"uR err (3x3 valid-median): mean {m.mean():.3f}px p95 "
      f"{np.percentile(m, 95):.3f}px max {m.max():.3f}px")
