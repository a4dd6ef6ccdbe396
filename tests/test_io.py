"""Trajectory IO round-trips, quaternion conversion, undistortion inverse,
rectification identity, and config precedence."""

import os

import numpy as np
import pytest

from superslam_tpu.config import Config, apply_tuning_overrides, read_calib
from superslam_tpu.geometry import Pose3
from superslam_tpu.io.trajectory import (
    load_trajectory_kitti,
    load_trajectory_tum,
    rotation_to_quaternion,
    save_trajectory_kitti,
    save_trajectory_tum,
)
from superslam_tpu.io.undistort import RectifyMap, undistort_points

from helpers import make_calib


def random_poses(n, seed=0):
    rng = np.random.default_rng(seed)
    return [Pose3.expmap(rng.standard_normal(6)) for _ in range(n)]


def test_kitti_roundtrip(tmp_path):
    poses = random_poses(5)
    p = str(tmp_path / "kitti.txt")
    save_trajectory_kitti(p, poses)
    loaded = load_trajectory_kitti(p)
    assert len(loaded) == 5
    for a, b in zip(poses, loaded):
        np.testing.assert_allclose(a.matrix(), b.matrix(), atol=1e-7)


def test_tum_roundtrip(tmp_path):
    poses = random_poses(5, seed=1)
    ts = [0.1 * i for i in range(5)]
    p = str(tmp_path / "tum.txt")
    save_trajectory_tum(p, poses, ts)
    lts, loaded = load_trajectory_tum(p)
    np.testing.assert_allclose(lts, ts, atol=1e-6)
    for a, b in zip(poses, loaded):
        np.testing.assert_allclose(a.R, b.R, atol=1e-6)
        np.testing.assert_allclose(a.t, b.t, atol=1e-6)


def test_quaternion_all_branches():
    rng = np.random.default_rng(2)
    # Hit the trace>0 and each diagonal-dominant branch.
    for w in ([0.1, 0, 0], [np.pi - 0.01, 0, 0], [0, np.pi - 0.01, 0],
              [0, 0, np.pi - 0.01], list(rng.standard_normal(3))):
        R = Pose3.expmap(np.array(list(w) + [0, 0, 0])).R
        q = rotation_to_quaternion(R)
        assert np.linalg.norm(q) == pytest.approx(1.0)
        # Rebuild R and compare.
        x, y, z, qw = q
        R2 = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * qw), 2 * (x * z + y * qw)],
                [2 * (x * y + z * qw), 1 - 2 * (x * x + z * z), 2 * (y * z - x * qw)],
                [2 * (x * z - y * qw), 2 * (y * z + x * qw), 1 - 2 * (x * x + y * y)],
            ]
        )
        np.testing.assert_allclose(R2, R, atol=1e-9)


def test_undistort_points_inverts_distortion():
    calib = make_calib()
    dist = np.array([0.2, -0.3, 0.001, -0.002, 0.1])
    rng = np.random.default_rng(3)
    pts_ideal = rng.uniform([100, 100], [540, 380], size=(30, 2))
    # Distort the ideal points, then undistort_points must recover them.
    from superslam_tpu.io.undistort import _distort_normalized

    xn = (pts_ideal[:, 0] - calib.cx) / calib.fx
    yn = (pts_ideal[:, 1] - calib.cy) / calib.fy
    d = _distort_normalized(np.stack([xn, yn], 1), dist)
    pts_dist = np.stack(
        [d[:, 0] * calib.fx + calib.cx, d[:, 1] * calib.fy + calib.cy], 1
    )
    rec = undistort_points(pts_dist, calib, dist)
    np.testing.assert_allclose(rec, pts_ideal, atol=1e-3)


def test_rectify_map_identity():
    """With zero distortion, identity R and P == K, the remap must be a
    near-identity resampling."""
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    m = RectifyMap(K, np.zeros(5), np.eye(3), K, width=64, height=48)
    img = (np.arange(48 * 64).reshape(48, 64) % 251).astype(np.uint8)
    out = m.remap(img)
    assert np.abs(out[4:-4, 4:-4].astype(int) - img[4:-4, 4:-4].astype(int)).max() <= 1


def test_config_precedence(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "Camera.fx: 100.0\nCamera.fy: 100.0\nCamera.cx: 50.0\nCamera.cy: 40.0\n"
        "Camera.bf: 10.0\nTracking.min_matches: 25\n"
        "superpoint:\n  max_keypoints: 321\n"
    )
    cfg = Config.load(str(p))
    calib = read_calib(cfg)
    assert calib.baseline == pytest.approx(0.1)
    assert cfg.get("superpoint.max_keypoints") == 321
    # YAML bridges to env only when env is unset.
    os.environ.pop("SUPERSLAM_TRACK_MIN_MATCHES", None)
    apply_tuning_overrides(cfg)
    assert os.environ["SUPERSLAM_TRACK_MIN_MATCHES"] == "25"
    os.environ["SUPERSLAM_TRACK_MIN_MATCHES"] = "99"
    apply_tuning_overrides(cfg)  # env wins
    assert os.environ["SUPERSLAM_TRACK_MIN_MATCHES"] == "99"
    del os.environ["SUPERSLAM_TRACK_MIN_MATCHES"]
