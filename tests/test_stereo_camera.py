"""Stereo camera projection, backprojection, and analytic-vs-numeric
Jacobians (mirrors tests/test_pose_optimization_factors.cc Jacobian checks)."""

import numpy as np
import pytest

from superslam_tpu.geometry import (
    CheiralityError,
    Pose3,
    StereoCalib,
    stereo_project,
    stereo_project_jacobian,
    stereo_project_point_jacobian,
)


@pytest.fixture
def calib():
    return StereoCalib(fx=500.0, fy=480.0, cx=320.0, cy=240.0, baseline=0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_project_backproject_roundtrip(calib):
    X = np.array([1.2, -0.4, 6.0])
    meas = stereo_project(Pose3(), calib, X)
    np.testing.assert_allclose(calib.backproject_cam(*meas), X, atol=1e-10)


def test_backproject_batch(calib, rng):
    pts = rng.uniform([-3, -2, 2], [3, 2, 20], size=(20, 3))
    meas = np.stack([stereo_project(Pose3(), calib, p) for p in pts])
    np.testing.assert_allclose(calib.backproject_cam_batch(meas), pts, atol=1e-9)


def test_cheirality_raises(calib):
    with pytest.raises(CheiralityError):
        stereo_project(Pose3(), calib, np.array([0.0, 0.0, -1.0]))


def numeric_pose_jacobian(pose, calib, X, h=1e-6):
    J = np.zeros((3, 6))
    for k in range(6):
        d = np.zeros(6)
        d[k] = h
        plus = stereo_project(pose.retract(d), calib, X)
        minus = stereo_project(pose.retract(-d), calib, X)
        J[:, k] = (plus - minus) / (2 * h)
    return J


def test_pose_jacobian_matches_numeric(calib, rng):
    for _ in range(20):
        pose = Pose3.expmap(rng.standard_normal(6) * 0.4)
        X = pose.transform_from(rng.uniform([-3, -2, 3], [3, 2, 25]))
        proj, J = stereo_project_jacobian(pose, calib, X)
        np.testing.assert_allclose(proj, stereo_project(pose, calib, X), atol=1e-12)
        np.testing.assert_allclose(J, numeric_pose_jacobian(pose, calib, X), atol=1e-4)


def test_point_jacobian_matches_numeric(calib, rng):
    h = 1e-6
    for _ in range(10):
        pose = Pose3.expmap(rng.standard_normal(6) * 0.4)
        X = pose.transform_from(rng.uniform([-3, -2, 3], [3, 2, 25]))
        _, J = stereo_project_point_jacobian(pose, calib, X)
        Jn = np.zeros((3, 3))
        for k in range(3):
            d = np.zeros(3)
            d[k] = h
            Jn[:, k] = (
                stereo_project(pose, calib, X + d) - stereo_project(pose, calib, X - d)
            ) / (2 * h)
        np.testing.assert_allclose(J, Jn, atol=1e-4)
