"""Pose-only factor batch evaluation: zero residual at the true pose,
analytic vs numeric Jacobians, cheirality no-throw, and the disparity-aware
noise shape (mirrors tests/test_pose_optimization_factors.cc:42-295)."""

import numpy as np
import pytest

from superslam_tpu.core.factors import (
    batch_stereo_factor,
    huber_loss,
    huber_weights,
    stereo_diag_sigmas,
)
from superslam_tpu.geometry import Pose3, StereoCalib, stereo_project


@pytest.fixture
def calib():
    return StereoCalib(fx=500.0, fy=500.0, cx=320.0, cy=240.0, baseline=0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def test_zero_residual_at_true_pose(calib, rng):
    pose = Pose3.expmap(rng.standard_normal(6) * 0.3)
    Xw = pose.transform_from(rng.uniform([-3, -2, 3], [3, 2, 20], size=(12, 3)))
    meas = np.stack([stereo_project(pose, calib, x) for x in Xw])
    r, J = batch_stereo_factor(pose, calib, Xw, meas)
    np.testing.assert_allclose(r, 0.0, atol=1e-9)


def test_analytic_vs_numeric_jacobian(calib, rng):
    pose = Pose3.expmap(rng.standard_normal(6) * 0.3)
    true_pose = pose.retract(rng.standard_normal(6) * 0.05)
    Xw = true_pose.transform_from(rng.uniform([-3, -2, 3], [3, 2, 20], size=(8, 3)))
    meas = np.stack([stereo_project(true_pose, calib, x) for x in Xw])
    _, J = batch_stereo_factor(pose, calib, Xw, meas)
    h = 1e-6
    Jn = np.zeros_like(J)
    for k in range(6):
        d = np.zeros(6)
        d[k] = h
        rp, _ = batch_stereo_factor(pose.retract(d), calib, Xw, meas)
        rm, _ = batch_stereo_factor(pose.retract(-d), calib, Xw, meas)
        Jn[:, :, k] = (rp - rm) / (2 * h)
    np.testing.assert_allclose(J, Jn, atol=1e-4)


def test_cheirality_large_residual_zero_jacobian(calib):
    pose = Pose3()
    Xw = np.array([[0.0, 0.0, -5.0], [1.0, 0.0, 10.0]])
    meas = np.array([[320.0, 295.0, 240.0], [370.0, 345.0, 240.0]])
    r, J = batch_stereo_factor(pose, calib, Xw, meas)
    # Behind the camera: constant 2*fx residual, zero Jacobian; no throw.
    np.testing.assert_allclose(r[0], 2.0 * calib.fx)
    np.testing.assert_allclose(J[0], 0.0)
    # The valid point is unaffected.
    assert np.abs(r[1]).max() < 1.0
    assert np.abs(J[1]).max() > 0.0


def test_stereo_diag_noise_shape(calib):
    """sigma_uR = sigma_d0 * sqrt(1 + (d_cond/d)^2): monotone decreasing in d,
    approaching sigma_d0 for near points, released smoothly for far points."""
    mbf = calib.bf
    sig_near = stereo_diag_sigmas(10.0, np.array([100.0]), mbf)[0]
    sig_far = stereo_diag_sigmas(10.0, np.array([1.0]), mbf)[0]
    sig_zero = stereo_diag_sigmas(10.0, np.array([0.0]), mbf)[0]
    assert sig_near[0] == 10.0 and sig_near[2] == 10.0
    assert sig_near[1] < sig_far[1] < sig_zero[1]
    assert np.isfinite(sig_zero).all()  # clamped, no divide by zero
    # Near-point limit: sqrt(1 + small) ~ sigma_d0
    assert sig_near[1] == pytest.approx(8.0, rel=0.01)


def test_huber_weights_and_loss():
    k = 2.0
    w = huber_weights(np.array([[1.0, 0.0], [0.0, 4.0]]), k)
    np.testing.assert_allclose(w, [1.0, 0.5])
    # Quadratic below k, linear above.
    assert huber_loss(np.array([[1.0, 0.0]]), k) == pytest.approx(0.5)
    assert huber_loss(np.array([[0.0, 4.0]]), k) == pytest.approx(2 * 4 - 0.5 * 4)


def test_mono_factor_zero_residual_and_jacobian(calib, rng):
    from superslam_tpu.core.factors import batch_mono_factor
    from superslam_tpu.geometry import mono_project_jacobian

    pose = Pose3.expmap(rng.standard_normal(6) * 0.3)
    Xw = pose.transform_from(rng.uniform([-3, -2, 3], [3, 2, 20], size=(10, 3)))
    meas = np.stack([mono_project_jacobian(pose, calib, x)[0] for x in Xw])
    r, J = batch_mono_factor(pose, calib, Xw, meas)
    np.testing.assert_allclose(r, 0.0, atol=1e-9)
    # Analytic vs numeric at a perturbed pose.
    pose2 = pose.retract(rng.standard_normal(6) * 0.05)
    _, J = batch_mono_factor(pose2, calib, Xw, meas)
    h = 1e-6
    Jn = np.zeros_like(J)
    for k in range(6):
        d = np.zeros(6)
        d[k] = h
        rp, _ = batch_mono_factor(pose2.retract(d), calib, Xw, meas)
        rm, _ = batch_mono_factor(pose2.retract(-d), calib, Xw, meas)
        Jn[:, :, k] = (rp - rm) / (2 * h)
    np.testing.assert_allclose(J, Jn, atol=1e-4)
    # Cheirality escape hatch.
    r, J = batch_mono_factor(Pose3(), calib, np.array([[0.0, 0.0, -2.0]]), np.zeros((1, 2)))
    np.testing.assert_allclose(r[0], 2.0 * calib.fx)
    np.testing.assert_allclose(J[0], 0.0)
