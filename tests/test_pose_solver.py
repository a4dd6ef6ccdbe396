"""XLA pose-only LM vs the numpy FrameTracker oracle."""

import numpy as np

import jax.numpy as jnp

from superslam_tpu.core.factors import stereo_diag_sigmas
from superslam_tpu.core.frame_tracker import FrameTracker
from superslam_tpu.geometry import Pose3, stereo_project
from superslam_tpu.ops.pose_solver import pose_only_lm

from helpers import make_calib


def _solve_xla(calib, init, Xw, meas, n_pad=128):
    n = Xw.shape[0]
    sig = stereo_diag_sigmas(10.0, meas[:, 0] - meas[:, 1], calib.bf)
    Xp = np.zeros((n_pad, 3), np.float32)
    Mp = np.zeros((n_pad, 3), np.float32)
    Sp = np.ones((n_pad, 3), np.float32)
    Vp = np.zeros(n_pad, np.float32)
    Xp[:n], Mp[:n], Sp[:n], Vp[:n] = Xw, meas, 1.0 / sig, 1.0
    R, t = pose_only_lm(
        jnp.asarray(init.R, jnp.float32),
        jnp.asarray(init.t, jnp.float32),
        jnp.asarray(Xp),
        jnp.asarray(Mp),
        jnp.asarray(Sp),
        jnp.asarray(Vp),
        (calib.fx, calib.fy, calib.cx, calib.cy, calib.baseline),
    )
    return Pose3(np.asarray(R, np.float64), np.asarray(t, np.float64))


def test_matches_numpy_tracker_clean():
    rng = np.random.default_rng(0)
    calib = make_calib()
    true_pose = Pose3.expmap(np.array([0.02, -0.01, 0.03, 0.4, -0.1, 0.2]))
    Xw = true_pose.transform_from(rng.uniform([-4, -3, 4], [4, 3, 25], size=(50, 3)))
    meas = np.stack([stereo_project(true_pose, calib, x) for x in Xw])

    est_xla = _solve_xla(calib, Pose3(), Xw, meas)
    est_np = FrameTracker(calib).track_arrays(Pose3(), Xw, meas)
    assert np.linalg.norm(est_xla.t - true_pose.t) < 1e-3
    assert np.linalg.norm(est_xla.t - est_np.t) < 1e-3
    assert np.abs(est_xla.R - est_np.R).max() < 1e-4


def test_matches_numpy_tracker_with_outliers():
    rng = np.random.default_rng(1)
    calib = make_calib()
    true_pose = Pose3(t=np.array([0.5, 0.0, 0.1]))
    Xw = true_pose.transform_from(rng.uniform([-4, -3, 4], [4, 3, 25], size=(60, 3)))
    meas = np.stack([stereo_project(true_pose, calib, x) for x in Xw])
    meas[::6] += rng.uniform(40, 80, meas[::6].shape) * rng.choice(
        [-1, 1], meas[::6].shape
    )
    est_xla = _solve_xla(calib, Pose3(), Xw, meas)
    est_np = FrameTracker(calib).track_arrays(Pose3(), Xw, meas)
    # f32 on-device vs f64 host: same basin, centimeter agreement.
    assert np.linalg.norm(est_xla.t - est_np.t) < 2e-2


def test_padding_mask_ignored():
    """Garbage rows behind the validity mask must not change the solve."""
    rng = np.random.default_rng(2)
    calib = make_calib()
    true_pose = Pose3(t=np.array([0.3, 0.1, 0.0]))
    Xw = true_pose.transform_from(rng.uniform([-4, -3, 4], [4, 3, 20], size=(30, 3)))
    meas = np.stack([stereo_project(true_pose, calib, x) for x in Xw])
    a = _solve_xla(calib, Pose3(), Xw, meas, n_pad=64)
    b = _solve_xla(calib, Pose3(), Xw, meas, n_pad=256)
    assert np.linalg.norm(a.t - b.t) < 1e-4
