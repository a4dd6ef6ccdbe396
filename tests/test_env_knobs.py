"""Reference env-var inventory behavior (SURVEY §5.6): the knobs must be
read at use-site with the documented precedence and semantics."""

import numpy as np
import pytest

from superslam_tpu.core.factors import stereo_diag_sigmas
from superslam_tpu.core.vo_estimator import VoEstimator
from superslam_tpu.core.window_smoother import WindowSmoother
from superslam_tpu.geometry import Pose3

from helpers import IdentityMatcher, make_calib, make_frame, world_landmarks


def test_ws_window_env_overrides_arg(monkeypatch):
    calib = make_calib()
    monkeypatch.setenv("SUPERSLAM_WS_WINDOW", "3")
    vo = VoEstimator(IdentityMatcher(4), calib, window_size=10)
    assert vo.smoother.window_size == 3
    monkeypatch.delenv("SUPERSLAM_WS_WINDOW")
    vo = VoEstimator(IdentityMatcher(4), calib, window_size=10)
    assert vo.smoother.window_size == 10
    vo = VoEstimator(IdentityMatcher(4), calib, window_size=0)
    assert vo.smoother.window_size == 8  # built-in default


def test_disp_sigma_env(monkeypatch):
    calib = make_calib()
    base = stereo_diag_sigmas(10.0, np.array([50.0]), calib.bf)[0, 1]
    monkeypatch.setenv("SUPERSLAM_DISP_SIGMA_PX", "16.0")
    doubled = stereo_diag_sigmas(10.0, np.array([50.0]), calib.bf)[0, 1]
    assert doubled == pytest.approx(2 * base, rel=1e-6)


def test_vo_no_smoother_env(monkeypatch):
    """SUPERSLAM_VO_NO_SMOOTHER skips the window solve on keyframes."""
    calib = make_calib()
    lms = world_landmarks()
    called = []

    monkeypatch.setenv("SUPERSLAM_VO_NO_SMOOTHER", "1")
    vo = VoEstimator(IdentityMatcher(len(lms)), calib)
    vo.smoother.optimize = lambda: called.append(1)
    for i in range(5):
        vo.track(make_frame(Pose3(t=np.array([0.4 * i, 0, 0])), lms, calib, 0.1 * i))
    assert not called

    monkeypatch.delenv("SUPERSLAM_VO_NO_SMOOTHER")
    vo2 = VoEstimator(IdentityMatcher(len(lms)), calib)
    vo2.smoother.optimize = lambda: called.append(1)
    for i in range(5):
        vo2.track(make_frame(Pose3(t=np.array([0.4 * i, 0, 0])), lms, calib, 0.1 * i))
    assert called  # keyframes fired the window solve


def test_track_min_matches_env(monkeypatch):
    """Raising the floor forces constant-velocity coasting even with matches."""
    calib = make_calib()
    lms = world_landmarks()  # 16 landmarks
    monkeypatch.setenv("SUPERSLAM_TRACK_MIN_MATCHES", "100")
    vo = VoEstimator(IdentityMatcher(len(lms)), calib)
    step = np.array([0.4, 0.0, 0.0])
    poses = [vo.track(make_frame(Pose3(t=step * i), lms, calib, 0.1 * i)) for i in range(4)]
    # With 16 < 100 matches every frame coasts on zero velocity from origin.
    assert poses[1].translation_norm() < 1e-9


def test_smart_sigma_env_is_read(monkeypatch):
    calib = make_calib()
    sm = WindowSmoother(calib, 4)
    monkeypatch.setenv("SUPERSLAM_SMART_SIGMA_PX", "abc-not-a-float")
    # Robustness: a malformed value falls back to the default, no crash.
    from superslam_tpu.utils.env import env_float

    assert env_float("SUPERSLAM_SMART_SIGMA_PX", 1.0) == 1.0
