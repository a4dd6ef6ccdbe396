"""FrameTracker recovers a known pose (mirrors tests/test_frame_tracker.cc)."""

import numpy as np

from superslam_tpu.core.frame_tracker import FrameTracker, PointObs
from superslam_tpu.geometry import Pose3, stereo_project

from helpers import make_calib


def test_recovers_known_pose():
    rng = np.random.default_rng(11)
    calib = make_calib()
    true_pose = Pose3.expmap(np.array([0.02, -0.01, 0.03, 0.4, -0.1, 0.2]))
    Xw = true_pose.transform_from(
        rng.uniform([-4, -3, 4], [4, 3, 25], size=(40, 3))
    )
    obs = [PointObs(x, stereo_project(true_pose, calib, x)) for x in Xw]

    est = FrameTracker(calib).track(Pose3(), obs)
    np.testing.assert_allclose(est.t, true_pose.t, atol=1e-4)
    np.testing.assert_allclose(est.R, true_pose.R, atol=1e-5)


def test_robust_to_outliers():
    rng = np.random.default_rng(12)
    calib = make_calib()
    true_pose = Pose3(t=np.array([0.5, 0.0, 0.1]))
    Xw = true_pose.transform_from(
        rng.uniform([-4, -3, 4], [4, 3, 25], size=(60, 3))
    )
    obs = []
    for i, x in enumerate(Xw):
        m = stereo_project(true_pose, calib, x)
        if i % 6 == 0:  # ~17% gross outliers
            m = m + rng.uniform(40, 80, size=3) * rng.choice([-1, 1], size=3)
        obs.append(PointObs(x, m))
    est = FrameTracker(calib).track(Pose3(), obs)
    # Huber bounds the damage: without robustness 17% gross outliers at
    # 40-80 px would pull the solve off by metres, not centimetres.
    assert np.linalg.norm(est.t - true_pose.t) < 0.15


def test_empty_matches_returns_seed():
    calib = make_calib()
    seed = Pose3(t=np.array([1.0, 2.0, 3.0]))
    est = FrameTracker(calib).track(seed, [])
    np.testing.assert_allclose(est.t, seed.t)
