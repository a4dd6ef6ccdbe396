"""Long-run stability: 120 frames of synthetic VO through the device-free
core — window eviction, keyframe cadence, landmark id growth, and anchor
bookkeeping must stay consistent and bounded."""

import numpy as np

from superslam_tpu.core.vo_estimator import VoEstimator
from superslam_tpu.geometry import Pose3

from helpers import IdentityMatcher, make_calib, make_frame


def test_120_frame_forward_run():
    rng = np.random.default_rng(0)
    calib = make_calib()
    # A long corridor: landmarks regenerated ahead of the camera would break
    # the identity matcher, so use a wide far wall visible throughout.
    lms = rng.uniform([-30, -20, 60], [30, 20, 90], size=(40, 3))
    vo = VoEstimator(IdentityMatcher(len(lms)), calib, window_size=5)

    gt = [Pose3(t=np.array([0.0, 0.0, 0.25 * i])) for i in range(120)]
    for i, g in enumerate(gt):
        pose = vo.track(make_frame(g, lms, calib, 0.1 * i))
        assert pose.is_finite()

    traj = vo.corrected_trajectory()
    assert len(traj) == 120
    # Fixed-lag bookkeeping: the window never exceeds its size, old
    # keyframes are evicted, ids keep growing.
    assert vo.smoother.window_count() <= 5
    # Rich matching -> keyframes only at the max_frames=20 parallax cap.
    assert vo._next_keyframe_id >= 6
    assert not vo.smoother.in_window(0)
    # Drift stays small on perfect synthetic data.
    err = np.linalg.norm(traj[-1].t - gt[-1].t)
    assert err < 0.5, f"drift {err}"
    # Every frame has a seed anchor for its reference keyframe.
    for ref_kf, _ in vo._frame_records:
        assert ref_kf in vo._seed_anchors
