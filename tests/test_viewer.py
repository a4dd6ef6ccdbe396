"""Viewer fallback recorder: trajectory + scalar accumulation and the
matplotlib plot on close (the rerun SDK is absent in this environment)."""

import numpy as np

from superslam_tpu.core.frame import StereoFrame
from superslam_tpu.geometry import Pose3

from helpers import make_calib


def test_viewer_records_and_plots(tmp_path, monkeypatch):
    monkeypatch.setenv("SUPERSLAM_VIEWER_PLOT", str(tmp_path / "traj.png"))
    from superslam_tpu.io.viewer import RerunViewer

    v = RerunViewer()
    calib = make_calib()
    for i in range(5):
        n = 3
        frame = StereoFrame(
            keypoints_left=np.zeros((n, 2), np.float32),
            stereo=np.array([[320.0, 300.0, 240.0]] * n),
            has_depth=np.ones(n, bool),
        )
        v.draw_frame(frame, Pose3(t=np.array([0.1 * i, 0, 0])), calib)
        v.plot("loop_score", 0.5 + 0.01 * i)
    v.log_info("test", "hello")
    v.close()
    out = tmp_path / "traj.png"
    assert out.exists() and out.stat().st_size > 1000
