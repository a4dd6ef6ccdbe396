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


def test_facade_streams_scalar_series(tmp_path, monkeypatch):
    """With a viewer attached, the facade plots the reference's two scalar
    series (RerunViewer.cc:33-41) from the live estimator every frame."""
    import json

    monkeypatch.setenv("SUPERSLAM_VIEWER_PLOT", str(tmp_path / "traj.png"))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "\n".join(
            [
                "Camera.fx: 80.0",
                "Camera.fy: 80.0",
                "Camera.cx: 80.0",
                "Camera.cy: 60.0",
                "Camera.bf: 8.0",
                "Camera.width: 160",
                "Camera.height: 120",
                "superpoint:",
                "  max_keypoints: 96",
                "  keypoint_threshold: 0.0005",
                "lightglue:",
                "  image_width: 160",
                "  image_height: 120",
                "Backend.window_size: 4",
            ]
        )
    )
    from superslam_tpu.slam import SuperSLAM

    slam = SuperSLAM(str(cfg), use_viewer=True)
    assert slam.viewer is not None
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (152, 192)).astype(np.uint8)
    for i in range(3):
        left = base[i : i + 120, 2 * i : 2 * i + 160]
        slam.track_stereo(left, np.roll(left, -4, axis=1), 0.1 * i)
    series = slam.viewer._scalars
    assert "frontend_inlier_ratio" in series
    assert len(series["frontend_inlier_ratio"]) == 3
    vals = [v for _, v in series["frontend_inlier_ratio"]]
    assert all(0.0 <= v <= 1.0 for v in vals)
    slam.shutdown()
