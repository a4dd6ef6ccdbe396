"""Viewer fallback recorder: trajectory + scalar accumulation and the
matplotlib plot on close, plus the SDK branch exercised against a mock of
the rerun 0.22 API surface (the real SDK is absent in this environment —
zero egress — so real-SDK behavior stays unverified; COMPONENTS.md says so)."""

import sys
import types

import numpy as np

from superslam_tpu.core.frame import StereoFrame
from superslam_tpu.geometry import Pose3

from helpers import make_calib


def _mock_rerun(calls):
    """A stand-in exposing exactly the rerun 0.22 names the viewer uses
    (init/save/spawn/log_static/set_time_sequence/log + SeriesLine/
    LineStrips3D/Points3D/TextLog/Scalar), recording every call."""
    rr = types.ModuleType("rerun")

    def rec(name):
        def f(*a, **k):
            calls.append((name, a, k))
        return f

    for fn in ("init", "save", "spawn", "log_static", "set_time_sequence", "log"):
        setattr(rr, fn, rec(fn))
    for cls in ("SeriesLine", "LineStrips3D", "Points3D", "TextLog", "Scalar"):
        setattr(rr, cls, rec(cls))
    return rr


def test_sdk_branch_call_sequence(tmp_path, monkeypatch):
    """With an importable rerun module, the viewer must take the SDK branch
    end-to-end: init + headless .rrd save (SUPERSLAM_RRD, the reference's
    RerunViewer.cc:16-22 mode), static series registration, and per-frame
    trajectory/cloud/scalar/text logging — never the matplotlib fallback."""
    calls = []
    monkeypatch.setitem(sys.modules, "rerun", _mock_rerun(calls))
    monkeypatch.setenv("SUPERSLAM_RRD", str(tmp_path / "run.rrd"))
    from superslam_tpu.io.viewer import RerunViewer

    v = RerunViewer()
    assert ("init", ("superslam_tpu",), {}) in calls
    assert any(c[0] == "save" for c in calls)  # headless, not spawn
    assert not any(c[0] == "spawn" for c in calls)
    assert sum(c[0] == "log_static" for c in calls) == 2  # the two series

    calib = make_calib()
    n = 3
    frame = StereoFrame(
        keypoints_left=np.zeros((n, 2), np.float32),
        stereo=np.array([[320.0, 300.0, 240.0]] * n),
        has_depth=np.ones(n, bool),
    )
    v.draw_frame(frame, Pose3(t=np.array([1.0, 0, 0])), calib)
    v.plot("loop_deep_score", 0.7)
    v.log_info("loop", "accepted")
    v.close()

    paths = [c[1][0] for c in calls if c[0] == "log"]
    assert "world/trajectory" in paths and "world/cloud" in paths
    assert "plots/loop_deep_score" in paths and "logs/loop" in paths
    assert ("set_time_sequence", ("frame", 1), {}) in calls
    # SDK active -> close() must not write the fallback plot.
    assert not list(tmp_path.glob("*.png"))


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
