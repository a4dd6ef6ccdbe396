"""End-to-end facade test: real jitted SuperPoint + LightGlue (random
weights) behind the full StereoFrontEnd -> VoEstimator pipeline, driven
through the SuperSLAM facade exactly like the reference examples drive
``track_stereo`` (examples/stereo/kitti.cc:110). Accuracy is not asserted
(no pretrained weights in this environment) — the contracts are: correct
shapes, finite poses, env/YAML precedence, and trajectory/map export."""

import os

import numpy as np
import pytest

from superslam_tpu.slam import SuperSLAM

CONFIG = """
Camera.fx: 80.0
Camera.fy: 80.0
Camera.cx: 80.0
Camera.cy: 60.0
Camera.bf: 8.0
Camera.width: 160
Camera.height: 120
ThDepth: 35

SuperPoint.model_dir: "/nonexistent-weights/"
superpoint:
  max_keypoints: 128
  keypoint_threshold: 0.0005
  remove_borders: 4
lightglue:
  image_width: 160
  image_height: 120
Backend.window_size: 4
Tracking.min_matches: 10
KeyFrame.covis_ratio: 0.7
KeyFrame.max_frames: 5
"""


@pytest.fixture(scope="module")
def config_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "test.yaml"
    p.write_text(CONFIG)
    return str(p)


def synth_pair(rng, shift=4):
    """Textured random image; right = left shifted by `shift` px (disparity)."""
    left = rng.uniform(0, 255, (120, 160)).astype(np.uint8)
    right = np.roll(left, -shift, axis=1)
    return left, right


def test_stereo_facade_end_to_end(config_path, tmp_path):
    os.environ.pop("SUPERSLAM_ENABLE_LOOP", None)
    slam = SuperSLAM(config_path)
    rng = np.random.default_rng(0)
    for i in range(4):
        left, right = synth_pair(rng)
        Tcw = slam.track_stereo(left, right, 0.1 * i)
        assert Tcw.shape == (4, 4)
        assert np.isfinite(Tcw).all()

    traj_path = str(tmp_path / "traj.txt")
    slam.save_trajectory(traj_path, "kitti")
    lines = open(traj_path).read().strip().splitlines()
    assert len(lines) == 4
    assert len(lines[0].split()) == 12

    tum_path = str(tmp_path / "traj_tum.txt")
    slam.save_trajectory(tum_path, "tum")
    assert len(open(tum_path).read().strip().splitlines()) == 4

    map_path = str(tmp_path / "map.ply")
    slam.save_map(map_path)
    assert open(map_path).read().startswith("ply")
    slam.shutdown()


def test_frontend_frame_contract(config_path):
    slam = SuperSLAM(config_path)
    rng = np.random.default_rng(1)
    left, right = synth_pair(rng)
    frame = slam.frontend.process(left, right, 0.0)
    n = len(frame)
    assert n > 0  # random heatmap still yields top-K keypoints
    assert frame.keypoints_left.shape == (n, 2)
    assert frame.stereo.shape == (n, 3)
    assert frame.has_depth.shape == (n,)
    # Keypoints inside the true image bounds (not the conv padding).
    assert (frame.keypoints_left[:, 0] < 160).all()
    assert (frame.keypoints_left[:, 1] < 120).all()
    # Monocular rows carry NaN uR; stereo rows satisfy the gates.
    mono = ~frame.has_depth
    if mono.any():
        assert np.isnan(frame.stereo[mono, 1]).all()
    if frame.has_depth.any():
        disp = frame.stereo[frame.has_depth, 0] - frame.stereo[frame.has_depth, 1]
        assert (disp >= 1.0).all()
    slam.shutdown()


def test_rgbd_facade(config_path, tmp_path):
    cfg = CONFIG + "\nDepthMapFactor: 5000.0\n"
    p = tmp_path / "rgbd.yaml"
    p.write_text(cfg)
    slam = SuperSLAM(str(p))
    rng = np.random.default_rng(2)
    for i in range(3):
        gray = rng.uniform(0, 255, (120, 160)).astype(np.uint8)
        depth = (rng.uniform(0.5, 3.0, (120, 160)) * 5000).astype(np.uint16)
        Tcw = slam.track_rgbd(gray, depth, 0.1 * i)
        assert np.isfinite(Tcw).all()
    slam.shutdown()


def test_env_overrides_yaml(config_path):
    """Env var set before construction must win over the YAML value."""
    os.environ["SUPERSLAM_TRACK_MIN_MATCHES"] = "42"
    try:
        SuperSLAM(config_path)
        assert os.environ["SUPERSLAM_TRACK_MIN_MATCHES"] == "42"
    finally:
        del os.environ["SUPERSLAM_TRACK_MIN_MATCHES"]


def test_stereo_facade_with_loop_closure_enabled(config_path, monkeypatch, tmp_path):
    """SUPERSLAM_ENABLE_LOOP wires EigenPlaces + a dedicated loop matcher and
    the async worker; with random weights no loop fires, but the whole path
    (global descriptor compute, keyframe DB, worker drain) must run clean."""
    cfg = CONFIG + """
loop:
  image_width: 128
  image_height: 128
  min_inliers: 8
  min_score: 0.5
"""
    p = tmp_path / "loop.yaml"
    p.write_text(cfg)
    monkeypatch.setenv("SUPERSLAM_ENABLE_LOOP", "1")
    monkeypatch.setenv("SUPERSLAM_PIPELINE", "0")  # sync: deterministic drain
    slam = SuperSLAM(str(p))
    assert slam.loop_enabled
    rng = np.random.default_rng(7)
    for i in range(5):
        left, right = synth_pair(rng)
        Tcw = slam.track_stereo(left, right, 0.1 * i)
        assert np.isfinite(Tcw).all()
    slam.estimator.stop_loop_worker()
    # Keyframes were indexed in the loop database with global descriptors.
    db = slam.estimator._loop_closer.db
    assert len(db) >= 1
    rec = db.records()[0]
    assert rec.global_descriptor is not None
    assert np.isfinite(rec.global_descriptor).all()
    # Device-capable matcher: the record keeps descriptors in HBM
    # (PaddedFeatures); host rows are one materialization away.
    from superslam_tpu.frontend.features import host_descriptors

    assert host_descriptors(rec.descriptors_left).shape[1] == 256
    slam.shutdown()


def test_device_tracking_with_async_loop_worker(config_path, tmp_path, monkeypatch):
    """Device tracking + the async loop worker together: keyframe grays must
    thread through the pipelined in-flight records into the worker, the
    worker must index every keyframe, and shutdown must drain cleanly while
    pose solves stay on the chip."""
    cfg = CONFIG + """
loop:
  image_width: 64
  image_height: 64
  min_inliers: 8
  min_score: 0.5
"""
    p = tmp_path / "loop_dev.yaml"
    p.write_text(cfg)
    monkeypatch.setenv("SUPERSLAM_ENABLE_LOOP", "1")
    monkeypatch.setenv("SUPERSLAM_PIPELINE", "2")
    monkeypatch.setenv("SUPERSLAM_DEVICE_TRACKER", "1")
    slam = SuperSLAM(str(p))
    assert slam.loop_enabled and slam._tracker.device_tracking
    rng = np.random.default_rng(8)
    base = rng.uniform(0, 255, (140, 180)).astype(np.uint8)
    for i in range(8):
        left = base[i : i + 120, 2 * i : 2 * i + 160]
        Tcw = slam.track_stereo(left, np.roll(left, -4, axis=1), 0.1 * i)
        assert np.isfinite(Tcw).all()
    slam._tracker.flush()
    slam.estimator.stop_loop_worker()
    db = slam.estimator._loop_closer.db
    assert len(db) >= 1
    assert all(r.global_descriptor is not None for r in db.records())
    slam.shutdown()


def test_rgbd_pipelined_matches_synchronous(config_path, tmp_path, monkeypatch):
    """The pipelined RGB-D tracker (default) must produce the same corrected
    trajectory as the synchronous path (SUPERSLAM_PIPELINE=0)."""
    cfg = CONFIG + "\nDepthMapFactor: 5000.0\n"
    p = tmp_path / "rgbd.yaml"
    p.write_text(cfg)
    rng = np.random.default_rng(4)
    base = rng.uniform(0, 255, (152, 192)).astype(np.uint8)
    dbase = (rng.uniform(0.5, 3.0, (152, 192)) * 5000).astype(np.uint16)
    seq = []
    for i in range(6):
        seq.append(
            (
                base[i : i + 120, 2 * i : 2 * i + 160],
                dbase[i : i + 120, 2 * i : 2 * i + 160],
            )
        )

    def run(pipeline_env):
        monkeypatch.setenv("SUPERSLAM_PIPELINE", pipeline_env)
        monkeypatch.setenv("SUPERSLAM_PIPELINE_BATCH", "2")
        slam = SuperSLAM(str(p))
        for i, (g, d) in enumerate(seq):
            slam.track_rgbd(g, d, 0.1 * i)
        if slam._tracker is not None:
            slam._tracker.flush()
        slam.estimator.stop_loop_worker()
        traj = slam.estimator.corrected_trajectory()
        slam.shutdown()
        return traj

    sync = run("0")
    piped = run("3")
    assert len(sync) == len(piped) == len(seq)
    for a, b in zip(sync, piped):
        assert np.linalg.norm(a.t - b.t) < 0.2


def test_rgbd_device_tracking_with_distortion(config_path, tmp_path, monkeypatch):
    """Distorted RGB-D calibration: the fused program undistorts the frame
    keypoints ON DEVICE (radtan fixed-point, ops.rgbd_step) so the mono
    solve runs in the same coordinates as the host estimator — the
    trajectories must agree and no solve may fall back to the host after
    warm-up."""
    cfg = CONFIG + "\nDepthMapFactor: 5000.0\nCamera.k1: -0.2\nCamera.k2: 0.05\n"
    p = tmp_path / "rgbd_dist.yaml"
    p.write_text(cfg)
    rng = np.random.default_rng(6)
    base = rng.uniform(0, 255, (152, 192)).astype(np.uint8)
    dbase = (rng.uniform(0.5, 3.0, (152, 192)) * 5000).astype(np.uint16)
    seq = [
        (base[i : i + 120, 2 * i : 2 * i + 160],
         dbase[i : i + 120, 2 * i : 2 * i + 160])
        for i in range(10)
    ]

    def run(device_tracker):
        monkeypatch.setenv("SUPERSLAM_PIPELINE", "2")
        monkeypatch.setenv("SUPERSLAM_PIPELINE_BATCH", "1")
        monkeypatch.setenv("SUPERSLAM_DEVICE_TRACKER", device_tracker)
        monkeypatch.setenv("SUPERSLAM_TRACK_MIN_MATCHES", "2")
        slam = SuperSLAM(str(p))
        assert slam.rgbd_pipeline.dist_coeffs is not None
        host_solves = []
        orig = slam.estimator.tracker.track_arrays
        slam.estimator.tracker.track_arrays = (
            lambda *a, **k: host_solves.append(1) or orig(*a, **k)
        )
        for i, (g, d) in enumerate(seq):
            slam.track_rgbd(g, d, 0.1 * i)
        slam._tracker.flush()
        slam.estimator.stop_loop_worker()
        traj = slam.estimator.corrected_trajectory()
        slam.shutdown()
        return traj, host_solves

    host_traj, host_solves = run("0")
    dev_traj, dev_solves = run("1")
    assert len(dev_solves) <= 2, dev_solves  # warm-up fallback only
    assert len(host_traj) == len(dev_traj) == len(seq)
    for a, b in zip(host_traj, dev_traj):
        assert np.linalg.norm(a.t - b.t) < 0.2


def test_rgbd_device_tracking_matches_host(config_path, tmp_path, monkeypatch):
    """SUPERSLAM_DEVICE_TRACKER on the RGB-D path: the mono-factor on-device
    solve replaces the host FrameTracker (zero host solves) and the
    trajectory stays close to the host-solved pipelined run. Mono (uL, v)
    vs stereo (uL, uR, v) weighting differ, so the tolerance is looser than
    the stereo device-tracking test's."""
    cfg = CONFIG + "\nDepthMapFactor: 5000.0\n"
    p = tmp_path / "rgbd.yaml"
    p.write_text(cfg)
    rng = np.random.default_rng(4)
    base = rng.uniform(0, 255, (152, 192)).astype(np.uint8)
    dbase = (rng.uniform(0.5, 3.0, (152, 192)) * 5000).astype(np.uint16)
    seq = [
        (base[i : i + 120, 2 * i : 2 * i + 160],
         dbase[i : i + 120, 2 * i : 2 * i + 160])
        for i in range(10)
    ]

    def run(device_tracker):
        monkeypatch.setenv("SUPERSLAM_PIPELINE", "2")
        monkeypatch.setenv("SUPERSLAM_PIPELINE_BATCH", "1")
        monkeypatch.setenv("SUPERSLAM_DEVICE_TRACKER", device_tracker)
        # Random-weight matches are sparse; drop the coast floor so the
        # solve path actually runs in both modes.
        monkeypatch.setenv("SUPERSLAM_TRACK_MIN_MATCHES", "2")
        slam = SuperSLAM(str(p))
        host_solves = []
        orig = slam.estimator.tracker.track_arrays
        slam.estimator.tracker.track_arrays = (
            lambda *a, **k: host_solves.append(1) or orig(*a, **k)
        )
        for i, (g, d) in enumerate(seq):
            slam.track_rgbd(g, d, 0.1 * i)
        slam._tracker.flush()
        slam.estimator.stop_loop_worker()
        traj = slam.estimator.corrected_trajectory()
        slam.shutdown()
        return traj, host_solves

    host_traj, host_solves = run("0")
    assert host_solves  # the host path does solve on host
    dev_traj, dev_solves = run("1")
    # Pipeline warm-up frames (dispatched before the first keyframe's device
    # state exists) legitimately fall back to a host re-match + solve; every
    # frame after that must stay on the chip.
    assert len(dev_solves) <= 2, dev_solves
    assert len(dev_solves) < len(host_solves)
    assert len(host_traj) == len(dev_traj) == len(seq)
    for a, b in zip(host_traj, dev_traj):
        assert np.linalg.norm(a.t - b.t) < 0.2
