"""WindowSmoother recovers known poses + metric scale from perturbed seeds
(mirrors tests/test_window_smoother.cc), plus fixed-lag bookkeeping."""

import numpy as np

from superslam_tpu.core.window_smoother import StereoObs, WindowSmoother
from superslam_tpu.geometry import Pose3, stereo_project

from helpers import make_calib


def make_world(rng, n=60):
    return rng.uniform([-6, -4, 5], [6, 4, 30], size=(n, 3))


def observe(pose, lms, calib):
    obs = []
    for lm_id, X in enumerate(lms):
        try:
            m = stereo_project(pose, calib, X)
        except Exception:
            continue
        obs.append(StereoObs(lm_id, m))
    return obs


def test_recovers_poses_and_scale():
    """Mirror of tests/test_window_smoother.cc: 4 keyframes at 1 m spacing,
    6 landmarks at 7-12 m, later keyframes seeded with one shared perturbed
    offset (Rz(0.02), t=(0.1,-0.05,0.08)) the smoother must correct."""
    calib = make_calib()
    gt = [Pose3(t=np.array([float(i), 0.0, 0.0])) for i in range(4)]
    lms = np.array(
        [[0, 0, 8], [2, 1, 10], [-1, -1, 7], [3, 2, 12], [1, -2, 9], [-2, 1, 11]],
        dtype=float,
    )
    offset = Pose3.expmap(np.array([0.0, 0.0, 0.02, 0.1, -0.05, 0.08]))

    sm = WindowSmoother(calib, window_size=4)
    for k, tp in enumerate(gt):
        seed = tp if k == 0 else tp * offset
        sm.add_keyframe(k, seed, observe(tp, lms, calib))
    sm.optimize()

    assert sm.window_count() == 4
    # Metric scale: distance KF0->KF3 must be ~3 m (not drifted).
    d = np.linalg.norm(sm.pose_of(3).t - sm.pose_of(0).t)
    assert abs(d - 3.0) < 0.05
    for k, tp in enumerate(gt):
        est = sm.pose_of(k)
        assert np.linalg.norm(est.t - tp.t) < 0.05, f"kf {k}: {est.t} vs {tp.t}"
        assert np.abs(est.R - tp.R).max() < 0.05


def test_fixed_lag_drops_oldest():
    calib = make_calib()
    sm = WindowSmoother(calib, window_size=3)
    for i in range(5):
        sm.add_keyframe(i, Pose3(t=np.array([float(i), 0, 0])), [])
    assert sm.window_count() == 3
    assert not sm.in_window(0) and not sm.in_window(1)
    assert sm.in_window(2) and sm.in_window(4)


def test_single_keyframe_noop():
    calib = make_calib()
    sm = WindowSmoother(calib, window_size=8)
    sm.add_keyframe(0, Pose3(), [StereoObs(0, np.array([320.0, 295.0, 240.0]))])
    sm.optimize()  # needs parallax; must not throw
    assert sm.pose_of(0).translation_norm() == 0.0


def test_divergence_keeps_previous_poses():
    """Garbage observations must not corrupt the seeded poses."""
    rng = np.random.default_rng(22)
    calib = make_calib()
    sm = WindowSmoother(calib, window_size=8)
    seeds = [Pose3(t=np.array([0.5 * i, 0, 0])) for i in range(3)]
    for i, s in enumerate(seeds):
        obs = [
            StereoObs(j, rng.uniform([0, -2000, 0], [640, 0, 480]))
            for j in range(10)
        ]
        sm.add_keyframe(i, s, obs)
    sm.optimize()
    for i, s in enumerate(seeds):
        p = sm.pose_of(i)
        assert p.is_finite()
        assert p.translation_norm() < 1e6


def test_xla_smoother_matches_numpy(monkeypatch):
    """SUPERSLAM_XLA_SMOOTHER=1 routes optimize() through the on-device
    solve_window; the recovered window must match the numpy oracle."""
    calib = make_calib()
    gt = [Pose3(t=np.array([float(i), 0.0, 0.0])) for i in range(4)]
    lms = np.array(
        [[0, 0, 8], [2, 1, 10], [-1, -1, 7], [3, 2, 12], [1, -2, 9], [-2, 1, 11]],
        dtype=float,
    )
    offset = Pose3.expmap(np.array([0.0, 0.0, 0.02, 0.1, -0.05, 0.08]))

    def run():
        sm = WindowSmoother(calib, window_size=4)
        for k, tp in enumerate(gt):
            seed = tp if k == 0 else tp * offset
            sm.add_keyframe(k, seed, observe(tp, lms, calib))
        sm.optimize()
        return [sm.pose_of(k) for k in range(4)]

    monkeypatch.delenv("SUPERSLAM_XLA_SMOOTHER", raising=False)
    ref = run()
    monkeypatch.setenv("SUPERSLAM_XLA_SMOOTHER", "1")
    got = run()
    for a, b in zip(ref, got):
        assert np.linalg.norm(a.t - b.t) < 0.02
        assert np.abs(a.R - b.R).max() < 0.02
        # both recover ground truth
    for k, tp in enumerate(gt):
        assert np.linalg.norm(got[k].t - tp.t) < 0.05
