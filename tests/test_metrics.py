"""ATE/RPE/KITTI-segment metrics: exact zero on identical trajectories,
alignment invariance, and known-drift values."""

import numpy as np
import pytest

from superslam_tpu.eval.metrics import ate, kitti_segment_errors, rpe, umeyama_alignment
from superslam_tpu.geometry import Pose3


def straight(n, step=1.0):
    return [Pose3(t=np.array([step * i, 0.0, 0.0])) for i in range(n)]


def test_ate_zero_on_identical():
    traj = straight(50)
    r = ate(traj, traj)
    assert r.rmse == pytest.approx(0.0, abs=1e-12)


def test_ate_alignment_invariance():
    """A rigidly transformed trajectory has zero ATE after alignment."""
    ref = straight(50)
    T = Pose3.expmap(np.array([0.1, -0.2, 0.3, 5.0, -2.0, 1.0]))
    est = [T * p for p in ref]
    r = ate(est, ref, align=True)
    assert r.rmse == pytest.approx(0.0, abs=1e-9)
    r_noalign = ate(est, ref, align=False)
    assert r_noalign.rmse > 1.0


def test_umeyama_recovers_transform():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((30, 3))
    R_true = Pose3.expmap(np.array([0.2, 0.1, -0.3, 0, 0, 0])).R
    t_true = np.array([1.0, 2.0, 3.0])
    moved = pts @ R_true.T + t_true
    R, t, s = umeyama_alignment(pts, moved)
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)
    assert s == 1.0


def test_rpe_known_drift():
    """Estimated trajectory with 1% longer steps -> RPE ~1 cm at 1 m."""
    ref = straight(200, 1.0)
    est = straight(200, 1.01)
    r = rpe(est, ref, delta_m=1.0)
    assert r.rmse == pytest.approx(0.01, rel=0.2)


def test_kitti_segments_known_drift():
    ref = straight(1000, 1.0)
    est = straight(1000, 1.01)  # 1% scale drift
    t_rel, r_rel = kitti_segment_errors(est, ref)
    assert t_rel == pytest.approx(1.0, rel=0.05)  # 1% translational
    assert r_rel == pytest.approx(0.0, abs=1e-9)


def test_kitti_segments_short_trajectory_nan():
    t_rel, r_rel = kitti_segment_errors(straight(5), straight(5))
    assert np.isnan(t_rel) and np.isnan(r_rel)
