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


def _structured_outlier_problem(frac=0.35, n=80, seed=13):
    """True pose + matches where `frac` are coherent MISmatches: the
    measurement belongs to a different landmark (the failure mode LightGlue
    produces at keyframe gaps — not gross noise, a consistent wrong
    geometry that Huber alone cannot reject)."""
    rng = np.random.default_rng(seed)
    calib = make_calib()
    true_pose = Pose3.expmap(np.array([0.01, 0.02, -0.01, 0.3, -0.05, 0.1]))
    Xw = true_pose.transform_from(
        rng.uniform([-4, -3, 4], [4, 3, 25], size=(n, 3))
    )
    meas = np.stack([stereo_project(true_pose, calib, x) for x in Xw])
    n_bad = int(frac * n)
    bad = rng.choice(n, n_bad, replace=False)
    # Each bad row measures a DIFFERENT landmark's projection.
    src = (bad + n // 2) % n
    meas[bad] = meas[src]
    return calib, true_pose, Xw, meas


def test_track_gated_survives_structured_outliers():
    """35% coherent mismatches: the plain Huber LM lands far from the true
    pose; the prior-gated solve (track_gated) recovers it to millimetres.
    This is the measured rendered-world failure the gate exists for."""
    calib, true_pose, Xw, meas = _structured_outlier_problem()
    tracker = FrameTracker(calib)
    pred = Pose3()  # cold prediction, ~0.3 m from truth

    plain = tracker.track_arrays(pred, Xw, meas)
    gated, keep = tracker.track_gated(pred, Xw, meas)

    e_plain = np.linalg.norm(plain.t - true_pose.t)
    e_gated = np.linalg.norm(gated.t - true_pose.t)
    assert e_gated < 5e-3, e_gated
    assert e_gated < 0.2 * max(e_plain, 1e-9), (e_plain, e_gated)
    # The kept set excludes every mismatch (their reprojection at the true
    # pose is tens of px off).
    r_true = np.linalg.norm(
        np.stack([stereo_project(true_pose, calib, x) for x in Xw]) - meas,
        axis=1,
    )
    assert not keep[r_true > 5.0].any()


def test_track_gated_falls_back_when_gate_starves():
    """A prediction so wrong the gate would keep nothing must fall back to
    the full set (never solve on < min_keep matches)."""
    calib, true_pose, Xw, meas = _structured_outlier_problem(frac=0.0)
    tracker = FrameTracker(calib)
    far = Pose3(t=np.array([50.0, 0.0, 0.0]))  # every residual >> gate_px
    pose, keep = tracker.track_gated(far, Xw, meas, gate_px=10.0)
    assert keep.sum() >= 10
    assert np.isfinite(pose.t).all()


def test_track_gated_clean_data_matches_plain():
    """With zero outliers and a good prediction the gate must be a no-op:
    same optimum as the plain solve."""
    calib, true_pose, Xw, meas = _structured_outlier_problem(frac=0.0)
    tracker = FrameTracker(calib)
    pred = true_pose  # perfect prediction
    plain = tracker.track_arrays(pred, Xw, meas)
    gated, keep = tracker.track_gated(pred, Xw, meas)
    assert keep.all()
    np.testing.assert_allclose(gated.t, plain.t, atol=1e-8)
    np.testing.assert_allclose(gated.R, plain.R, atol=1e-8)


def test_track_gated_rescue_beats_self_confirming_gate():
    """The gate's own failure mode: when the PREDICTION is wrong and a
    coherent minority of matches agrees with it (post-coast frames), the
    gate keeps exactly that minority and the chi2 rounds self-confirm the
    wrong pose. The rescue must notice the result explains few of the full
    set and return the ungated majority solve instead (this latched a
    rendered-circuit run into a permanent coast spiral, ATE 1.8 -> 11.9 m)."""
    rng = np.random.default_rng(21)
    calib = make_calib()
    true_pose = Pose3(t=np.array([0.2, 0.0, 0.1]))
    pred = Pose3(t=np.array([1.4, 0.0, 0.1]))  # poisoned velocity carry
    Xw = true_pose.transform_from(
        rng.uniform([-4, -3, 4], [4, 3, 25], size=(80, 3))
    )
    meas = np.stack([stereo_project(true_pose, calib, x) for x in Xw])
    # 40% of rows agree with the WRONG prediction instead.
    bad = rng.choice(80, 32, replace=False)
    for i in bad:
        meas[i] = stereo_project(pred, calib, Xw[i])

    tracker = FrameTracker(calib)
    pose, keep = tracker.track_gated(pred, Xw, meas, init=pred)
    assert np.linalg.norm(pose.t - true_pose.t) < 5e-2, pose.t
    # And the winning kept set is the true-majority one.
    good = np.ones(80, bool)
    good[bad] = False
    assert keep[good].sum() > keep[~good].sum()


def test_track_gated_rescue_keeps_gated_result_on_real_outliers():
    """On the scenario the gate EXISTS for (good prediction, structured
    outliers) the rescue must not undo it: the gated pose explains the
    honest majority and wins the support comparison."""
    calib, true_pose, Xw, meas = _structured_outlier_problem()
    tracker = FrameTracker(calib)
    gated, _ = tracker.track_gated(Pose3(), Xw, meas)
    assert np.linalg.norm(gated.t - true_pose.t) < 5e-3


def test_reproj_support_counts_explained_matches():
    rng = np.random.default_rng(22)
    calib = make_calib()
    true_pose = Pose3(t=np.array([0.3, 0.1, 0.0]))
    Xw = true_pose.transform_from(
        rng.uniform([-4, -3, 4], [4, 3, 25], size=(50, 3))
    )
    meas = np.stack([stereo_project(true_pose, calib, x) for x in Xw])
    meas[:10] += 100.0  # 10 unexplained rows
    tracker = FrameTracker(calib)
    assert tracker.reproj_support(true_pose, Xw, meas, 4.0) == 40
    far = Pose3(t=np.array([30.0, 0.0, 0.0]))
    assert tracker.reproj_support(far, Xw, meas, 4.0) < 5
