"""Fused pipeline correctness: the one-dispatch fused program must produce
the same frames and matches as the unfused StereoFrontEnd + matcher path,
and the pipelined tracker must produce the same trajectory as synchronous
tracking."""

import numpy as np
import pytest

from superslam_tpu.core.vo_estimator import VoEstimator
from superslam_tpu.frontend.extractor import SuperPointExtractor
from superslam_tpu.frontend.fused import FusedStereoPipeline
from superslam_tpu.frontend.matcher import LightGlueMatcher
from superslam_tpu.frontend.pipelined import PipelinedStereoTracker
from superslam_tpu.frontend.stereo_frontend import StereoFrontEnd
from superslam_tpu.geometry import StereoCalib
from superslam_tpu.models.lightglue import init_lightglue_params
from superslam_tpu.models.superpoint import init_superpoint_params

W, H, K = 160, 120, 128


@pytest.fixture(scope="module")
def setup():
    calib = StereoCalib(fx=80.0, fy=80.0, cx=80.0, cy=60.0, baseline=0.1)
    sp = init_superpoint_params(0)
    lg = init_lightglue_params(0)
    fused = FusedStereoPipeline(
        sp, lg, calib, width=W, height=H, max_keypoints=K, keypoint_threshold=5e-4
    )
    extractor = SuperPointExtractor(
        sp, width=W, height=H, max_keypoints=K, keypoint_threshold=5e-4
    )
    matcher = LightGlueMatcher(lg, image_width=W, image_height=H, max_keypoints=K)
    unfused = StereoFrontEnd(extractor, matcher, calib)
    return calib, fused, unfused, matcher


def frames(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (H + 32, W + 32)).astype(np.float32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3
    out = []
    for i in range(n):
        left = base[i % 32 : i % 32 + H, (2 * i) % 32 : (2 * i) % 32 + W].astype(
            np.uint8
        )
        out.append((left, np.roll(left, -4, axis=1)))
    return out


def test_fused_matches_unfused_frontend(setup):
    calib, fused, unfused, _ = setup
    left, right = frames(1)[0]
    f_fused, _ = fused.process(left, right, 0.0)
    f_ref = unfused.process(left, right, 0.0)

    assert len(f_fused) == len(f_ref)
    # The fused path's packed readback is 1/16 px fixed point (sub-pixel
    # refined keypoints); the unfused path returns full-precision floats.
    np.testing.assert_allclose(
        f_fused.keypoints_left, f_ref.keypoints_left, atol=1 / 32 + 1e-6
    )
    np.testing.assert_array_equal(f_fused.has_depth, f_ref.has_depth)
    d = f_fused.has_depth
    np.testing.assert_allclose(
        f_fused.stereo[d], f_ref.stereo[d], atol=1 / 16 + 1e-3
    )


def test_fused_track_matches_equal_matcher(setup):
    """The fused program's KF track-match must equal the standalone matcher
    on the same feature sets."""
    calib, fused, unfused, matcher = setup
    seq = frames(2)
    f0, _ = fused.process(*seq[0], 0.0)
    fused.set_keyframe(f0.descriptors_left)
    f1, kf_matches = fused.process(*seq[1], 0.1)

    ref = matcher.match(
        f0.keypoints_left, f0.descriptors_left, f1.keypoints_left, f1.descriptors_left
    )
    # Index pairs must agree exactly; confidences are not transferred by the
    # int16 packed readback (nothing downstream consumes them).
    np.testing.assert_array_equal(kf_matches.matches, ref.matches)


def test_pipelined_trajectory_equals_synchronous(setup):
    calib, fused, unfused, matcher = setup
    seq = frames(6, seed=3)

    # Synchronous reference run.
    fused_a = FusedStereoPipeline(
        fused.sp_params, fused.lg_params, calib, width=W, height=H,
        max_keypoints=K, keypoint_threshold=5e-4,
    )
    est_a = VoEstimator(matcher, calib, window_size=4)
    for i, (l, r) in enumerate(seq):
        frame, m = fused_a.process(l, r, 0.1 * i)
        est_a.track(frame, kf_matches=m)
        if est_a._last_keyframe is frame:
            fused_a.set_keyframe(frame.descriptors_left)

    # Pipelined run (depth 2).
    fused_b = FusedStereoPipeline(
        fused.sp_params, fused.lg_params, calib, width=W, height=H,
        max_keypoints=K, keypoint_threshold=5e-4,
    )
    est_b = VoEstimator(matcher, calib, window_size=4)
    tracker = PipelinedStereoTracker(fused_b, est_b, depth=2)
    for i, (l, r) in enumerate(seq):
        tracker.track(l, r, 0.1 * i)
    tracker.flush()

    ta = est_a.corrected_trajectory()
    tb = est_b.corrected_trajectory()
    assert len(ta) == len(tb) == len(seq)
    # Keyframe-lagged matches may differ on at most the frame right after an
    # insertion; poses must agree closely everywhere.
    for a, b in zip(ta, tb):
        assert np.linalg.norm(a.t - b.t) < 0.2


def test_device_tracking_trajectory_matches_host(setup):
    """SUPERSLAM_DEVICE_TRACKER mode: the pose-only LM runs INSIDE the fused
    device program (fused_stereo_track_step_multi) and the estimator adopts
    the solved pose — the host FrameTracker must never run, and the
    trajectory must match the host-solved pipelined run closely."""
    calib, fused, unfused, matcher = setup
    seq = frames(8, seed=11)

    # Host-solved pipelined reference.
    fused_a = FusedStereoPipeline(
        fused.sp_params, fused.lg_params, calib, width=W, height=H,
        max_keypoints=K, keypoint_threshold=5e-4,
    )
    est_a = VoEstimator(matcher, calib, window_size=4)
    tracker_a = PipelinedStereoTracker(fused_a, est_a, depth=2)
    for i, (l, r) in enumerate(seq):
        tracker_a.track(l, r, 0.1 * i)
    tracker_a.flush()

    # Device-solved run.
    fused_b = FusedStereoPipeline(
        fused.sp_params, fused.lg_params, calib, width=W, height=H,
        max_keypoints=K, keypoint_threshold=5e-4,
    )
    est_b = VoEstimator(matcher, calib, window_size=4)
    host_solves = []
    orig = est_b.tracker.track_arrays
    est_b.tracker.track_arrays = lambda *a, **k: host_solves.append(1) or orig(*a, **k)
    tracker_b = PipelinedStereoTracker(fused_b, est_b, depth=2, device_tracking=True)
    for i, (l, r) in enumerate(seq):
        tracker_b.track(l, r, 0.1 * i)
    tracker_b.flush()

    assert not host_solves  # every solve stayed on the chip
    ta = est_a.corrected_trajectory()
    tb = est_b.corrected_trajectory()
    assert len(ta) == len(tb) == len(seq)
    # Device LM (f32, device prior chain) vs host LM (f64): same optimum to
    # solver tolerance; keyframe decisions must agree for the deltas to stay
    # this tight.
    for a, b in zip(ta, tb):
        assert np.linalg.norm(a.t - b.t) < 0.05
        assert np.linalg.norm(a.R - b.R) < 0.05


def test_batched_pipelined_trajectory_equals_synchronous(setup):
    """Frame batching (S frames per fused dispatch, one packed readback) may
    lag keyframe adoption by up to S frames, but the corrected trajectory
    must stay close to the synchronous reference and every frame must get a
    real (non-coasted) solve."""
    calib, fused, unfused, matcher = setup
    seq = frames(10, seed=7)

    fused_a = FusedStereoPipeline(
        fused.sp_params, fused.lg_params, calib, width=W, height=H,
        max_keypoints=K, keypoint_threshold=5e-4,
    )
    est_a = VoEstimator(matcher, calib, window_size=4)
    for i, (l, r) in enumerate(seq):
        frame, m = fused_a.process(l, r, 0.1 * i)
        est_a.track(frame, kf_matches=m)
        if est_a._last_keyframe is frame:
            fused_a.set_keyframe(frame.descriptors_left)

    for batch in (2, 3):
        fused_b = FusedStereoPipeline(
            fused.sp_params, fused.lg_params, calib, width=W, height=H,
            max_keypoints=K, keypoint_threshold=5e-4,
        )
        est_b = VoEstimator(matcher, calib, window_size=4)
        tracker = PipelinedStereoTracker(fused_b, est_b, depth=2, batch=batch)
        assert est_b._kf_store_size >= 2 * batch + 2
        for i, (l, r) in enumerate(seq):
            tracker.track(l, r, 0.1 * i)
        tracker.flush()

        ta = est_a.corrected_trajectory()
        tb = est_b.corrected_trajectory()
        assert len(ta) == len(tb) == len(seq)
        for a, b in zip(ta, tb):
            assert np.linalg.norm(a.t - b.t) < 0.25, batch
