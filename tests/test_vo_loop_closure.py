"""VO + loop-closure integration on a synthetic square loop, mirroring the
reference's highest-value tests (tests/test_vo_loop_closure.cc): loop
detected and applied continuously (sync + async worker), corrected
trajectory exactness without a loop, sparse map population, and bounded
corrections."""

import time

import numpy as np

from superslam_tpu.core.loop_closer import LoopCloser, LoopParams
from superslam_tpu.core.vo_estimator import VoEstimator
from superslam_tpu.geometry import Pose3

from helpers import (
    IdentityMatcher,
    StubRecognizer,
    make_calib,
    make_frame,
    place_desc,
    square_loop_path,
    world_landmarks,
)


def make_loop_closer(matcher, calib):
    params = LoopParams(
        required_votes=1,
        exclude_recent=1,  # tiny loop -> only exclude the immediate neighbour
        min_score=0.5,
        min_inliers=8,
    )
    return LoopCloser(matcher, calib, StubRecognizer(min_score=0.5), params)


def drive_square_loop(vo, calib, lms, with_images=True):
    path = square_loop_path()
    est = []
    for i, p in enumerate(path):
        f = make_frame(Pose3(t=p), lms, calib, 0.1 * i)
        # Distinct place per pose (kf0 == place 0); the LAST pose revisits
        # place 0 (loop).
        place = 0 if i + 1 == len(path) else i
        img = place_desc(place) if with_images else None
        est.append(vo.track(f, img))
    return est


def test_detects_and_applies_loop_on_return():
    calib = make_calib()
    lms = world_landmarks()
    matcher = IdentityMatcher(len(lms))
    vo = VoEstimator(matcher, calib)
    vo.enable_loop_closure(make_loop_closer(matcher, calib), async_=False)

    est = drive_square_loop(vo, calib, lms)

    assert vo.loop_closure_count() >= 1

    # Continuity: the rigid anchor correction preserves relative motion;
    # physical steps are ~0.5 m, so no pose step may exceed 1 m.
    for i in range(1, len(est)):
        step = np.linalg.norm(est[i].t - est[i - 1].t)
        assert step < 1.0, f"discontinuity at frame {i}: {step}"

    # The trajectory physically returned near the origin.
    assert est[-1].translation_norm() < 0.5


def test_correction_stays_finite_and_bounded():
    calib = make_calib()
    lms = world_landmarks()
    matcher = IdentityMatcher(len(lms))
    vo = VoEstimator(matcher, calib)
    vo.enable_loop_closure(make_loop_closer(matcher, calib), async_=False)

    drive_square_loop(vo, calib, lms)
    assert vo.loop_closure_count() >= 1

    traj = vo.corrected_trajectory()
    assert traj
    for p in traj:
        assert p.is_finite()
        assert p.translation_norm() < 1e3


def test_async_worker_detects_loop():
    calib = make_calib()
    lms = world_landmarks()
    matcher = IdentityMatcher(len(lms))
    vo = VoEstimator(matcher, calib)
    vo.enable_loop_closure(make_loop_closer(matcher, calib), async_=True)

    drive_square_loop(vo, calib, lms)

    # The worker runs concurrently; poll briefly.
    for _ in range(200):
        if vo.loop_closure_count() > 0:
            break
        time.sleep(0.005)
    assert vo.loop_closure_count() >= 1

    # A subsequent frame applies the pending correction without discontinuity.
    f = make_frame(Pose3(), world_landmarks(), calib, 1.0)
    p = vo.track(f, place_desc(0))
    assert p.translation_norm() < 0.6
    vo.stop_loop_worker()
    vo.stop_loop_worker()  # idempotent


def test_worker_survives_descriptor_provider_failure():
    """A keyframe whose lazy descriptor source raises (device error,
    provider bug) must not kill the loop worker: the keyframe is dropped
    from the loop DB and later keyframes still process (SURVEY §5.3)."""
    calib = make_calib()
    lms = world_landmarks()
    matcher = IdentityMatcher(len(lms))
    vo = VoEstimator(matcher, calib)
    vo.set_keyframe_params(0.8, 1)  # keyframe every frame
    vo.enable_loop_closure(make_loop_closer(matcher, calib), async_=True)

    def boom():
        raise RuntimeError("synthetic descriptor failure")

    # First keyframe: failing provider.
    f0 = make_frame(Pose3(), lms, calib, 0.0)
    vo.track(f0, descriptor_provider=boom)
    # Force more keyframes with healthy descriptors.
    for i in range(1, 4):
        f = make_frame(Pose3(t=np.array([0.8 * i, 0, 0])), lms, calib, 0.1 * i)
        vo.track(f, place_desc(i))
    vo.stop_loop_worker()
    assert vo._worker is not None and not vo._worker.is_alive()
    recs = vo._loop_closer.db.records()
    # The poisoned keyframe never entered the DB; the healthy ones did.
    assert len(recs) >= 1
    assert all(r.global_descriptor is not None for r in recs)


def test_corrected_trajectory_falls_back_to_live_vo_without_loop():
    calib = make_calib()
    lms = world_landmarks()
    matcher = IdentityMatcher(len(lms))
    vo = VoEstimator(matcher, calib)  # loop closure never enabled

    path = [np.array([0.5 * i, 0.0, 0.0]) for i in range(4)]
    last = Pose3()
    for i, p in enumerate(path):
        f = make_frame(Pose3(t=p), lms, calib, 0.1 * i)
        last = vo.track(f)

    traj = vo.corrected_trajectory()
    assert len(traj) == len(path)  # one pose per tracked frame
    # Without a loop, corrected_trajectory must reproduce live VO EXACTLY
    # (pins the seed-anchor algebra, VoEstimator.cc:181-201).
    assert np.linalg.norm(traj[-1].t - last.t) < 1e-6


def test_sparse_map_populated_per_keyframe():
    calib = make_calib()
    lms = world_landmarks()
    matcher = IdentityMatcher(len(lms))
    vo = VoEstimator(matcher, calib)
    vo.enable_loop_closure(make_loop_closer(matcher, calib), async_=False)

    # No images: no loop fires; exercises the seed-anchor fallback.
    drive_square_loop(vo, calib, lms, with_images=False)

    assert vo.map.keyframe_count() > 0
    assert vo.map.cloud(vo.anchors()).shape[0] > 0


def test_coast_on_tracking_loss():
    """Below SUPERSLAM_TRACK_MIN_MATCHES the estimator coasts on the last
    accepted relative motion instead of trusting an unsupported solve."""
    calib = make_calib()
    lms = world_landmarks()

    class CountedMatcher(IdentityMatcher):
        def __init__(self, n):
            super().__init__(n)
            self.fail = False

        def match(self, kp0, d0, kp1, d1):
            if self.fail:
                from superslam_tpu.core.interfaces import MatchResult

                return MatchResult()
            return super().match(kp0, d0, kp1, d1)

    matcher = CountedMatcher(len(lms))
    vo = VoEstimator(matcher, calib)
    step = np.array([0.4, 0.0, 0.0])
    for i in range(3):
        vo.track(make_frame(Pose3(t=step * i), lms, calib, 0.1 * i))
    # Tracking loss: matcher returns nothing; pose must coast by ~step.
    matcher.fail = True
    p = vo.track(make_frame(Pose3(t=step * 3), lms, calib, 0.3))
    assert np.linalg.norm(p.t - step * 3) < 0.2
    assert p.is_finite()


def test_square_loop_with_xla_smoother(monkeypatch):
    """SUPERSLAM_XLA_SMOOTHER=1: the on-device window LM replaces the numpy
    smoother inside the full VO+loop pipeline; the corrected trajectory must
    stay within a tight bound of the numpy run."""
    import numpy as np

    calib = make_calib()
    lms = world_landmarks()

    def run():
        matcher = IdentityMatcher(len(lms))
        vo = VoEstimator(matcher, calib, window_size=6)
        vo.enable_loop_closure(make_loop_closer(matcher, calib), async_=False)
        drive_square_loop(vo, calib, lms)
        vo.stop_loop_worker()
        return vo.corrected_trajectory()

    monkeypatch.delenv("SUPERSLAM_XLA_SMOOTHER", raising=False)
    ref = run()
    monkeypatch.setenv("SUPERSLAM_XLA_SMOOTHER", "1")
    got = run()
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        assert np.linalg.norm(a.t - b.t) < 0.1
