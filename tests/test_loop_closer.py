"""LoopCloser: verify recovers a known relative pose, detect end-to-end,
inlier-floor rejection (mirrors tests/test_loop_closer.cc:94-138)."""

import numpy as np

from superslam_tpu.core.keyframes import KeyframeRecord
from superslam_tpu.core.loop_closer import LoopCloser, LoopParams, LoopResult
from superslam_tpu.geometry import Pose3, stereo_project

from helpers import IdentityMatcher, StubRecognizer, make_calib, place_desc


def make_record(kf_id, cam_in_world, lms, calib, desc=None):
    p_cam = cam_in_world.transform_to(lms)
    z = p_cam[:, 2]
    uL = calib.fx * p_cam[:, 0] / z + calib.cx
    uR = calib.fx * (p_cam[:, 0] - calib.baseline) / z + calib.cx
    v = calib.fy * p_cam[:, 1] / z + calib.cy
    return KeyframeRecord(
        keyframe_id=kf_id,
        keypoints_left=np.stack([uL, v], axis=1).astype(np.float32),
        stereo=np.stack([uL, uR, v], axis=1),
        has_depth=z > 0.1,
        global_descriptor=desc,
    )


def world():
    rng = np.random.default_rng(5)
    return rng.uniform([-4, -3, 6], [4, 3, 18], size=(40, 3))


def test_verify_recovers_known_relative_pose():
    calib = make_calib()
    lms = world()
    matcher = IdentityMatcher(len(lms))
    lc = LoopCloser(
        matcher, calib, StubRecognizer(), LoopParams(min_inliers=10, required_votes=1)
    )
    cand_pose = Pose3()
    true_rel = Pose3.expmap(np.array([0.0, 0.05, 0.0, 0.3, -0.1, 0.1]))
    query_pose = cand_pose * true_rel

    cand = make_record(0, cand_pose, lms, calib)
    query = make_record(1, query_pose, lms, calib)

    r = lc.verify(query, cand)
    assert r.accepted
    assert r.inliers >= 10
    # T_candidate_query must match the true relative pose.
    err = true_rel.between(r.relative_pose).logmap()
    assert np.linalg.norm(err) < 1e-3
    assert r.noise_sigmas is not None and np.isfinite(r.noise_sigmas).all()


def test_inlier_floor_rejection():
    calib = make_calib()
    lms = world()
    matcher = IdentityMatcher(len(lms))
    lc = LoopCloser(
        matcher,
        calib,
        StubRecognizer(),
        LoopParams(min_inliers=len(lms) + 1, required_votes=1),
    )
    cand = make_record(0, Pose3(), lms, calib)
    query = make_record(1, Pose3(t=np.array([0.3, 0, 0])), lms, calib)
    r = lc.verify(query, cand)
    assert not r.accepted


def test_detect_end_to_end():
    calib = make_calib()
    lms = world()
    matcher = IdentityMatcher(len(lms))
    lc = LoopCloser(
        matcher,
        calib,
        StubRecognizer(min_score=0.5),
        LoopParams(required_votes=1, exclude_recent=1, min_score=0.5, min_inliers=8),
    )
    poses = [Pose3(t=np.array([0.4 * i, 0, 0])) for i in range(4)]
    for i, p in enumerate(poses):
        lc.add_keyframe(make_record(i, p, lms, calib, desc=place_desc(i)))
    # Query revisits place 0 from near the origin.
    q = make_record(4, Pose3(t=np.array([0.05, 0, 0])), lms, calib, desc=place_desc(0))
    r = lc.detect(q)
    assert r.accepted
    assert r.matched_keyframe == 0
    # The recovered edge ~ (0.05, 0, 0).
    assert np.linalg.norm(r.relative_pose.t - np.array([0.05, 0, 0])) < 1e-2


class _ScriptedRecognizer:
    """Returns a scripted, score-descending candidate list per detect call."""

    def __init__(self, script):
        self.script = list(script)

    def compute_global_descriptor(self, image):
        return np.zeros(4, np.float32)

    def add(self, keyframe_id, global_descriptor):
        pass

    def query(self, global_descriptor, exclude_recent, top_k):
        from superslam_tpu.core.place_recognition import LoopCandidate

        step = self.script.pop(0) if self.script else []
        return [LoopCandidate(k, s) for k, s in step]


def test_detect_vote_then_verify_interleaving():
    """Pin the exact reference ordering (LoopCloser.cc:105-125):

    1. voter.vote(best) fires on the TOP candidate BEFORE any min_score
       filtering — a below-threshold best still accumulates votes;
    2. verify() is never called until the vote passes;
    3. once it passes, candidates are verified in descending-score order and
       the scan BREAKS at the first score < min_score (never continues past);
    4. the first accepted verification wins (no further verify calls);
    5. an empty candidate list votes None and resets the streak.
    """
    calib = make_calib()
    script = [
        [(2, 0.70)],                       # below min_score: votes, no verify
        [(3, 0.90)],                       # streak 2 (|3-2|<=tol): still <3
        [(2, 0.95), (7, 0.85), (9, 0.60)], # streak 3: verify 2 fail, BREAK at 9
        [(3, 0.92), (2, 0.88), (4, 0.86)], # streak 4: verify 3 fail, 2 accept
        [],                                # no candidates: vote(None) resets
        [(2, 0.99)],                       # streak restarts at 1: no verify
    ]
    lc = LoopCloser(
        IdentityMatcher(4),
        calib,
        _ScriptedRecognizer(script),
        LoopParams(required_votes=3, id_tolerance=5, min_score=0.80),
    )

    vote_log, verify_log = [], []
    real_vote = lc.voter.vote

    def spy_vote(best):
        vote_log.append(None if best is None else (best.keyframe_id, best.score))
        return real_vote(best)

    def spy_verify(query, candidate):
        verify_log.append(candidate.keyframe_id)
        r = LoopResult(matched_keyframe=candidate.keyframe_id)
        r.accepted = candidate.keyframe_id == 2 and len(verify_log) > 2
        return r

    lc.voter.vote = spy_vote
    lc.verify = spy_verify
    lc.db.get = lambda kf_id: KeyframeRecord(keyframe_id=kf_id)

    q = KeyframeRecord(keyframe_id=99)
    assert not lc.detect(q).accepted
    assert vote_log == [(2, 0.70)] and verify_log == []  # voted despite 0.70<0.80
    assert not lc.detect(q).accepted
    assert verify_log == []  # streak 2 < 3: still no verification
    assert not lc.detect(q).accepted
    # Vote passed; verify in score order, break BEFORE 9 (0.60 < min_score).
    assert verify_log == [2, 7]
    r = lc.detect(q)
    assert r.accepted and r.matched_keyframe == 2
    assert verify_log == [2, 7, 3, 2]  # stopped at first accept: 4 never tried
    assert r.best_score == 0.92  # viewer scalar = TOP retrieval score
    assert not lc.detect(q).accepted
    assert vote_log[-1] is None  # empty candidates vote None (streak reset)
    assert not lc.detect(q).accepted
    assert verify_log == [2, 7, 3, 2]  # streak restarted: vote gate holds again


def test_detect_requires_votes():
    calib = make_calib()
    lms = world()
    matcher = IdentityMatcher(len(lms))
    lc = LoopCloser(
        matcher,
        calib,
        StubRecognizer(min_score=0.5),
        LoopParams(required_votes=2, exclude_recent=1, min_score=0.5, min_inliers=8),
    )
    for i in range(3):
        lc.add_keyframe(
            make_record(i, Pose3(t=np.array([0.4 * i, 0, 0])), lms, calib, place_desc(i))
        )
    q = make_record(3, Pose3(), lms, calib, place_desc(0))
    assert not lc.detect(q).accepted  # first vote only (streak 1 < 2)
    lc.add_keyframe(q)
    q2 = make_record(4, Pose3(), lms, calib, place_desc(0))
    assert lc.detect(q2).accepted  # second consecutive vote
