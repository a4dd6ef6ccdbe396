"""CosineDescriptorIndex ranking/excludeRecent/topK/minScore + voter
streak/reset (mirrors tests/test_place_recognizer.cc:21-78)."""

import numpy as np

from superslam_tpu.core.place_recognition import (
    CosineDescriptorIndex,
    LoopCandidate,
    TemporalConsistencyVoter,
)


def one_hot(i, dim=8):
    d = np.zeros(dim, dtype=np.float32)
    d[i] = 1.0
    return d


def test_ranking_descending():
    idx = CosineDescriptorIndex()
    idx.add(0, np.array([1.0, 0.0, 0.0]))
    idx.add(1, np.array([0.8, 0.6, 0.0]))
    idx.add(2, np.array([0.0, 1.0, 0.0]))
    out = idx.query(np.array([1.0, 0.0, 0.0]), exclude_recent=0, top_k=3, min_score=0.1)
    assert [c.keyframe_id for c in out] == [0, 1]
    assert out[0].score > out[1].score


def test_exclude_recent_window():
    idx = CosineDescriptorIndex()
    for i in range(5):
        idx.add(i, one_hot(0))
    out = idx.query(one_hot(0), exclude_recent=3, top_k=10, min_score=0.5)
    assert sorted(c.keyframe_id for c in out) == [0, 1]
    # Nothing old enough.
    assert idx.query(one_hot(0), exclude_recent=5, top_k=10, min_score=0.5) == []


def test_top_k_and_min_score():
    idx = CosineDescriptorIndex()
    for i in range(6):
        idx.add(i, one_hot(0))
    idx.add(6, one_hot(1))
    out = idx.query(one_hot(0), exclude_recent=0, top_k=2, min_score=0.5)
    assert len(out) == 2
    out = idx.query(one_hot(1), exclude_recent=0, top_k=10, min_score=0.5)
    assert [c.keyframe_id for c in out] == [6]


def test_unnormalized_inputs_are_normalized():
    idx = CosineDescriptorIndex()
    idx.add(0, np.array([10.0, 0.0]))
    out = idx.query(np.array([3.0, 0.0]), exclude_recent=0, top_k=1, min_score=0.9)
    assert out and out[0].score == pytest_approx(1.0)


def pytest_approx(v, tol=1e-5):
    class _A:
        def __eq__(self, other):
            return abs(other - v) < tol

    return _A()


def test_growth_beyond_capacity_step():
    idx = CosineDescriptorIndex(capacity_step=4)
    for i in range(10):
        idx.add(i, one_hot(i % 8))
    assert len(idx) == 10
    out = idx.query(one_hot(3), exclude_recent=0, top_k=10, min_score=0.9)
    assert sorted(c.keyframe_id for c in out) == [3]


def test_voter_streak_and_reset():
    voter = TemporalConsistencyVoter(required_votes=3, id_tolerance=5)
    c = LoopCandidate(10, 0.9)
    assert not voter.vote(c)
    assert not voter.vote(LoopCandidate(12, 0.9))
    assert voter.vote(LoopCandidate(14, 0.9))  # 3 consecutive, within tol
    # None resets the streak.
    assert not voter.vote(None)
    assert not voter.vote(c)
    # Far-away id resets to streak 1.
    assert not voter.vote(LoopCandidate(11, 0.9))
    assert not voter.vote(LoopCandidate(100, 0.9))
    assert not voter.vote(LoopCandidate(101, 0.9))
    assert voter.vote(LoopCandidate(102, 0.9))
