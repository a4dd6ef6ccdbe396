"""KeyframeGate truth table (mirrors tests/test_keyframe_gate.cc)."""

from superslam_tpu.core.keyframe_gate import should_insert_keyframe


def test_min_frames_debounce():
    # Below min_frames nothing inserts, even with zero matches.
    assert not should_insert_keyframe(0, 100, 0)
    assert not should_insert_keyframe(0, 100, 1)


def test_max_frames_cap():
    assert should_insert_keyframe(100, 100, 20)
    assert should_insert_keyframe(100, 100, 50)
    assert not should_insert_keyframe(100, 100, 19)


def test_hard_match_floor():
    assert should_insert_keyframe(29, 100, 2)
    assert not should_insert_keyframe(30, 30, 2)  # ratio 1.0, above floor


def test_covisibility_ratio():
    # 60/100 = 0.6 < 0.7 -> insert
    assert should_insert_keyframe(60, 100, 2)
    # 80/100 = 0.8 >= 0.7 -> hold
    assert not should_insert_keyframe(80, 100, 2)
    # Custom ratio
    assert not should_insert_keyframe(60, 100, 2, covisibility_ratio=0.5)


def test_zero_reference_features():
    # max(1, ref) guard: no division by zero.
    assert not should_insert_keyframe(50, 0, 2)
