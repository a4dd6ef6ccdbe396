"""Keyframe insertion policy (pure predicate).

Behavioral spec from ``/root/reference/include/KeyframeGate.h:11-24``. The
decision combines three triggers — a frame-count ceiling, an absolute
tracked-match floor, and a covisibility fraction against the reference
keyframe — with a short refractory window (``min_frames``) so a one-frame
covisibility glitch cannot spawn consecutive keyframes.
"""

from __future__ import annotations


def should_insert_keyframe(
    tracked_matches: int,
    reference_features: int,
    frames_since_keyframe: int,
    covisibility_ratio: float = 0.7,
    max_frames: int = 20,
    min_frames: int = 2,
    min_matches: int = 30,
) -> bool:
    if frames_since_keyframe < min_frames:
        return False
    if frames_since_keyframe >= max_frames or tracked_matches < min_matches:
        return True
    ratio = tracked_matches / max(1, reference_features)
    return ratio < covisibility_ratio
