"""Covisibility-based keyframe gate (pure function, scale-invariant).

Equivalent of ``/root/reference/include/KeyframeGate.h:11-24``: insert a
keyframe when frames_since_keyframe >= max_frames (parallax cap for slow
forward motion), when the hard match floor is breached, or when the fraction
of the reference keyframe's features still tracked drops below
covisibility_ratio. min_frames debounces back-to-back keyframes on a
transient covisibility dip.
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
