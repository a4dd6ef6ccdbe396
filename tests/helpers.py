"""Shared fakes + synthetic stereo geometry for the device-free core tests.

Mirrors the reference's fake-backend pattern
(``/root/reference/tests/test_vo_loop_closure.cc:23-96``): an identity
matcher, a stub recognizer whose global descriptor IS the "image" handed to
track(), and frames built by projecting a fixed landmark world through the
stereo camera at scripted Twc poses.
"""

from __future__ import annotations

import numpy as np

from superslam_tpu.core.frame import StereoFrame
from superslam_tpu.core.interfaces import MatchResult
from superslam_tpu.core.place_recognition import CosineDescriptorIndex
from superslam_tpu.geometry import Pose3, StereoCalib


def make_calib() -> StereoCalib:
    return StereoCalib(fx=500.0, fy=500.0, cx=320.0, cy=240.0, baseline=0.5)


def world_landmarks() -> np.ndarray:
    """16 landmarks visible from every pose along a small loop."""
    lms = []
    for i in range(16):
        lms.append([-4 + 0.5 * i, -3 + 0.4 * (i % 5), 9 + 0.3 * (i % 4)])
    return np.array(lms)


class IdentityMatcher:
    """Returns i->i for the first n features (deterministic stub)."""

    def __init__(self, n: int):
        idx = np.arange(n, dtype=np.int32)
        self._result = MatchResult(
            matches=np.stack([idx, idx], axis=1),
            scores=np.ones(n, dtype=np.float32),
        )

    def match(self, kp0, d0, kp1, d1) -> MatchResult:
        return self._result

    def descriptors_to_host(self, d):
        return np.zeros((0, 256), dtype=np.float32)


class StubRecognizer:
    """Global descriptor IS the passed image row; real cosine index inside."""

    def __init__(self, min_score: float = 0.5):
        self._idx = CosineDescriptorIndex()
        self._min_score = min_score

    def compute_global_descriptor(self, image):
        return np.asarray(image, dtype=np.float32).reshape(-1)

    def add(self, keyframe_id, d):
        self._idx.add(keyframe_id, d)

    def query(self, d, exclude_recent, top_k):
        return self._idx.query(d, exclude_recent, top_k, self._min_score)


def make_frame(
    cam_in_world: Pose3,
    lms: np.ndarray,
    calib: StereoCalib,
    t: float,
) -> StereoFrame:
    """Project the world from Twc into a StereoFrame (all depth-valid)."""
    p_cam = cam_in_world.transform_to(lms)
    z = p_cam[:, 2]
    uL = calib.fx * p_cam[:, 0] / z + calib.cx
    uR = calib.fx * (p_cam[:, 0] - calib.baseline) / z + calib.cx
    v = calib.fy * p_cam[:, 1] / z + calib.cy
    n = lms.shape[0]
    return StereoFrame(
        timestamp=t,
        keypoints_left=np.stack([uL, v], axis=1).astype(np.float32),
        descriptors_left=None,
        stereo=np.stack([uL, uR, v], axis=1),
        has_depth=(z > 0.1),
        pose=Pose3(),
    )


def place_desc(p: int, dim: int = 8) -> np.ndarray:
    """One-hot global descriptor for 'place' p."""
    d = np.zeros(dim, dtype=np.float32)
    d[p % dim] = 1.0
    return d


def square_loop_path() -> list[np.ndarray]:
    """Out along +x, over in +y, back to near the origin (planar)."""
    return [
        np.array(p)
        for p in [
            (0, 0, 0),
            (0.5, 0, 0),
            (1.0, 0, 0),
            (1.0, 0.5, 0),
            (0.5, 0.5, 0),
            (0.0, 0.4, 0),
            (0.0, 0.05, 0),
        ]
    ]
