"""Keyframe records and insertion-ordered database.

Equivalent of ``/root/reference/include/KeyframeDatabase.h:17-43``. The
authoritative optimized pose lives in the GlobalPoseGraph; ``pose_at_insert``
is a cached seed for geometric verification. Descriptors here are HOST
arrays [N, D]: a loop candidate is re-matched with the matcher and
back-projected, so descriptors are copied off-device once per keyframe
(the reference does the same D2H at ``src/VoEstimator.cc:106``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..geometry.se3 import Pose3


@dataclass
class KeyframeRecord:
    keyframe_id: int = 0
    timestamp: float = 0.0
    pose_at_insert: Pose3 = field(default_factory=Pose3)  # cached seed
    keypoints_left: np.ndarray = field(default_factory=lambda: np.zeros((0, 2)))
    # Host float32 rows OR a device-resident PaddedFeatures (the matcher
    # consumes either; device records avoid loop-verify host round trips).
    descriptors_left: object = field(default_factory=lambda: np.zeros((0, 256)))
    stereo: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))
    has_depth: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=bool))
    global_descriptor: np.ndarray | None = None  # [Dg], L2-normalized
    covisible: list[int] = field(default_factory=list)


class KeyframeDatabase:
    def __init__(self) -> None:
        self._records: list[KeyframeRecord] = []
        self._id_to_index: dict[int, int] = {}

    def add(self, rec: KeyframeRecord) -> None:
        self._id_to_index[rec.keyframe_id] = len(self._records)
        self._records.append(rec)

    def get(self, keyframe_id: int) -> KeyframeRecord:
        return self._records[self._id_to_index[keyframe_id]]

    def has(self, keyframe_id: int) -> bool:
        return keyframe_id in self._id_to_index

    def __len__(self) -> int:
        return len(self._records)

    def records(self) -> list[KeyframeRecord]:
        """Records in insertion (keyframe creation) order."""
        return self._records
