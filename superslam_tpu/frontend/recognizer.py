"""EigenPlaces place recognizer backend (PlaceRecognizer implementation).

Equivalent of the reference EigenPlaces wrapper + its embedded cosine index
(``/root/reference/src/EigenPlaces.cc:145-174``): image -> preprocess ->
one jitted ResNet18+GeM forward -> L2-normalized 512-d descriptor, with a
CosineDescriptorIndex for retrieval.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.place_recognition import CosineDescriptorIndex, LoopCandidate
from ..models.eigenplaces import eigenplaces_descriptor, preprocess_image
from ..utils.env import env_float
from ..utils.profiler import profile_scope


class EigenPlacesRecognizer:
    def __init__(self, params, image_size: int = 512, min_score: float | None = None):
        import os

        self.params = params
        self.image_size = int(image_size)
        self.min_score = env_float(
            "SUPERSLAM_LOOP_MIN_SCORE", 0.75 if min_score is None else min_score
        )
        # SUPERSLAM_DEVICE_RETRIEVAL=1 keeps the retrieval database
        # HBM-resident (ops.retrieval ring buffer, bounded by
        # SUPERSLAM_RETRIEVAL_CAPACITY): the scan runs as one jitted GEMM +
        # top-k instead of the host GEMM that grows O(#keyframes)
        # (src/PlaceRecognizer.cc:26-52). Default stays on host — the
        # database is small and the worker is off the critical path.
        if os.environ.get("SUPERSLAM_DEVICE_RETRIEVAL", "") not in ("", "0", "false"):
            from ..ops.retrieval import DeviceCosineIndex
            from ..utils.env import env_int

            cap = env_int("SUPERSLAM_RETRIEVAL_CAPACITY", 4096)
            self.index = DeviceCosineIndex(capacity=cap, dim=512)
        else:
            self.index = CosineDescriptorIndex()

    def compute_global_descriptor(self, image: np.ndarray) -> np.ndarray:
        with profile_scope("ep_descriptor"):
            x = preprocess_image(image, self.image_size)
            d = eigenplaces_descriptor(self.params, jnp.asarray(x))
            return np.asarray(d[0], np.float32)

    def compute_global_descriptor_from_device(
        self, gray_u8_dev, true_height: int, true_width: int
    ) -> np.ndarray:
        """Descriptor from a device-resident uint8 tracking frame — no image
        re-upload (the pipelined trackers hand the fused step's own upload
        straight to this)."""
        from ..models.eigenplaces import eigenplaces_descriptor_from_device_gray

        with profile_scope("ep_descriptor"):
            d = eigenplaces_descriptor_from_device_gray(
                self.params,
                gray_u8_dev,
                true_height=true_height,
                true_width=true_width,
                size=self.image_size,
            )
            return np.asarray(d, np.float32)

    def add(self, keyframe_id: int, global_descriptor: np.ndarray) -> None:
        self.index.add(keyframe_id, global_descriptor)

    def query(
        self, global_descriptor: np.ndarray, exclude_recent: int, top_k: int
    ) -> list[LoopCandidate]:
        res = self.index.query(
            global_descriptor, exclude_recent, top_k, self.min_score
        )
        # The device index returns bare (id, score) tuples.
        return [
            c if isinstance(c, LoopCandidate) else LoopCandidate(int(c[0]), float(c[1]))
            for c in res
        ]
