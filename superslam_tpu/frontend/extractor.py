"""SuperPoint extractor backend: images in, PaddedFeatures out.

The TPU counterpart of the reference SuperPoint wrapper
(``/root/reference/src/SuperPoint.cc``): one jitted XLA program runs the
dense heads, NMS, top-K selection and descriptor gather; the stereo path is
the same program with a leading batch of 2 (the reference's batched
{2,1,H,W} enqueue, ``src/SuperPoint.cc:754-892``). Only keypoints/scores
cross to the host (for the GTSAM-equivalent estimator); descriptors stay in
HBM inside the returned PaddedFeatures.

Images are padded to a fixed (H, W) with H, W multiples of 8 so a single
compiled program serves the whole dataset.
"""

from __future__ import annotations

import numpy as np


import jax.numpy as jnp

from ..core.interfaces import Features
from ..models.superpoint import superpoint_extract
from ..utils.env import env_flag
from ..utils.profiler import profile_scope
from .features import PaddedFeatures


def pad_to_multiple(x: int, m: int = 32) -> int:
    """Frame padding quantum. 32 (not the minimal 8) because the Pallas
    conv+pool kernels stripe 16 rows at full AND half resolution — an
    H % 32 != 0 frame (KITTI's 376!) would silently fall back to the ~3x
    slower XLA conv path (superpoint_dense's guard). Extra rows/cols are
    zeros and their keypoints are masked by true_width/true_height in
    select_keypoints."""
    return ((x + m - 1) // m) * m


class SuperPointExtractor:
    def __init__(
        self,
        params,
        width: int,
        height: int,
        max_keypoints: int = 1024,
        keypoint_threshold: float = 0.005,
        remove_borders: int = 4,
        nms_radius: int = 4,
    ):
        self.params = params
        self.width = int(width)
        self.height = int(height)
        self.pad_w = pad_to_multiple(self.width)
        self.pad_h = pad_to_multiple(self.height)
        self.max_keypoints = int(max_keypoints)
        self.keypoint_threshold = float(keypoint_threshold)
        self.remove_borders = int(remove_borders)
        self.nms_radius = int(nms_radius)

    # -- internals -----------------------------------------------------------
    def _prepare(self, images: list[np.ndarray]) -> jnp.ndarray:
        batch = np.zeros((len(images), self.pad_h, self.pad_w), np.float32)
        for i, img in enumerate(images):
            a = np.asarray(img)
            if a.ndim == 3:  # BGR -> gray (reference convention, SuperSLAM.cc:156)
                a = a @ np.array([0.114, 0.587, 0.299], np.float32)
            if np.issubdtype(a.dtype, np.floating):
                # Contract: float ⇒ already normalized to [0, 1] (dtype-
                # keyed, see frontend/fused.py).
                a = a.astype(np.float32)
            else:
                a = a.astype(np.float32) / 255.0
            h, w = a.shape
            batch[i, : min(h, self.pad_h), : min(w, self.pad_w)] = a[
                : self.pad_h, : self.pad_w
            ]
        return jnp.asarray(batch)

    def _run(self, images: list[np.ndarray]) -> list[Features]:
        x = self._prepare(images)
        with profile_scope("sp_gpu_infer"):
            kpts, scores, valid, desc = superpoint_extract(
                self.params,
                x,
                max_keypoints=self.max_keypoints,
                keypoint_threshold=self.keypoint_threshold,
                remove_borders=self.remove_borders,
                nms_radius=self.nms_radius,
                true_width=self.width,
                true_height=self.height,
                subpixel=env_flag("SUPERSLAM_SP_SUBPIXEL", True),
            )
            # One synchronized host read for the small tensors; descriptors
            # stay on device.
            kpts_h = np.asarray(kpts)
            scores_h = np.asarray(scores)
            valid_h = np.asarray(valid)

        out = []
        for i in range(len(images)):
            # Valid rows form a prefix: the jitted program enforces image
            # bounds before top_k.
            n = int(valid_h[i].sum())
            padded = PaddedFeatures(
                kpts=kpts[i], desc=desc[i], n=n, width=self.width, height=self.height
            )
            out.append(
                Features(
                    keypoints=kpts_h[i, :n].copy(),
                    scores=scores_h[i, :n].copy(),
                    descriptors=padded,
                )
            )
        return out

    # -- FeatureExtractor interface -------------------------------------------
    def extract(self, image: np.ndarray) -> Features:
        return self._run([image])[0]

    def extract_stereo(self, left: np.ndarray, right: np.ndarray):
        with profile_scope("sp_extract_stereo"):
            l, r = self._run([left, right])
        return l, r
