"""Multi-sequence batched SLAM tracking (BASELINE config 5).

Runs S independent camera streams through ONE fused device program per step:
SuperPoint over all 2S images, 2S LightGlue pair-problems (S stereo + S
per-sequence keyframe track matches), one packed readback — then S host
estimators consume their slices. The sequence axis is the data-parallel
axis: on a multi-chip mesh, shard the image batch on 'data' and each chip
owns S/n sequences with zero cross-sequence communication (the dry-run
exercises the sharded single-program path via
parallel.batched_tracking).

Each sequence keeps its own VoEstimator (window, pose graph, anchors) and
its own device-resident keyframe features; keyframe state is stacked
(S, K, ·) and updated functionally per step.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.vo_estimator import VoEstimator
from ..frontend.extractor import pad_to_multiple
from ..frontend.features import PaddedFeatures
from ..geometry.se3 import Pose3
from ..geometry.stereo_camera import StereoCalib
from ..ops.frontend_step import fused_stereo_step_multi


class MultiSequenceTracker:
    def __init__(
        self,
        sp_params,
        lg_params,
        calib: StereoCalib,
        num_sequences: int,
        width: int,
        height: int,
        max_keypoints: int = 512,
        keypoint_threshold: float = 0.005,
        remove_borders: int = 4,
        nms_radius: int = 4,
        min_disparity: float = 1.0,
        match_threshold: float = 0.1,
        window_size: int = 8,
        matcher=None,
        mesh=None,
    ):
        self.sp_params = sp_params
        self.lg_params = lg_params
        self.calib = calib
        self.S = int(num_sequences)
        # Optional data-parallel mesh: image batch and keyframe state are
        # sharded on 'data' so each chip owns S/n sequences (BASELINE
        # config 5); None = single-device.
        self._shard = None
        if mesh is not None:
            from .mesh import data_sharding

            n_data = mesh.devices.shape[0]
            if self.S % n_data:
                raise ValueError(
                    f"num_sequences ({self.S}) must be a multiple of the "
                    f"mesh data axis ({n_data}) for sharded batching"
                )
            self._shard = data_sharding(mesh)
        self.width, self.height = int(width), int(height)
        self.pad_w, self.pad_h = pad_to_multiple(width), pad_to_multiple(height)
        self.K = int(max_keypoints)
        self.keypoint_threshold = float(keypoint_threshold)
        self.remove_borders = int(remove_borders)
        self.nms_radius = int(nms_radius)
        self.min_disparity = float(min_disparity)
        self.match_threshold = float(match_threshold)

        self.estimators = [
            VoEstimator(matcher, calib, window_size) for _ in range(self.S)
        ]
        self._kf_kpts = self._place(jnp.zeros((self.S, self.K, 2), jnp.float32))
        self._kf_desc = self._place(jnp.zeros((self.S, self.K, 256), jnp.float32))
        self._kf_valid = self._place(jnp.zeros((self.S, self.K), bool))

    def _place(self, arr):
        import jax

        return jax.device_put(arr, self._shard) if self._shard is not None else arr

    def _prepare(self, lefts, rights) -> np.ndarray:
        batch = np.zeros((2 * self.S, self.pad_h, self.pad_w), np.uint8)
        for s in range(self.S):
            for slot, img in ((2 * s, lefts[s]), (2 * s + 1, rights[s])):
                a = np.asarray(img)
                if a.dtype != np.uint8:
                    a = np.clip(a, 0, 255).astype(np.uint8)
                h, w = a.shape
                batch[slot, : min(h, self.pad_h), : min(w, self.pad_w)] = a[
                    : self.pad_h, : self.pad_w
                ]
        return batch

    def step(
        self,
        lefts: list[np.ndarray],
        rights: list[np.ndarray],
        timestamps: list[float],
    ) -> list[Pose3]:
        """Track one frame of every sequence; returns S poses."""
        # ONE host->device transfer: device_put of the numpy batch straight
        # to the sharded layout (jnp.asarray first would commit to device 0
        # and then re-scatter device-to-device — double upload per frame).
        if self._shard is not None:
            import jax

            images = jax.device_put(self._prepare(lefts, rights), self._shard)
        else:
            images = jnp.asarray(self._prepare(lefts, rights))
        packed, desc, kpts, valid = fused_stereo_step_multi(
            self.sp_params,
            self.lg_params,
            images,
            self._kf_kpts,
            self._kf_desc,
            self._kf_valid,
            max_keypoints=self.K,
            keypoint_threshold=self.keypoint_threshold,
            remove_borders=self.remove_borders,
            nms_radius=self.nms_radius,
            true_width=self.width,
            true_height=self.height,
            min_disparity=self.min_disparity,
            match_threshold=self.match_threshold,
        )
        # The program emits rank-2 (S*PACK_ROWS, K); split per sequence.
        p_all = np.asarray(packed).reshape(self.S, -1, packed.shape[-1])

        from ..frontend.fused import decode_packed

        poses = []
        new_kf: list[int] = []
        for s in range(self.S):
            feats = PaddedFeatures(
                kpts=kpts[s],
                desc=desc[s],
                n=0,  # filled by decode_packed
                width=self.width,
                height=self.height,
                valid=valid[s],
            )
            frame, m = decode_packed(p_all[s], timestamps[s], feats)
            est = self.estimators[s]
            poses.append(est.track(frame, kf_matches=m))
            if est._last_keyframe is frame:
                new_kf.append(s)

        if new_kf:
            idx = jnp.asarray(np.array(new_kf, np.int32))
            self._kf_kpts = self._kf_kpts.at[idx].set(kpts[idx])
            self._kf_desc = self._kf_desc.at[idx].set(desc[idx])
            self._kf_valid = self._kf_valid.at[idx].set(valid[idx])
        return poses

    def trajectories(self) -> list[list[Pose3]]:
        return [e.corrected_trajectory() for e in self.estimators]
