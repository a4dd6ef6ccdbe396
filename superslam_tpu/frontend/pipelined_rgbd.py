"""Software-pipelined RGB-D tracking with frame batching.

The RGB-D analogue of frontend/pipelined.py (see its module docstring for
the link-scheduling rationale, which is identical): S frames per fused
dispatch + ONE packed readback, uploads streamed at submit time, results
drained before the next dispatch, runtime-level async D2H. The depth image
never visits the device — it rides along in the in-flight record and is
sampled on host at decode time (reference split: src/RgbdFrontEnd.cc:23-58).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass
from typing import Any

import numpy as np

from ..core.vo_estimator import VoEstimator
from ..geometry.se3 import Pose3
from ..utils.profiler import profile_scope
from .fused_rgbd import FusedRgbdPipeline
from .pipelined import (
    _AsyncPacked,
    _AsyncPose,
    _decode_device_pose,
    _pose_carry,
    _track_statics,
)


@dataclass
class _InFlight:
    timestamp: float
    packed: "_AsyncPacked"
    slot: int
    desc: Any  # batched (S, K, D) program output (lazily sliced)
    kpts: Any
    valid: Any
    kf_ref_id: int | None
    depth_img: np.ndarray
    gray: np.ndarray | None
    pose: "_AsyncPose | None" = None  # device-tracking pose block
    gray_dev: Any = None  # device-resident (1, H, W) uint8 upload


class PipelinedRgbdTracker:
    def __init__(
        self,
        pipeline: FusedRgbdPipeline,
        estimator: VoEstimator,
        depth: int = 3,
        batch: int = 1,
        keep_gray: bool = False,
        device_tracking: bool = False,
        loop_descriptor_fn=None,
    ):
        self.pipeline = pipeline
        self.estimator = estimator
        self.depth = max(1, int(depth))
        self.batch = max(1, int(batch))
        estimator._kf_store_size = max(
            estimator._kf_store_size, self.depth * self.batch + 2
        )
        # See frontend.pipelined: device-resident loop descriptor source.
        self.loop_descriptor_fn = loop_descriptor_fn
        if loop_descriptor_fn is not None:
            keep_gray = False
        self.keep_gray = keep_gray
        self._staged: list[tuple[Any, np.ndarray, float, np.ndarray | None]] = []
        self._pending: deque[_InFlight] = deque()
        self._last_pose = Pose3()
        self._last_rel = Pose3()
        self._have_kf = False
        # On-device pose solve (mono factors; SUPERSLAM_DEVICE_TRACKER).
        # Distorted calibrations are undistorted ON DEVICE before the solve
        # (ops.rgbd_step.undistort_points_jnp), matching the host
        # estimator's coordinates.
        self.device_tracking = bool(device_tracking)
        self._carry = None
        self._carry_stale = True  # see frontend.pipelined: padded-tail reset
        if self.device_tracking:
            s = _track_statics(pipeline.calib)
            self._trk_calib = s["calib"]
            self._trk_min_matches = s["min_matches"]
            self._trk_sigma_px = s["sigma_px"]
            d = pipeline.dist_coeffs
            if d is None:
                self._trk_dist = None
            else:
                d = [float(x) for x in np.asarray(d).reshape(-1)]
                self._trk_dist = tuple((d + [0.0] * 5)[:5])

    # -- pipeline ------------------------------------------------------------
    def submit(self, gray: np.ndarray, depth_img: np.ndarray, timestamp: float) -> None:
        import jax.numpy as jnp

        with profile_scope("pl_prepare"):
            prep = self.pipeline._prepare_np(gray)
        with profile_scope("pl_upload"):
            dev = jnp.asarray(prep)
        self._staged.append(
            (
                dev,
                np.asarray(depth_img),
                timestamp,
                np.array(gray, copy=True) if self.keep_gray else None,
            )
        )
        if len(self._staged) >= self.batch:
            while len(self._pending) > (self.depth - 1) * self.batch:
                self.drain_one()
            self._dispatch()

    def _dispatch(self) -> None:
        if not self._staged:
            return
        pl = self.pipeline
        staged, self._staged = self._staged, []
        n_real = len(staged)
        while len(staged) < self.batch:
            staged.append(staged[-1])
        import jax.numpy as jnp

        from ..ops.rgbd_step import RGBD_PACK_ROWS, fused_rgbd_step_multi

        images = (
            staged[0][0]
            if self.batch == 1
            else jnp.concatenate([d for d, _, _, _ in staged], axis=0)
        )
        pose_fut = None
        if self.device_tracking:
            from ..ops.rgbd_step import fused_rgbd_track_step_multi

            # Dispatch-frozen chain: re-anchor on host state every dispatch
            # (see frontend.pipelined — a riding carry dead-reckons past the
            # host's corrections and the diverging prediction gate poisons
            # the adopted solves; measured 2.34 m vs 0.039 on the circuit).
            self._carry = _pose_carry(self._last_pose, self._last_rel)
            self._carry_stale = False
            packed, desc, kpts, valid, track_out, self._carry = (
                fused_rgbd_track_step_multi(
                    pl.sp_params,
                    pl.lg_params,
                    images,
                    pl._kf_kpts,
                    pl._kf_desc,
                    pl._kf_valid,
                    pl._kf_xw,
                    pl._kf_depth_ok,
                    *self._carry,
                    max_keypoints=pl.K,
                    keypoint_threshold=pl.keypoint_threshold,
                    remove_borders=pl.remove_borders,
                    nms_radius=pl.nms_radius,
                    true_width=pl.width,
                    true_height=pl.height,
                    match_threshold=pl.match_threshold,
                    calib=self._trk_calib,
                    min_matches=self._trk_min_matches,
                    track_sigma_px=self._trk_sigma_px,
                    dist=self._trk_dist,
                )
            )
            pose_fut = _AsyncPose(track_out)
            if n_real < self.batch:
                self._carry_stale = True  # duplicates polluted the carry
        else:
            packed, desc, kpts, valid = fused_rgbd_step_multi(
                pl.sp_params,
                pl.lg_params,
                images,
                pl._kf_kpts,
                pl._kf_desc,
                pl._kf_valid,
                max_keypoints=pl.K,
                keypoint_threshold=pl.keypoint_threshold,
                remove_borders=pl.remove_borders,
                nms_radius=pl.nms_radius,
                true_width=pl.width,
                true_height=pl.height,
                match_threshold=pl.match_threshold,
            )
        S = len(staged)
        fut = _AsyncPacked(packed, S, RGBD_PACK_ROWS)
        kf_ref = self.estimator._last_keyframe_id if self._have_kf else None
        for s, (dev, depth_img, ts, gray) in enumerate(staged[:n_real]):
            self._pending.append(
                _InFlight(
                    ts, fut, s, desc, kpts, valid, kf_ref, depth_img, gray,
                    pose=pose_fut,
                    gray_dev=dev if self.loop_descriptor_fn is not None else None,
                )
            )

    def drain_one(self) -> Pose3 | None:
        if not self._pending:
            return None
        item = self._pending.popleft()
        with profile_scope("pl_fetch_wait"):
            frame, kf_matches = self._decode(item)
        device_pose = None
        if item.pose is not None and item.kf_ref_id is not None:
            row = item.pose.result()[item.slot]
            if row[12] >= self._trk_min_matches:
                device_pose = _decode_device_pose(row)
            else:
                # In-program coast: host-solve the frame and reseed the
                # carry (see frontend.pipelined.drain_one — the coast row
                # is a carry-frame prediction, not a solve, and the frozen
                # velocity carry latches without host rescue).
                self._carry_stale = True
        provider = None
        if self.loop_descriptor_fn is not None and item.gray_dev is not None:
            fn, dev = self.loop_descriptor_fn, item.gray_dev
            provider = lambda: fn(dev[0])  # noqa: E731 — evaluated on the worker
        prev = self._last_pose
        pose = self.estimator.track(
            frame,
            item.gray,
            kf_matches=kf_matches if item.kf_ref_id is not None else None,
            kf_ref_id=item.kf_ref_id,
            device_pose=device_pose,
            descriptor_provider=provider,
        )
        if self.estimator._last_keyframe is frame:
            self.pipeline.set_keyframe(frame.descriptors_left)
            if self.device_tracking:
                self.pipeline.set_keyframe_world(frame)
        self._last_rel = prev.between(pose)
        self._last_pose = pose
        self._have_kf = True
        return pose

    def _decode(self, item: _InFlight):
        from .features import LazySlotFeatures

        p = item.packed.result()[item.slot]
        feats = LazySlotFeatures(
            item.kpts,
            item.desc,
            item.valid,
            slot=item.slot,
            n=0,  # filled by decode_packed
            width=self.pipeline.width,
            height=self.pipeline.height,
        )
        return self.pipeline.decode_packed(p, item.depth_img, item.timestamp, feats)

    # -- public API ------------------------------------------------------------
    def track(self, gray: np.ndarray, depth_img: np.ndarray, timestamp: float) -> Pose3:
        """Submit this frame; returns the constant-velocity prediction (exact
        pose lands within `batch` calls; corrected_trajectory() is exact)."""
        self.submit(gray, depth_img, timestamp)
        return self._last_pose * self._last_rel

    def flush(self) -> Pose3:
        self._dispatch()
        while self._pending:
            self.drain_one()
        return self._last_pose
