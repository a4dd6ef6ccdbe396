"""Software-pipelined stereo tracking with frame batching.

The host link to this TPU has a fixed ~16-30 ms round trip on every fresh
device->host read, while the fused per-frame program costs ~10 ms of device
time — a fully synchronous loop is RTT-bound regardless of kernel speed.
This wrapper hides the latency the way the hardware wants:

- **Frame batching** (batch=S): S consecutive stereo frames go through ONE
  fused_stereo_step_multi dispatch and ONE packed readback, amortizing the
  round trip S-fold. All S frames' track-matches refer to the same keyframe
  state; the estimator resolves lagged keyframe references from its
  retained store.
- **Depth-D pipelining**: the packed readback runs on background fetcher
  threads while later frames' device work proceeds; the host estimator
  consumes results a few frames behind submission.

The estimator still sees every frame, in order, with full data — only the
pose RETURNED at submit time is the constant-velocity prediction for the
newest frame, and corrected_trajectory() is exact throughout.
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass
from typing import Any

import numpy as np

from ..core.vo_estimator import VoEstimator
from ..geometry.se3 import Pose3
from ..utils.env import env_flag
from ..utils.profiler import profile_scope
from .features import PaddedFeatures
from .fused import FusedStereoPipeline


class _AsyncPacked:
    """Future-shaped handle over a runtime-level async D2H.

    ``copy_to_host_async`` queues the transfer in submission order — right
    behind this dispatch's program, BEFORE the next dispatch's upload — so
    by drain time the bytes are host-side and ``result()`` costs ~0.1 ms.
    (A fetcher THREAD calling np.asarray gets scheduled late under the GIL;
    its transfer then queues behind later dispatches and blocks ~50 ms.)
    """

    def __init__(self, packed, s: int, rows: int | None = None):
        if rows is None:
            from ..ops.frontend_step import PACK_ROWS

            rows = PACK_ROWS
        self._packed = packed
        self._s = s
        self._rows = rows
        self._host: np.ndarray | None = None
        try:
            packed.copy_to_host_async()
        except Exception:
            pass  # fall through to the synchronous fetch in result()

    def result(self) -> np.ndarray:
        if self._host is None:
            self._host = np.asarray(self._packed).reshape(self._s, self._rows, -1)
        return self._host


def _track_statics(calib) -> dict:
    """Static solver parameters shared by both pipelined trackers'
    device-tracking dispatch (one definition — they must never diverge)."""
    from ..core.factors import disp_sigma_px, stereo_cond_depth_m
    from ..utils.env import env_int

    return {
        "calib": (
            float(calib.fx),
            float(calib.fy),
            float(calib.cx),
            float(calib.cy),
            float(calib.baseline),
        ),
        "min_matches": env_int("SUPERSLAM_TRACK_MIN_MATCHES", 10),
        "sigma_px": 10.0,  # FrameTracker.cc:24
        "disp_sigma0": float(disp_sigma_px()),
        "disp_cond": float(calib.bf) / float(stereo_cond_depth_m()),
    }


def _decode_device_pose(row: np.ndarray) -> Pose3:
    """One TRACK_COLS row -> Twc (see ops.frontend_step.track_scan)."""
    return Pose3(
        R=row[:9].astype(np.float64).reshape(3, 3),
        t=row[9:12].astype(np.float64),
    )


def _pose_carry(pose: Pose3, rel: Pose3):
    """Host poses -> the device tracking carry (R, t, rel_R, rel_t) f32."""
    import jax.numpy as jnp

    return (
        jnp.asarray(pose.R, jnp.float32),
        jnp.asarray(pose.t, jnp.float32),
        jnp.asarray(rel.R, jnp.float32),
        jnp.asarray(rel.t, jnp.float32),
    )


class _AsyncPose:
    """Async D2H handle over the small (S, TRACK_COLS) f32 pose block."""

    def __init__(self, arr):
        self._arr = arr
        self._host: np.ndarray | None = None
        try:
            arr.copy_to_host_async()
        except Exception:
            pass

    def result(self) -> np.ndarray:
        if self._host is None:
            self._host = np.asarray(self._arr)
        return self._host


@dataclass
class _InFlight:
    timestamp: float
    packed: "_AsyncPacked"  # async D2H of the (S, PACK, K) block
    slot: int  # this frame's row in the packed block
    desc: Any  # batched (S, K, D) program output (lazily sliced)
    kpts: Any
    valid: Any
    kf_ref_id: int | None
    left_gray: np.ndarray | None
    pose: "_AsyncPose | None" = None  # device-tracking pose block
    left_dev: Any = None  # device-resident (2, H, W) uint8 upload
    kf_epoch: int = -1  # device-kf mode: kf-state epoch at dispatch


class PipelinedStereoTracker:
    def __init__(
        self,
        pipeline: FusedStereoPipeline,
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
        # Loop-closure descriptor source: a callable over the DEVICE-resident
        # uint8 frame (recognizer.compute_global_descriptor_from_device).
        # When set, keyframes hand the loop worker a lazy closure instead of
        # a host gray copy — no image ever re-crosses the host link for the
        # loop path.
        self.loop_descriptor_fn = loop_descriptor_fn
        if loop_descriptor_fn is not None:
            keep_gray = False
        # On-device pose solve (SUPERSLAM_DEVICE_TRACKER): the fused program
        # also runs the pose-only LM per frame and the host estimator adopts
        # the solved pose instead of calling FrameTracker — tracking never
        # leaves the chip. The LM carry (previous pose + constant-velocity
        # model) lives on device across dispatches; keyframe world points are
        # uploaded by drain_one at adoption time.
        self.device_tracking = bool(device_tracking)
        self._carry = None  # (R, t, rel_R, rel_t) device arrays
        # Padded flush tails run the duplicate frames through the pose scan,
        # corrupting the constant-velocity carry (rel collapses to identity
        # when the same frame is solved twice) — rebuild it from the host's
        # last pose/rel before the next dispatch instead.
        self._carry_stale = True
        # Zero-lag device keyframe mode (SUPERSLAM_DEVICE_KF, default on
        # with device tracking): the keyframe state rides the program's scan
        # carry and promotion happens in-program (track_kf_scan), so every
        # frame matches against the NEWEST keyframe — the rendered-circuit
        # A/B measured the dispatch-frozen keyframe lag at 3x the sync ATE.
        # The host follows the readback's accept/promo bits; `_kf_epoch`
        # counts host-initiated reseeds (first keyframe, flush tails) so
        # frames dispatched against superseded device state fall back to the
        # host re-match path instead of trusting stale matches.
        from ..utils.env import env_flag
        self.device_kf = self.device_tracking and env_flag(
            "SUPERSLAM_DEVICE_KF", True
        )
        self._kf_state = None  # (nk, desc, valid, xw, depth_ok, since)
        self._kf_epoch = 0
        # True while the host keyframe chain has advanced past the device
        # carry (host-initiated insertion): in-flight device results then
        # refer to an OLDER keyframe than estimator._last_keyframe_id and
        # must not be adopted under that id.
        self._kf_dirty = False
        if self.device_tracking:
            from ..utils.env import env_float

            s = _track_statics(pipeline.calib)
            self._trk_calib = s["calib"]
            self._trk_min_matches = s["min_matches"]
            self._trk_sigma_px = s["sigma_px"]
            self._trk_disp_sigma0 = s["disp_sigma0"]
            self._trk_disp_cond = s["disp_cond"]
            # kf-gate statics are defined for ALL device-tracking trackers
            # (not only device_kf): bench.py's device-only section reads
            # them to build the kf program regardless of which mode the
            # measured run ended up in.
            self._kf_accept_frac = env_float("SUPERSLAM_TRACK_ACCEPT_FRAC", 0.4)
            self._kf_support_px = 2.0 * env_float("SUPERSLAM_TRACK_CHI2_PX", 2.0)
            self._kf_covis = env_float(
                "SUPERSLAM_KF_COVIS", estimator._covisibility_ratio
            )
            self._kf_max_frames = int(estimator._max_keyframe_frames)
        # Set once the kf program has compiled+run successfully: later
        # dispatch errors are then transient (relay weather) and must
        # propagate like any other dispatch error, not trigger fallback.
        self._kf_compiled = False
        # In-flight frames can lag up to depth*batch insertions behind the
        # newest keyframe; retain enough keyframes that their precomputed
        # matches stay resolvable (an eviction forces a host re-match, which
        # serializes a whole extra matcher dispatch per frame).
        estimator._kf_store_size = max(
            estimator._kf_store_size, self.depth * self.batch + 2
        )
        self.keep_gray = keep_gray
        self._staged: list[tuple[np.ndarray, np.ndarray, float]] = []
        self._pending: deque[_InFlight] = deque()
        self._last_pose = Pose3()
        self._last_rel = Pose3()
        self._have_kf = False
        # Background D2H workers: each fetch pays the host-link round trip,
        # so several must be in flight at once for the latency to overlap
        # with device compute (numpy conversion releases the GIL).
        self._fetchers = ThreadPoolExecutor(
            max_workers=max(2, self.depth), thread_name_prefix="d2h-fetch"
        )

    def _seed_kf_state(self) -> None:
        """(Re)build the device keyframe carry from the host's newest
        keyframe: the bootstrap after the first insertion, and the recovery
        after any host-initiated insertion or flush-tail pollution. Bumps
        the epoch so in-flight frames dispatched against the superseded
        device state fall back to the host re-match path."""
        import jax.numpy as jnp

        from .features import keyframe_world_arrays

        pl = self.pipeline
        est = self.estimator
        frame = est._last_keyframe
        feats = frame.descriptors_left
        scale = max(pl.width, pl.height) / 2.0
        center = jnp.asarray([pl.width / 2.0, pl.height / 2.0], jnp.float32)
        nk = (feats.kpts - center) / scale
        valid = feats.valid
        if valid is None:
            valid = jnp.asarray(np.arange(pl.K) < feats.n)
        xw, dok = keyframe_world_arrays(frame, pl.calib, pl.K)
        self._kf_state = (
            nk,
            feats.desc,
            valid,
            jnp.asarray(xw),
            jnp.asarray(dok),
            jnp.asarray(est._frames_since_keyframe, jnp.int32),
        )
        self._kf_epoch += 1
        self._kf_dirty = False
        # The device pose chain re-anchors on host state along with the
        # keyframe (they travel through the same program carry).
        self._carry_stale = True

    # -- pipeline ------------------------------------------------------------
    def submit(self, left: np.ndarray, right: np.ndarray, timestamp: float) -> None:
        import jax.numpy as jnp

        # Prep + upload EACH frame as it arrives: the tunnel is
        # bandwidth-bound (~50 MB/s -> ~17 ms per 0.9 MB stereo pair), so
        # the upload must stream during the frame interval instead of
        # bursting S frames at dispatch time.
        with profile_scope("pl_prepare"):
            prep = self.pipeline._prepare_np(left, right)
        with profile_scope("pl_upload"):
            dev = jnp.asarray(prep)
        self._staged.append(
            (dev, timestamp, np.array(left, copy=True) if self.keep_gray else None)
        )
        if len(self._staged) >= self.batch:
            # Drain BEFORE dispatching: the packed fetch is served by the
            # link ~one RTT after it is REQUESTED, behind any queued device
            # work — requesting it while the new batch's upload+program sit
            # in the queue adds their whole device time to the wait.
            while len(self._pending) > (self.depth - 1) * self.batch:
                self.drain_one()
            self._dispatch()

    def _dispatch(self) -> None:
        if not self._staged:
            return
        pl = self.pipeline
        staged, self._staged = self._staged, []
        n_real = len(staged)
        # Pad partial batches (the flush tail) by replicating the last frame
        # so ONE compiled program shape serves every dispatch; dummy results
        # are dropped below.
        while len(staged) < self.batch:
            staged.append(staged[-1])
        import jax.numpy as jnp

        images = (
            staged[0][0]
            if self.batch == 1
            else jnp.concatenate([d for d, _, _ in staged], axis=0)
        )
        pose_fut = None
        if self.device_kf and self._kf_state is None and self._have_kf:
            self._seed_kf_state()
        used_kf_program = False
        if self.device_kf and self._kf_state is not None:
            from ..core.keyframe_gate import (
                MIN_FRAMES_DEFAULT,
                MIN_MATCHES_DEFAULT,
            )
            from ..ops.frontend_step import fused_stereo_track_kf_step_multi

            if self._carry is None or self._carry_stale:
                self._carry = _pose_carry(self._last_pose, self._last_rel)
                self._carry_stale = False
            try:
                (
                    packed, desc, kpts, valid, track_out,
                    self._kf_state, self._carry,
                ) = fused_stereo_track_kf_step_multi(
                    pl.sp_params,
                    pl.lg_params,
                    images,
                    self._kf_state,
                    self._carry,
                    max_keypoints=pl.K,
                    keypoint_threshold=pl.keypoint_threshold,
                    remove_borders=pl.remove_borders,
                    nms_radius=pl.nms_radius,
                    true_width=pl.width,
                    true_height=pl.height,
                    min_disparity=pl.min_disparity,
                    match_threshold=pl.match_threshold,
                    calib=self._trk_calib,
                    min_matches=self._trk_min_matches,
                    track_sigma_px=self._trk_sigma_px,
                    disp_sigma0=self._trk_disp_sigma0,
                    disp_cond=self._trk_disp_cond,
                    accept_frac=self._kf_accept_frac,
                    support_px=self._kf_support_px,
                    kf_min_frames=MIN_FRAMES_DEFAULT,
                    kf_max_frames=self._kf_max_frames,
                    kf_min_matches=MIN_MATCHES_DEFAULT,
                    covis_ratio=self._kf_covis,
                )
                used_kf_program = True
                self._kf_compiled = True
                pose_fut = _AsyncPose(track_out)
                if n_real < self.batch:
                    # Duplicate flush-tail frames ran the scan: both the
                    # pose carry AND the device keyframe may have moved (a
                    # duplicate can promote). Rebuild both from host state
                    # before the next dispatch.
                    self._carry_stale = True
                    self._kf_state = None
            except Exception as e:  # pragma: no cover - backend-specific
                if self._kf_compiled:
                    # The program has compiled and run on this backend:
                    # this error is transient (relay weather) or a real
                    # bug — either way it must propagate, not silently
                    # degrade accuracy for the rest of the run.
                    raise
                # A compiler failure on an untested backend must degrade,
                # not kill tracking: fall back permanently to the
                # dispatch-frozen keyframe program for this run (keyframe
                # uploads resume; the estimator's rescue handles the lag).
                import logging

                logging.getLogger("superslam").warning(
                    "device-kf program failed to compile (%s: %.500s); "
                    "falling back to dispatch-frozen keyframe tracking",
                    type(e).__name__,
                    e,
                )
                self.device_kf = False
                self._kf_state = None
                self._carry_stale = True
                # The old program needs the keyframe features/world points
                # on the pipeline object — rebuild them from the host's
                # newest keyframe before dispatching.
                kf_frame = self.estimator._last_keyframe
                if kf_frame is not None:
                    self.pipeline.set_keyframe(kf_frame.descriptors_left)
                    self.pipeline.set_keyframe_world(kf_frame)
        if not used_kf_program and self.device_tracking and not self.device_kf:
            from ..ops.frontend_step import fused_stereo_track_step_multi

            # Dispatch-frozen mode: re-anchor the device pose chain on HOST
            # state at EVERY dispatch. Letting the carry ride dispatch-to-
            # dispatch dead-reckons the device chain past every host-side
            # correction (smoother refinements, coast rescues, re-matches) —
            # the chains diverge, the in-program prediction gate starts
            # biasing the keep-sets, and each adopted solve feeds the next
            # dispatch's drifted carry. Measured on the rendered circuit
            # (150 frames, trained stack, CPU): ATE 2.34 m with the riding
            # carry vs 0.066 devkf / 0.068 host; 60-frame bisect: riding
            # 0.53, host-reseed-every-dispatch 0.039, host-solve-everything
            # (SUPERSLAM_DEVICE_POSE_ADOPT=0, forces per-frame host
            # re-matches) 0.023. The reseed costs four tiny H2D uploads per
            # dispatch and keeps the device solves adopted. The devkf
            # program needs no such reseed: its carry re-anchors through the
            # readback follow/rescue protocol (kf_epoch + _carry_stale).
            self._carry = _pose_carry(self._last_pose, self._last_rel)
            self._carry_stale = False
            packed, desc, kpts, valid, track_out, self._carry = (
                fused_stereo_track_step_multi(
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
                    min_disparity=pl.min_disparity,
                    match_threshold=pl.match_threshold,
                    calib=self._trk_calib,
                    min_matches=self._trk_min_matches,
                    track_sigma_px=self._trk_sigma_px,
                    disp_sigma0=self._trk_disp_sigma0,
                    disp_cond=self._trk_disp_cond,
                )
            )
            pose_fut = _AsyncPose(track_out)
            if n_real < self.batch:
                self._carry_stale = True  # duplicates polluted the carry
        elif not used_kf_program:
            from ..ops.frontend_step import fused_stereo_step_multi

            packed, desc, kpts, valid = fused_stereo_step_multi(
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
                min_disparity=pl.min_disparity,
                match_threshold=pl.match_threshold,
            )
        # The program emits a rank-2 (S*PACK_ROWS, K) int16 block; fetch it
        # as-is and split per frame on host.
        S = len(staged)
        fut = _AsyncPacked(packed, S)
        kf_ref = self.estimator._last_keyframe_id if self._have_kf else None
        for s, (dev, ts, left_gray) in enumerate(staged[:n_real]):
            # The batched outputs go in whole; LazySlotFeatures slices a
            # frame's rows only if something (keyframe adoption, host
            # re-match) actually reads them — 3*S eager slice submissions
            # per dispatch measurably stretched the dispatch path.
            self._pending.append(
                _InFlight(
                    ts,
                    fut,
                    s,
                    desc,
                    kpts,
                    valid,
                    kf_ref,
                    left_gray,
                    pose=pose_fut,
                    left_dev=dev if self.loop_descriptor_fn is not None else None,
                    kf_epoch=self._kf_epoch if used_kf_program else -1,
                )
            )

    def drain_one(self) -> Pose3 | None:
        if not self._pending:
            return None
        item = self._pending.popleft()
        with profile_scope("pl_fetch_wait"):
            frame, kf_matches = self._decode(item)
        device_pose = None
        device_accept = device_promote = None
        kf_ref = item.kf_ref_id
        if item.pose is not None:
            if item.kf_epoch >= 0:
                # Zero-lag device keyframe dispatch: matches/pose refer to
                # the device-carried keyframe, which equals the host's
                # NEWEST keyframe as long as every insertion since this
                # frame's dispatch came from a promo bit (the host follows
                # them in drain order). A host-initiated insertion or a
                # reseed breaks that lockstep — fall back to the host
                # re-match path for the in-flight frames it orphaned.
                if item.kf_epoch == self._kf_epoch and not self._kf_dirty:
                    row = item.pose.result()[item.slot]
                    device_pose = _decode_device_pose(row)
                    device_accept = bool(row[14] > 0.5)
                    device_promote = bool(row[15] > 0.5)
                    kf_ref = self.estimator._last_keyframe_id
                else:
                    kf_ref = None
            elif item.kf_ref_id is not None:
                row = item.pose.result()[item.slot]
                if row[12] >= self._trk_min_matches:
                    # SUPERSLAM_DEVICE_POSE_ADOPT=0: bisect ablation — keep
                    # the device MATCHES but host-solve every frame (isolates
                    # the in-program f32 solve/adoption from the match path).
                    if env_flag("SUPERSLAM_DEVICE_POSE_ADOPT", True):
                        device_pose = _decode_device_pose(row)
                else:
                    # In-program COAST (n < min_matches): the row is the
                    # device carry's dead-reckoned prediction, not a solve.
                    # Adopting it interleaves carry-frame guesses with
                    # host-frame solves (converged solves anchor through the
                    # uploaded keyframe world points, coasts do not), and
                    # the frozen velocity carry compounds: one marginal
                    # in-program coast latched the dispatch-frozen tracker
                    # for dozens of frames (measured: stereo_devtrack ATE
                    # 2.34 m vs 0.066 devkf on the 150-frame circuit, 31
                    # frames with >2x ground-truth step). Fall through to
                    # the full host solve on the device's own matches and
                    # reseed the carry from host state at the next dispatch
                    # — the devtrack analogue of the device-kf rejected-
                    # frame rescue.
                    self._carry_stale = True
        if self.device_kf and device_promote is None:
            # Stale/bootstrap frame while the zero-lag mode is ACTIVE: it
            # tracks through the host re-match path, but it must NOT run
            # the host keyframe gate — a host-initiated insertion orphans
            # every in-flight frame (epoch bump), and at keyframe cadences
            # shorter than the pipeline depth the orphaning cascades until
            # 100% of frames drain stale (measured on the rendered circuit:
            # the devkf leg silently became the host path). Insertion
            # authority stays with the in-program gate on the next
            # epoch-valid frame. (The FIRST keyframe is unaffected:
            # _init_first_keyframe runs before any gate.)
            device_promote = False
        provider = None
        if self.loop_descriptor_fn is not None and item.left_dev is not None:
            fn, dev = self.loop_descriptor_fn, item.left_dev
            provider = lambda: fn(dev[0])  # noqa: E731 — evaluated on the worker
        prev = self._last_pose
        pose = self.estimator.track(
            frame,
            item.left_gray,
            kf_matches=kf_matches if kf_ref is not None else None,
            kf_ref_id=kf_ref,
            device_pose=device_pose,
            descriptor_provider=provider,
            device_accept=device_accept,
            device_promote=device_promote,
        )
        if self.estimator._last_keyframe is frame:
            if self.device_kf:
                if not device_promote:
                    # Host-initiated insertion (first keyframe, or a frame
                    # that drained through the host path): the device carry
                    # no longer matches the newest keyframe. Reseed at the
                    # next dispatch.
                    self._kf_state = None
                    self._kf_dirty = True
            else:
                self.pipeline.set_keyframe(frame.descriptors_left)
                if self.device_tracking:
                    self.pipeline.set_keyframe_world(frame)
        self._last_rel = prev.between(pose)
        self._last_pose = pose
        self._have_kf = True
        return pose

    def _decode(self, item: _InFlight):
        from .features import LazySlotFeatures
        from .fused import decode_packed

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
        return decode_packed(p, item.timestamp, feats)

    # -- public API ------------------------------------------------------------
    def track(self, left: np.ndarray, right: np.ndarray, timestamp: float) -> Pose3:
        """Submit this frame; drain until at most (depth*batch - 1) remain in
        flight. Returns the constant-velocity prediction for THIS frame
        (exact pose lands within `batch` calls; corrected_trajectory() is
        always exact)."""
        self.submit(left, right, timestamp)
        return self._last_pose * self._last_rel

    def flush(self) -> Pose3:
        """Dispatch anything staged and drain everything in flight."""
        self._dispatch()
        while self._pending:
            self.drain_one()
        return self._last_pose
