"""The SuperSLAM facade — the one object users construct.

Equivalent of ``/root/reference/src/SuperSLAM.cc`` / ``include/SuperSLAM.h``:
YAML config -> env bridging -> calibration -> backend wiring (one SuperPoint
shared by L/R, one LightGlue shared by front-end + estimator, a dedicated
matcher instance for the loop thread), stereo-vs-RGB-D mode selection keyed
on the presence of ``DepthMapFactor``, optional loop closure gated on
``SUPERSLAM_ENABLE_LOOP`` + a ``loop:`` config block, trajectory
bookkeeping, and KITTI/TUM export.

Note on "dedicated loop matcher": the reference needs a second TensorRT
execution context because contexts are not thread-safe
(``src/SuperSLAM.cc:130-143``). Jitted JAX programs are pure functions and
thread-safe, but the loop worker still gets its OWN LightGlueMatcher
instance so its (potentially different) image size and capacity never
interact with tracking — and the compiled program cache is shared
naturally, mirroring the engine-shared/context-exclusive design.
"""

from __future__ import annotations

import os

import numpy as np

from .config import Config, apply_tuning_overrides, read_calib, read_dist_coeffs
from .core.loop_closer import LoopCloser, LoopParams
from .core.vo_estimator import VoEstimator
from .frontend.extractor import SuperPointExtractor
from .frontend.matcher import LightGlueMatcher
from .frontend.recognizer import EigenPlacesRecognizer
from .frontend.rgbd_frontend import RgbdFrontEnd
from .frontend.stereo_frontend import StereoFrontEnd
from .geometry.se3 import Pose3
from .io.trajectory import save_map_ply, save_trajectory_kitti, save_trajectory_tum
from .models.eigenplaces import init_eigenplaces_params
from .models.lightglue import init_lightglue_params
from .models.superpoint import init_superpoint_params
from .models.weights import load_params
from .utils.env import device_tracker_wanted
from .utils.logging import get_logger


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (first compile of the fused
    pipeline is ~40 s; subsequent CLI runs warm-start). Opt out with
    SUPERSLAM_NO_COMPILE_CACHE=1."""
    if os.environ.get("SUPERSLAM_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/superslam_jax_cache"
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass


class SuperSLAM:
    def __init__(self, config_path: str, use_viewer: bool = False):
        log = get_logger()
        _enable_compilation_cache()
        cfg = Config.load(config_path)
        self.cfg = cfg
        apply_tuning_overrides(cfg)
        self.calib = read_calib(cfg)

        model_dir = str(cfg.get("SuperPoint.model_dir", "weights/"))
        sp_max_kp = int(cfg.get("superpoint.max_keypoints", 1024))
        sp_thresh = float(cfg.get("superpoint.keypoint_threshold", 0.005))
        sp_borders = int(cfg.get("superpoint.remove_borders", 4))
        lg_w = int(cfg.get("lightglue.image_width", cfg.get("Camera.width", 640)))
        lg_h = int(cfg.get("lightglue.image_height", cfg.get("Camera.height", 480)))
        lg_thresh = float(cfg.get("lightglue.match_threshold", 0.1))

        def weights(block: str, default_name: str) -> str | None:
            name = cfg.get(f"{block}.weights_file", default_name)
            return os.path.join(model_dir, name) if name else None

        sp_params = load_params(
            weights("superpoint", "superpoint_v1.safetensors"),
            lambda: init_superpoint_params(),
        )
        lg_file = weights("lightglue", "lightglue_superpoint.safetensors")
        if lg_file and os.path.basename(lg_file) == "__passthrough__":
            # Sentinel: analytically constructed mutual-nearest-neighbor
            # weights (models/lightglue.py init passthrough=True) — the
            # matcher the synthetic accuracy pipeline uses when no trained
            # LightGlue checkpoint exists (zero-egress bootstrap; see
            # scripts/make_synthetic_sequence.py).
            lg_params = init_lightglue_params(passthrough=True)
        else:
            lg_params = load_params(lg_file, lambda: init_lightglue_params())

        # One extractor shared by L/R; one matcher shared by front-end and
        # estimator (SuperSLAM.cc:82-87).
        self.extractor = SuperPointExtractor(
            sp_params,
            width=lg_w,
            height=lg_h,
            max_keypoints=sp_max_kp,
            keypoint_threshold=sp_thresh,
            remove_borders=sp_borders,
        )
        self.matcher = LightGlueMatcher(
            lg_params,
            image_width=lg_w,
            image_height=lg_h,
            max_keypoints=sp_max_kp,
            threshold=lg_thresh,
        )

        # Stereo vs RGB-D keyed on DepthMapFactor (SuperSLAM.cc:89-108).
        self._rgbd = cfg.has("DepthMapFactor")
        if self._rgbd:
            depth_factor = float(cfg.get("DepthMapFactor"))
            max_depth = float(cfg.get("ThDepth", 40.0)) * self.calib.baseline
            self.rgbd_frontend = RgbdFrontEnd(
                self.extractor,
                self.calib,
                depth_factor,
                max_depth,
                read_dist_coeffs(cfg),
            )
            self.frontend = None
            # Hot path: fused extract + KF track match, one readback/frame.
            from .frontend.fused_rgbd import FusedRgbdPipeline

            self.rgbd_pipeline = FusedRgbdPipeline(
                sp_params,
                lg_params,
                self.calib,
                width=lg_w,
                height=lg_h,
                depth_factor=depth_factor,
                max_depth=max_depth,
                dist_coeffs=read_dist_coeffs(cfg),
                max_keypoints=sp_max_kp,
                keypoint_threshold=sp_thresh,
                remove_borders=sp_borders,
                match_threshold=lg_thresh,
            )
        else:
            self.frontend = StereoFrontEnd(self.extractor, self.matcher, self.calib)
            self.rgbd_frontend = None
            # Hot path: the fused one-dispatch/one-readback pipeline (the
            # unfused StereoFrontEnd stays for tests and as the reference
            # structure; both produce identical frames).
            from .frontend.fused import FusedStereoPipeline

            self.pipeline = FusedStereoPipeline(
                sp_params,
                lg_params,
                self.calib,
                width=lg_w,
                height=lg_h,
                max_keypoints=sp_max_kp,
                keypoint_threshold=sp_thresh,
                remove_borders=sp_borders,
                match_threshold=lg_thresh,
            )

        window_size = int(cfg.get("Backend.window_size", 0) or 0)
        self.estimator = VoEstimator(self.matcher, self.calib, window_size)
        self.estimator.set_keyframe_params(
            float(cfg.get("KeyFrame.covis_ratio", 0.7)),
            int(cfg.get("KeyFrame.max_frames", 20)),
        )

        # Optional pose-graph loop closure (SuperSLAM.cc:119-143).
        self.loop_enabled = False
        if os.environ.get("SUPERSLAM_ENABLE_LOOP") and cfg.get("loop") is not None:
            try:
                ep_params = load_params(
                    weights("loop", "eigenplaces_resnet18_512.safetensors"),
                    lambda: init_eigenplaces_params(),
                )
                recognizer = EigenPlacesRecognizer(
                    ep_params, image_size=int(cfg.get("loop.image_width", 512))
                )
                # Dedicated matcher instance for the loop worker.
                loop_matcher = LightGlueMatcher(
                    lg_params,
                    image_width=lg_w,
                    image_height=lg_h,
                    max_keypoints=sp_max_kp,
                    threshold=lg_thresh,
                )
                params = LoopParams()
                if cfg.get("loop.min_inliers") is not None:
                    params.min_inliers = int(cfg.get("loop.min_inliers"))
                if cfg.get("loop.min_score") is not None:
                    params.min_score = float(cfg.get("loop.min_score"))
                lc = LoopCloser(loop_matcher, self.calib, recognizer, params)
                self.estimator.enable_loop_closure(lc, async_=True)
                self.loop_enabled = True
                self._recognizer = recognizer
            except Exception as e:  # degrade gracefully (SuperSLAM.cc:126-135)
                log.error("loop closure init failed (%s); continuing VO-only", e)

        self.viewer = None
        if use_viewer:
            try:
                from .io.viewer import RerunViewer

                self.viewer = RerunViewer()
            except Exception as e:
                log.warning("viewer unavailable: %s", e)

        self._timestamps: list[float] = []
        self._live_poses: list[Pose3] = []

        # Pipelined tracking (SUPERSLAM_PIPELINE=depth, default on at depth 3
        # for the stereo path): hides the host-link round trip behind device
        # compute; per-call return is the constant-velocity prediction and
        # corrected_trajectory() stays exact. SUPERSLAM_PIPELINE=0 forces the
        # fully synchronous reference-style loop.
        self._tracker = None
        depth = int(os.environ.get("SUPERSLAM_PIPELINE", "3"))
        # Frame batching (SUPERSLAM_PIPELINE_BATCH, default 1): S frames per
        # fused dispatch + ONE packed readback — amortizes the tunnel's
        # per-message costs; the estimator resolves the lagged keyframe
        # references. Returned per-call poses lag by up to `batch` frames
        # (constant-velocity predicted); corrected_trajectory() is exact.
        batch = int(os.environ.get("SUPERSLAM_PIPELINE_BATCH", "1"))
        if use_viewer:
            depth = 0  # the viewer draws per frame; stay synchronous
        # Loop descriptors straight from the device-resident frame: the
        # pipelined trackers hand the worker a closure over the fused
        # step's own uint8 upload instead of a host gray copy, so the loop
        # path never re-crosses the host link with an image.
        loop_fn = None
        if self.loop_enabled and getattr(self, "_recognizer", None) is not None:
            rec = self._recognizer

            def loop_fn(gray_dev, _rec=rec, _h=lg_h, _w=lg_w):
                return _rec.compute_global_descriptor_from_device(gray_dev, _h, _w)

        if not self._rgbd and depth > 1:
            from .frontend.pipelined import PipelinedStereoTracker

            # SUPERSLAM_DEVICE_TRACKER=1: the fused program also solves the
            # pose on device (tracking never leaves the chip); the estimator
            # adopts the solved pose and keeps every gate on host.
            self._tracker = PipelinedStereoTracker(
                self.pipeline,
                self.estimator,
                depth=depth,
                batch=max(1, batch),
                keep_gray=self.loop_enabled,
                device_tracking=device_tracker_wanted(),
                loop_descriptor_fn=loop_fn,
            )
        elif self._rgbd and depth > 1:
            from .frontend.pipelined_rgbd import PipelinedRgbdTracker

            self._tracker = PipelinedRgbdTracker(
                self.rgbd_pipeline,
                self.estimator,
                depth=depth,
                batch=max(1, batch),
                keep_gray=self.loop_enabled,
                device_tracking=device_tracker_wanted(),
                loop_descriptor_fn=loop_fn,
            )

    # -- tracking -------------------------------------------------------------
    def track_stereo(
        self, left: np.ndarray, right: np.ndarray, timestamp: float
    ) -> np.ndarray:
        """Track one stereo pair; returns the 4x4 Tcw matrix (the reference's
        cv::Mat contract, SuperSLAM.cc:155-171)."""
        if self._tracker is not None:
            pose = self._tracker.track(left, right, timestamp)
            self._timestamps.append(timestamp)
            self._live_poses.append(pose)
            return pose.inverse().matrix()
        frame, kf_matches = self.pipeline.process(left, right, timestamp)
        gray = left if self.loop_enabled else None
        pose = self.estimator.track(frame, gray, kf_matches=kf_matches)
        # If this frame became the keyframe, its device features become the
        # pipeline's track-match reference.
        if self.estimator._last_keyframe is frame:
            self.pipeline.set_keyframe(frame.descriptors_left)
        self._timestamps.append(timestamp)
        self._live_poses.append(pose)
        if self.viewer is not None:
            self.viewer.draw_frame(frame, pose, self.calib)
            # scalar series parity with the reference RerunViewer
            self.viewer.plot("frontend_inlier_ratio", self.estimator.last_inlier_ratio)
            if self.loop_enabled:
                self.viewer.plot("loop_deep_score", self.estimator.last_loop_score)
        return pose.inverse().matrix()

    def track_rgbd(
        self, gray: np.ndarray, depth: np.ndarray, timestamp: float
    ) -> np.ndarray:
        if self._tracker is not None:
            pose = self._tracker.track(gray, depth, timestamp)
            self._timestamps.append(timestamp)
            self._live_poses.append(pose)
            return pose.inverse().matrix()
        frame, kf_matches = self.rgbd_pipeline.process(gray, depth, timestamp)
        img = gray if self.loop_enabled else None
        pose = self.estimator.track(frame, img, kf_matches=kf_matches)
        if self.estimator._last_keyframe is frame:
            self.rgbd_pipeline.set_keyframe(frame.descriptors_left)
        self._timestamps.append(timestamp)
        self._live_poses.append(pose)
        if self.viewer is not None:
            self.viewer.draw_frame(frame, pose, self.calib)
            # scalar series parity with the reference RerunViewer
            self.viewer.plot("frontend_inlier_ratio", self.estimator.last_inlier_ratio)
            if self.loop_enabled:
                self.viewer.plot("loop_deep_score", self.estimator.last_loop_score)
        return pose.inverse().matrix()

    # -- outputs --------------------------------------------------------------
    def loop_closure_count(self) -> int:
        return self.estimator.loop_closure_count()

    def save_trajectory(self, path: str, fmt: str = "kitti") -> None:
        if self._tracker is not None:
            self._tracker.flush()
        self.estimator.stop_loop_worker()
        traj = self.estimator.corrected_trajectory()
        if fmt.lower() == "kitti":
            save_trajectory_kitti(path, traj)
        elif fmt.lower() == "tum":
            save_trajectory_tum(path, traj, self._timestamps)
        else:
            raise ValueError(f"unknown trajectory format: {fmt}")

    def save_map(self, path: str) -> None:
        if self._tracker is not None:
            self._tracker.flush()
        self.estimator.stop_loop_worker()
        cloud = self.estimator.map.cloud(self.estimator.anchors())
        save_map_ply(path, cloud)

    def shutdown(self) -> None:
        if self._tracker is not None:
            self._tracker.flush()
        self.estimator.stop_loop_worker()
        if self.viewer is not None:
            self.viewer.close()
