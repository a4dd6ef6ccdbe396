"""Motion-only pose solve (Levenberg-Marquardt over SE(3)).

Equivalent of the reference FrameTracker
(``/root/reference/src/FrameTracker.cc:16-31``): one pose-only stereo factor
per match, Huber(sqrt(7.815)) over the disparity-aware diagonal noise, a
single 6-DOF variable, batch LM. Also reused as the loop-closure geometric
verifier seeded at identity (``/root/reference/src/LoopCloser.cc:72``).

All factor evaluation is batched (see core.factors); each LM iteration is a
handful of numpy GEMMs plus one 6x6 solve.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..geometry.se3 import Pose3
from ..geometry.stereo_camera import StereoCalib
from .factors import (
    HUBER_K,
    batch_stereo_factor,
    huber_loss,
    huber_weights,
    stereo_diag_sigmas,
)


@dataclass
class PointObs:
    """A triangulated 3D world point and its stereo measurement (uL,uR,v)
    in the current frame. Mirrors FrameTracker.h:10-14."""

    Xw: np.ndarray
    meas: np.ndarray


class FrameTracker:
    """Pose-only LM tracker. Tracking sigma_px = 10.0 (FrameTracker.cc:24)."""

    def __init__(self, calib: StereoCalib, sigma_px: float = 10.0):
        self.calib = calib
        self.sigma_px = sigma_px

    def track(self, initial_guess: Pose3, matches: list[PointObs]) -> Pose3:
        if not matches:
            return initial_guess
        Xw = np.stack([m.Xw for m in matches])
        meas = np.stack([m.meas for m in matches])
        return self.track_arrays(initial_guess, Xw, meas)

    def track_arrays(
        self, initial_guess: Pose3, Xw: np.ndarray, meas: np.ndarray
    ) -> Pose3:
        """Solve for the pose from (N,3) world points and (N,3) stereo meas."""
        if Xw.shape[0] == 0:
            return initial_guess
        disparity = meas[:, 0] - meas[:, 1]
        sigmas = stereo_diag_sigmas(self.sigma_px, disparity, self.calib.bf)

        # Native C++ LM (csrc/): identical factors/damping, ~10x less host
        # overhead per iteration on this single-core host. SUPERSLAM_NATIVE=0
        # forces the numpy path (the oracle).
        import os

        if os.environ.get("SUPERSLAM_NATIVE", "1") != "0":
            from .. import native

            if native.available():
                return native.pose_only_lm(
                    Xw, meas, sigmas, self.calib, HUBER_K, initial_guess
                )
        inv_sig = 1.0 / sigmas

        def robust_error(pose: Pose3) -> float:
            r, _ = batch_stereo_factor(pose, self.calib, Xw, meas)
            return huber_loss(r * inv_sig, HUBER_K)

        pose = initial_guess
        lam = 1e-5
        err = robust_error(pose)
        max_iters, lam_factor = 100, 10.0
        for _ in range(max_iters):
            r, J = batch_stereo_factor(pose, self.calib, Xw, meas)
            rw = r * inv_sig  # whitened (N,3)
            Jw = J * inv_sig[:, :, None]  # whitened (N,3,6)
            w = huber_weights(rw, HUBER_K)  # (N,)
            Jf = (Jw * w[:, None, None]).reshape(-1, 6)
            Ju = Jw.reshape(-1, 6)
            H = Ju.T @ Jf  # sum w * J^T J
            g = Jf.T @ rw.reshape(-1)

            stepped = False
            for _try in range(10):
                try:
                    delta = np.linalg.solve(H + lam * np.eye(6), -g)
                except np.linalg.LinAlgError:
                    lam *= lam_factor
                    continue
                cand = pose.retract(delta)
                cand_err = robust_error(cand)
                if cand_err < err:
                    improvement = err - cand_err
                    pose, err = cand, cand_err
                    lam = max(lam / lam_factor, 1e-10)
                    stepped = True
                    if improvement < 1e-5 * max(err, 1.0) or improvement < 1e-5:
                        return pose
                    break
                lam *= lam_factor
                if lam > 1e10:
                    return pose
            if not stepped:
                return pose
        return pose
