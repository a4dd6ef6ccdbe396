"""End-to-end accuracy with a LEARNED matcher — the closest this weight-free
environment gets to BASELINE configs 2-3.

The matcher fine-tuning step (parallel.training) trains LightGlue from
random init until it matches noised descriptor sets near-perfectly; that
trained matcher then drives the FULL estimation stack (LightGlueMatcher
backend -> VoEstimator -> FrameTracker -> WindowSmoother) on a synthetic
stereo world with per-landmark descriptors, SHUFFLED keypoint order per
frame (so nothing can cheat on indices), observation noise, and ground-truth
camera motion. The corrected trajectory must track the ground truth to
centimeters — a quantitative closed loop over models + matching + geometry.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from superslam_tpu.core.frame import StereoFrame
from superslam_tpu.core.vo_estimator import VoEstimator
from superslam_tpu.frontend.matcher import LightGlueMatcher
from superslam_tpu.geometry import Pose3, StereoCalib
from superslam_tpu.models.lightglue import init_lightglue_params
from superslam_tpu.parallel.training import (
    make_optimizer,
    synthetic_matching_batch,
    train_step,
)

W, H = 640, 480
CAP = 128  # matcher capacity
DESC_NOISE = 0.04


@pytest.fixture(scope="module")
def trained_params():
    rng = np.random.default_rng(0)
    params = init_lightglue_params(0)
    tx = make_optimizer(3e-4)
    opt = tx.init(params)
    for step in range(40):
        jitter = 0.01 if step % 2 == 0 else 0.05  # cover VO-scale motions
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_matching_batch(rng, 2, 64, kpt_jitter=jitter).items()
        }
        params, opt, loss = train_step(params, opt, batch, tx)
    assert float(loss) < 0.6, f"matcher failed to train: loss={float(loss)}"
    return params


def make_world(rng, n=90):
    """A corridor of landmarks ahead of the camera path, each with a random
    unit appearance descriptor."""
    pts = rng.uniform([-4.0, -3.0, 3.0], [4.0, 3.0, 14.0], size=(n, 3))
    desc = rng.standard_normal((n, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    return pts, desc


def observe(pose, pts, desc, calib, rng):
    """Project visible landmarks into a StereoFrame with SHUFFLED order and
    noised per-observation descriptors."""
    p_cam = pose.transform_to(pts)
    z = p_cam[:, 2]
    uL = calib.fx * p_cam[:, 0] / z + calib.cx
    uR = calib.fx * (p_cam[:, 0] - calib.baseline) / z + calib.cx
    v = calib.fy * p_cam[:, 1] / z + calib.cy
    vis = (
        (z > 0.5)
        & (uL > 8) & (uL < W - 8)
        & (uR > 8) & (uR < W - 8)
        & (v > 8) & (v < H - 8)
    )
    idx = np.flatnonzero(vis)
    rng.shuffle(idx)
    idx = idx[:CAP]
    d = desc[idx] + rng.normal(0, DESC_NOISE, (idx.size, 256)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return StereoFrame(
        keypoints_left=np.stack([uL[idx], v[idx]], 1).astype(np.float32),
        descriptors_left=d,
        stereo=np.stack([uL[idx], uR[idx], v[idx]], 1),
        has_depth=np.ones(idx.size, bool),
    )


def test_learned_matcher_tracks_ground_truth(trained_params):
    rng = np.random.default_rng(1)
    calib = StereoCalib(fx=320.0, fy=320.0, cx=320.0, cy=240.0, baseline=0.3)
    pts, desc = make_world(rng)

    matcher = LightGlueMatcher(
        trained_params, image_width=W, image_height=H, max_keypoints=CAP
    )
    vo = VoEstimator(matcher, calib, window_size=4)

    # Gentle forward motion with a slow yaw: 10 frames, ~1.4 m travelled.
    gt = []
    for i in range(10):
        gt.append(
            Pose3.expmap(np.array([0.0, 0.004 * i, 0.0, 0.03 * i, 0.0, 0.15 * i]))
        )

    est = []
    for i, g in enumerate(gt):
        frame = observe(g, pts, desc, calib, rng)
        frame.timestamp = 0.1 * i
        assert len(frame) > 40, "world must stay visible"
        est.append(vo.track(frame))

    traj = vo.corrected_trajectory()
    errs = [np.linalg.norm(t.t - g.t) for t, g in zip(traj, gt)]
    # Centimeter-level tracking over the whole run.
    assert max(errs) < 0.05, f"trajectory errors: {[round(e, 4) for e in errs]}"


def test_learned_matcher_loop_closure(trained_params):
    """Square loop with the learned matcher doing BOTH tracking and
    geometric loop verification (stub place recognition scripts retrieval):
    a loop must fire and the trajectory must return near the origin."""
    import sys

    sys.path.insert(0, "tests")
    from helpers import StubRecognizer, place_desc

    from superslam_tpu.core.loop_closer import LoopCloser, LoopParams

    rng = np.random.default_rng(2)
    calib = StereoCalib(fx=320.0, fy=320.0, cx=320.0, cy=240.0, baseline=0.3)
    pts, desc = make_world(rng, n=110)

    matcher = LightGlueMatcher(
        trained_params, image_width=W, image_height=H, max_keypoints=CAP
    )
    vo = VoEstimator(matcher, calib, window_size=4)
    vo.set_keyframe_params(0.99, 2)  # keyframe every 2 frames on this short loop
    lc = LoopCloser(
        matcher,
        calib,
        StubRecognizer(min_score=0.5),
        LoopParams(required_votes=1, exclude_recent=1, min_score=0.5, min_inliers=8),
    )
    vo.enable_loop_closure(lc, async_=False)

    path = [
        (0.0, 0.0, 0.0),
        (0.3, 0.0, 0.0),
        (0.6, 0.0, 0.0),
        (0.6, 0.3, 0.0),
        (0.3, 0.3, 0.0),
        (0.0, 0.25, 0.0),
        (0.0, 0.03, 0.0),
    ]
    est = []
    for i, p in enumerate(path):
        g = Pose3(t=np.array(p))
        frame = observe(g, pts, desc, calib, rng)
        frame.timestamp = 0.1 * i
        place = 0 if i + 1 == len(path) else i
        est.append(vo.track(frame, place_desc(place)))

    assert vo.loop_closure_count() >= 1
    assert est[-1].translation_norm() < 0.15
    for a, b in zip(est[1:], est):
        assert np.linalg.norm(a.t - b.t) < 0.6  # continuity under correction
