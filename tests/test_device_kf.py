"""Zero-lag device keyframe promotion (ops.frontend_step.track_kf_scan).

The keyframe state rides the fused program's scan carry and promotion
happens in-program; the host estimator follows the readback's accept/promo
bits (VoEstimator.track(device_accept=..., device_promote=...)). These
tests pin the lockstep contract: the device-kf pipelined trajectory must
match the synchronous host reference, every host keyframe after the first
must come from a device promo bit, and the per-insertion keyframe H2D
upload must never run (the keyframe never leaves the chip).

Reference behavior being re-expressed: the synchronous hot loop of
``src/VoEstimator.cc:238-258`` always tracks against the NEWEST keyframe —
the property the dispatch-frozen keyframe state of the plain pipelined
mode loses (measured at 3x sync ATE on the rendered circuit).

Fixture: rendered sprite-wall world (eval.synthetic_sequence) close enough
for real stereo disparity (random-noise crops give < 2 depth-valid
keypoints and would make every assertion vacuous), random-init SuperPoint,
analytic passthrough LightGlue (random transformer weights match nothing).
"""

import numpy as np
import pytest

from superslam_tpu.core.vo_estimator import VoEstimator
from superslam_tpu.eval.synthetic_sequence import make_room_world, render_stereo
from superslam_tpu.frontend.fused import FusedStereoPipeline
from superslam_tpu.frontend.matcher import LightGlueMatcher
from superslam_tpu.frontend.pipelined import PipelinedStereoTracker
from superslam_tpu.geometry import StereoCalib
from superslam_tpu.geometry.se3 import Pose3
from superslam_tpu.models.lightglue import init_lightglue_params
from superslam_tpu.models.superpoint import init_superpoint_params

W, H, K = 160, 120, 128


@pytest.fixture(scope="module")
def setup():
    calib = StereoCalib(fx=80.0, fy=80.0, cx=80.0, cy=60.0, baseline=0.5)
    sp = init_superpoint_params(0)
    lg = init_lightglue_params(0, passthrough=True)
    matcher = LightGlueMatcher(lg, image_width=W, image_height=H, max_keypoints=K)
    rng = np.random.default_rng(0)
    world = make_room_world(
        rng, half_x=3.0, half_z=3.0, n_sprites=240, sprite_half=(0.18, 0.3)
    )
    # Sideways-sliding camera ~1.5-4.5 m from the walls: real disparity
    # (5-13 px at bf=40) and fast covisibility decay so the keyframe gate
    # actually fires.
    poses = [
        Pose3(t=np.array([0.12 * i, 0.0, -1.5 + 0.08 * i])) for i in range(12)
    ]
    seq = []
    for p in poses:
        l, r = render_stereo(world, p, calib, H, W)
        seq.append(((l * 255).astype(np.uint8), (r * 255).astype(np.uint8)))
    return calib, sp, lg, matcher, seq


@pytest.fixture()
def low_floor(monkeypatch):
    # ~20 depth-valid keypoints per rendered frame at this tiny resolution;
    # the default floor of 10 would coast through legitimate solves.
    monkeypatch.setenv("SUPERSLAM_TRACK_MIN_MATCHES", "5")


def _pipeline(setup):
    calib, sp, lg, _, _ = setup
    return FusedStereoPipeline(
        sp, lg, calib, width=W, height=H, max_keypoints=K, keypoint_threshold=5e-4
    )


def test_device_kf_promotes_and_keeps_keyframe_on_chip(setup, low_floor):
    """Structural contract of the zero-lag mode: promotions fire in-program,
    the host inserts keyframes from the bits, and the per-insertion keyframe
    upload never runs. Trajectory-level parity with the synchronous path is
    measured where it is meaningful — scripts/accuracy_suite.py's
    stereo_devkf leg on the trained-weights rendered circuit (random-init
    weights track too poorly here for pose comparisons to mean anything:
    every mode lands meters from ground truth on this fixture)."""
    calib, sp, lg, matcher, seq = setup

    fused_b = _pipeline(setup)
    est_b = VoEstimator(matcher, calib, window_size=4)
    tracker = PipelinedStereoTracker(fused_b, est_b, depth=2, device_tracking=True)
    assert tracker.device_kf  # default-on with device tracking
    uploads = []
    orig = fused_b.set_keyframe_world
    fused_b.set_keyframe_world = lambda f: uploads.append(1) or orig(f)
    for i, (l, r) in enumerate(seq):
        tracker.track(l, r, 0.1 * i)
    tracker.flush()

    # The per-insertion keyframe upload never ran: promotions happen in the
    # scan carry; the only host-side state build is _seed_kf_state.
    assert not uploads
    # Device promotions actually drove insertions past the bootstrap.
    assert est_b._next_keyframe_id >= 2
    tb = est_b.corrected_trajectory()
    assert len(tb) == len(seq)
    assert all(np.isfinite(p.t).all() for p in tb)


def test_device_kf_promotions_lockstep(setup, low_floor):
    """Every keyframe after lockstep is established must be device-promoted:
    the host gate never fires on its own while epoch-valid frames adopt the
    device bits verbatim."""
    calib, sp, lg, matcher, seq = setup

    fused = _pipeline(setup)
    est = VoEstimator(matcher, calib, window_size=4)
    tracker = PipelinedStereoTracker(fused, est, depth=2, batch=2,
                                     device_tracking=True)
    promoted = []
    orig = est.track

    def spy(frame, *a, **kw):
        r = orig(frame, *a, **kw)
        if est._last_keyframe is frame:
            promoted.append(bool(kw.get("device_promote")))
        return r

    est.track = spy
    for i, (l, r) in enumerate(seq):
        tracker.track(l, r, 0.1 * i)
    tracker.flush()

    assert len(promoted) >= 2  # first keyframe + at least one promotion
    # First insertion is host-initiated (bootstrap); frames already in
    # flight then drain through the host path (stale epoch) and may
    # legitimately insert host-side. Once the first device promotion lands,
    # every later insertion must carry the promo bit.
    assert promoted[0] is False
    assert any(promoted[1:]), "no device promotion ever fired"
    first_dev = promoted.index(True)
    assert all(promoted[first_dev:]), (
        "host-initiated insertion after lockstep was established: "
        f"{promoted}"
    )


def test_device_kf_compile_failure_falls_back(setup, low_floor, monkeypatch):
    """A compiler failure in the kf-promotion program (untested backend,
    Mosaic fragility) must degrade to the dispatch-frozen keyframe program,
    not kill tracking: same run, keyframe uploads resume, trajectory
    completes."""
    import superslam_tpu.ops.frontend_step as fs

    calib, sp, lg, matcher, seq = setup

    def boom(*a, **kw):
        raise RuntimeError("synthetic Mosaic compile failure")

    monkeypatch.setattr(fs, "fused_stereo_track_kf_step_multi", boom)

    fused = _pipeline(setup)
    est = VoEstimator(matcher, calib, window_size=4)
    tracker = PipelinedStereoTracker(fused, est, depth=2, device_tracking=True)
    assert tracker.device_kf
    for i, (l, r) in enumerate(seq):
        tracker.track(l, r, 0.1 * i)
    tracker.flush()

    assert not tracker.device_kf  # permanently fell back for this run
    t = est.corrected_trajectory()
    assert len(t) == len(seq)
    assert all(np.isfinite(p.t).all() for p in t)


def test_device_kf_flush_tail_reseeds(setup, low_floor):
    """A padded flush tail runs duplicate frames through the promotion scan;
    the tracker must rebuild the device keyframe state before the next
    dispatch instead of trusting the polluted carry."""
    calib, sp, lg, matcher, seq = setup

    fused = _pipeline(setup)
    est = VoEstimator(matcher, calib, window_size=4)
    tracker = PipelinedStereoTracker(fused, est, depth=2, batch=2,
                                     device_tracking=True)
    for i, (l, r) in enumerate(seq[:7]):
        tracker.track(l, r, 0.1 * i)
    tracker.flush()  # 7 real frames -> one duplicate in the padded tail
    assert tracker._kf_state is None  # polluted carry dropped
    # Continue tracking after the flush: the reseed path must produce a
    # usable state (no crash, trajectory stays finite, frames keep coming).
    for i, (l, r) in enumerate(seq[7:]):
        tracker.track(l, r, 0.1 * (7 + i))
    tracker.flush()
    t = est.corrected_trajectory()
    assert len(t) == len(seq)
    assert all(np.isfinite(p.t).all() for p in t)
