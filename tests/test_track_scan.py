"""On-device tracking chain (ops.frontend_step.track_scan) vs exact
geometry and the host FrameTracker: the scan must recover known poses from
synthetic projections, chain priors across frames, coast on loss, and count
correspondences exactly."""

import numpy as np

import jax.numpy as jnp

from superslam_tpu.core.frame_tracker import FrameTracker
from superslam_tpu.geometry import Pose3, StereoCalib
from superslam_tpu.ops.frontend_step import TRACK_COLS, track_scan

CAL = StereoCalib(fx=80.0, fy=80.0, cx=80.0, cy=60.0, baseline=0.1)
CALT = (80.0, 80.0, 80.0, 60.0, 0.1)
K = 64


def project(pose: Pose3, Xw: np.ndarray) -> np.ndarray:
    p = pose.transform_to(Xw)
    z = p[:, 2]
    uL = CAL.fx * p[:, 0] / z + CAL.cx
    uR = CAL.fx * (p[:, 0] - CAL.baseline) / z + CAL.cx
    v = CAL.fy * p[:, 1] / z + CAL.cy
    return np.stack([uL, uR, v], axis=1)


def scan_args(frames_meas, track_ms):
    """Build (kl, disparity, stereo_ok, track_m) stacks from per-frame
    (K,3) stereo measurements in FRAME keypoint order."""
    kl = np.stack([np.stack([m[:, 0], m[:, 2]], 1) for m in frames_meas]).astype(
        np.float32
    )
    disp = np.stack([m[:, 0] - m[:, 1] for m in frames_meas]).astype(np.float32)
    ok = np.ones(disp.shape, bool)
    tm = np.stack(track_ms).astype(np.int32)
    return jnp.asarray(kl), jnp.asarray(disp), jnp.asarray(ok), jnp.asarray(tm)


def run_scan(kl, disp, ok, tm, xw, depth_ok, carry, min_matches=10, **gate_kw):
    return track_scan(
        kl, disp, ok, tm, jnp.asarray(xw, jnp.float32), jnp.asarray(depth_ok),
        carry,
        calib=CALT, min_matches=min_matches, track_sigma_px=10.0,
        disp_sigma0=8.0, disp_cond=CAL.bf / 40.0, **gate_kw,
    )


def identity_carry():
    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros((3,), jnp.float32)
    return (eye, zero, eye, zero)


def rows_to_pose(row):
    return Pose3(
        R=np.asarray(row[:9], np.float64).reshape(3, 3),
        t=np.asarray(row[9:12], np.float64),
    )


def test_track_scan_recovers_chained_poses():
    rng = np.random.default_rng(3)
    Xw = rng.uniform([-4, -3, 6], [4, 3, 18], (K, 3))
    true = [
        Pose3.expmap(np.array([0.0, 0.01, 0.0, 0.15, 0.0, 0.02])),
        Pose3.expmap(np.array([0.01, 0.02, 0.0, 0.30, -0.05, 0.04])),
        Pose3.expmap(np.array([0.02, 0.03, -0.01, 0.45, -0.1, 0.06])),
    ]
    # Frame keypoint order is a per-frame shuffle of the landmark order;
    # track_m[i] = where landmark i landed in the frame's keypoint list.
    metas, tms = [], []
    for s, pose in enumerate(true):
        perm = rng.permutation(K)
        inv = np.empty(K, np.int64)
        inv[perm] = np.arange(K)
        metas.append(project(pose, Xw)[perm])
        tms.append(inv)
    kl, disp, ok, tm = scan_args(metas, tms)
    out, carry = run_scan(kl, disp, ok, tm, Xw, np.ones(K, bool), identity_carry())
    out = np.asarray(out)
    assert out.shape == (3, TRACK_COLS)
    for s, pose in enumerate(true):
        got = rows_to_pose(out[s])
        assert int(out[s, 12]) == K
        err = pose.between(got).logmap()
        assert np.linalg.norm(err) < 1e-3, (s, err)
    # Carry pose == last frame's pose.
    np.testing.assert_allclose(np.asarray(carry[1]), true[-1].t, atol=1e-3)


def test_track_scan_matches_host_tracker_with_noise():
    """With pixel noise the device solve must agree with FrameTracker (the
    f64 oracle) run with the same prior chain, not just with ground truth.
    Gating disabled on both sides: this pins the core LM."""
    rng = np.random.default_rng(4)
    Xw = rng.uniform([-4, -3, 6], [4, 3, 18], (K, 3))
    true = Pose3.expmap(np.array([0.0, 0.02, 0.0, 0.2, -0.05, 0.03]))
    meas = project(true, Xw) + rng.normal(0, 0.5, (K, 3))
    tm = np.arange(K)  # identity correspondence
    kl, disp, ok, tmj = scan_args([meas], [tm])
    out, _ = run_scan(
        kl, disp, ok, tmj, Xw, np.ones(K, bool), identity_carry(),
        gate_px=0.0, chi2_rounds=0,
    )
    got = rows_to_pose(np.asarray(out)[0])

    import os

    os.environ["SUPERSLAM_NATIVE"] = "0"  # numpy oracle
    try:
        ref = FrameTracker(CAL).track_arrays(Pose3(), Xw, meas)
    finally:
        del os.environ["SUPERSLAM_NATIVE"]
    err = ref.between(got).logmap()
    assert np.linalg.norm(err) < 2e-3, err


def test_track_scan_gated_matches_host_track_gated():
    """The device prior-gate + chi2 re-rounds must agree with the numpy
    oracle recipe (FrameTracker.track_gated) on data with both noise and
    structured mismatches — same kept-set decisions, same optimum."""
    rng = np.random.default_rng(9)
    Xw = rng.uniform([-4, -3, 6], [4, 3, 18], (K, 3))
    true = Pose3.expmap(np.array([0.0, 0.02, 0.0, 0.2, -0.05, 0.03]))
    meas = project(true, Xw) + rng.normal(0, 0.3, (K, 3))
    bad = rng.choice(K, K // 4, replace=False)
    meas[bad] = meas[(bad + K // 2) % K]  # coherent mismatches
    kl, disp, ok, tmj = scan_args([meas], [np.arange(K)])
    out, _ = run_scan(
        kl, disp, ok, tmj, Xw, np.ones(K, bool), identity_carry(),
        gate_px=10.0, chi2_px=2.0, chi2_rounds=2,
    )
    got = rows_to_pose(np.asarray(out)[0])

    import os

    os.environ["SUPERSLAM_NATIVE"] = "0"  # numpy oracle
    try:
        ref, _keep = FrameTracker(CAL).track_gated(
            Pose3(), Xw, meas, gate_px=10.0, chi2_px=2.0, chi2_rounds=2,
            min_keep=10,
        )
    finally:
        del os.environ["SUPERSLAM_NATIVE"]
    err = ref.between(got).logmap()
    assert np.linalg.norm(err) < 2e-3, err
    # And both must actually be near the true pose — the gate is the only
    # thing standing between 25% mismatches and a diverged solve.
    assert np.linalg.norm(true.between(got).logmap()) < 2e-2


def test_track_scan_gate_rejects_structured_outliers():
    """The measured rendered-world failure: with ~35% coherent mismatches
    the ungated device solve lands far off; the default gated solve stays
    at the true pose."""
    rng = np.random.default_rng(10)
    Xw = rng.uniform([-4, -3, 6], [4, 3, 18], (K, 3))
    true = Pose3.expmap(np.array([0.01, 0.02, 0.0, 0.3, -0.05, 0.05]))
    meas = project(true, Xw)
    bad = rng.choice(K, int(0.35 * K), replace=False)
    meas[bad] = meas[(bad + K // 2) % K]
    kl, disp, ok, tmj = scan_args([meas], [np.arange(K)])

    out_g, _ = run_scan(
        kl, disp, ok, tmj, Xw, np.ones(K, bool), identity_carry(),
        gate_px=10.0, chi2_px=2.0, chi2_rounds=2,
    )
    out_u, _ = run_scan(
        kl, disp, ok, tmj, Xw, np.ones(K, bool), identity_carry(),
        gate_px=0.0, chi2_rounds=0,
    )
    e_gated = np.linalg.norm(
        true.between(rows_to_pose(np.asarray(out_g)[0])).logmap()
    )
    e_plain = np.linalg.norm(
        true.between(rows_to_pose(np.asarray(out_u)[0])).logmap()
    )
    assert e_gated < 5e-3, e_gated
    assert e_gated < 0.2 * max(e_plain, 1e-9), (e_plain, e_gated)


def test_track_scan_long_run_carry_stability():
    """100 frames in 10-frame dispatches with the carry threaded across
    calls (exactly the pipelined runtime's pattern): the pose chain must
    track a long trajectory without drift blowup and the carry rotation
    must stay on SO(3) (the in-scan re-orthonormalization's job — f32
    retraction products alone drift off the manifold linearly)."""
    rng = np.random.default_rng(7)
    carry = identity_carry()
    pose_prev = Pose3()
    kf_pose = Pose3()
    lms = None
    worst = 0.0
    for dispatch in range(10):
        if dispatch % 2 == 0:  # "keyframe insertion": refresh the landmarks
            kf_pose = pose_prev
            lms = kf_pose.transform_from(
                rng.uniform([-4, -3, 6], [4, 3, 18], (K, 3))
            )
        metas, tms, truths = [], [], []
        for s in range(10):
            i = dispatch * 10 + s
            true = Pose3.expmap(
                np.array([0.0, 0.002 * i, 0.0, 0.08 * i, 0.01 * i, 0.0])
            )
            truths.append(true)
            metas.append(project(true, lms))
            tms.append(np.arange(K))
            pose_prev = true
        kl, disp, ok, tm = scan_args(metas, tms)
        out, carry = run_scan(kl, disp, ok, tm, lms, np.ones(K, bool), carry)
        out = np.asarray(out)
        for s, true in enumerate(truths):
            err = np.linalg.norm(true.between(rows_to_pose(out[s])).logmap())
            worst = max(worst, err)
    assert worst < 5e-3, worst
    R = np.asarray(carry[0], np.float64)
    assert np.abs(R.T @ R - np.eye(3)).max() < 1e-5


def test_track_scan_mono_ignores_uR():
    """mono=True (the RGB-D device path): the uR residual row is weighted
    zero, so corrupting the disparity channel must not move the solution,
    and the (uL, v)-only solve still recovers the pose from KF world
    points."""
    rng = np.random.default_rng(6)
    Xw = rng.uniform([-4, -3, 6], [4, 3, 18], (K, 3))
    true = Pose3.expmap(np.array([0.0, 0.02, 0.01, 0.25, -0.05, 0.03]))
    meas = project(true, Xw)
    kl, disp, ok, tm = scan_args([meas], [np.arange(K)])

    def run_mono(disp_arr):
        return track_scan(
            kl, disp_arr, ok, tm, jnp.asarray(Xw, jnp.float32),
            jnp.asarray(np.ones(K, bool)), identity_carry(),
            calib=CALT, min_matches=10, track_sigma_px=10.0,
            disp_sigma0=1.0, disp_cond=1.0, mono=True,
        )

    out1, _ = run_mono(disp)
    out2, _ = run_mono(jnp.zeros_like(disp))  # disparity fully corrupted
    got1 = rows_to_pose(np.asarray(out1)[0])
    got2 = rows_to_pose(np.asarray(out2)[0])
    assert np.linalg.norm(true.between(got1).logmap()) < 1e-3
    assert np.linalg.norm(got1.between(got2).logmap()) < 1e-6


def test_undistort_points_jnp_matches_host():
    """The on-device radtan inversion must match io.undistort's
    cv::undistortPoints-equivalent to sub-hundredth-pixel."""
    from superslam_tpu.io.undistort import undistort_points
    from superslam_tpu.ops.rgbd_step import undistort_points_jnp

    rng = np.random.default_rng(8)
    pts = rng.uniform([5, 5], [155, 115], (64, 2))
    dist = np.array([-0.25, 0.08, 0.001, -0.002, 0.0])
    host = undistort_points(pts, CAL, dist)
    dev = np.asarray(
        undistort_points_jnp(
            jnp.asarray(pts, jnp.float32), CALT, tuple(dist.tolist())
        )
    )
    np.testing.assert_allclose(dev, host, atol=5e-3)


def test_track_scan_coasts_below_min_matches():
    rng = np.random.default_rng(5)
    Xw = rng.uniform([-4, -3, 6], [4, 3, 18], (K, 3))
    p1 = Pose3.expmap(np.array([0.0, 0.0, 0.0, 0.2, 0.0, 0.0]))
    m1 = project(p1, Xw)
    # Frame 2: tracking lost (no matches) -> constant velocity: pose = p1*rel
    # where rel = identity.between(p1) = p1.
    m2 = np.zeros((K, 3))
    m2[:, 0] = 1.0  # disparity 1, irrelevant (masked)
    kl, disp, ok, tm = scan_args(
        [m1, m2], [np.arange(K), np.full(K, -1, np.int64)]
    )
    out, _ = run_scan(kl, disp, ok, tm, Xw, np.ones(K, bool), identity_carry())
    out = np.asarray(out)
    assert int(out[1, 12]) == 0
    expected = p1 * p1
    got = rows_to_pose(out[1])
    assert np.linalg.norm(expected.between(got).logmap()) < 1e-3
    # Depth-invalid KF features must not count as correspondences.
    depth_ok = np.ones(K, bool)
    depth_ok[: K // 2] = False
    out2, _ = run_scan(kl, disp, ok, tm, Xw, depth_ok, identity_carry())
    assert int(np.asarray(out2)[0, 12]) == K - K // 2
