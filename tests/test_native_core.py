"""Native (C++) estimation core vs the Python oracle: SE(3) primitives,
pose-only LM, and pose-graph LM must agree. Builds csrc/ on demand; skips
if no toolchain."""

import numpy as np
import pytest

from superslam_tpu import native
from superslam_tpu.core.factors import HUBER_K, stereo_diag_sigmas
from superslam_tpu.core.frame_tracker import FrameTracker
from superslam_tpu.geometry import Pose3, stereo_project

from helpers import make_calib

pytestmark = pytest.mark.skipif(
    not native.build(), reason="native toolchain unavailable"
)


def _pack(p):
    return native._pack(p)


def test_se3_primitives_match_python():
    import ctypes

    lib = native._load()
    assert lib is not None
    rng = np.random.default_rng(0)
    for _ in range(30):
        xi = rng.standard_normal(6)
        out = np.empty(12)
        lib.ssl_se3_exp(np.ascontiguousarray(xi), out)
        ref = Pose3.expmap(xi)
        np.testing.assert_allclose(out[:9].reshape(3, 3), ref.R, atol=1e-12)
        np.testing.assert_allclose(out[9:], ref.t, atol=1e-12)
        back = np.empty(6)
        lib.ssl_se3_log(out, back)
        np.testing.assert_allclose(back, xi, atol=1e-9)

    a = Pose3.expmap(rng.standard_normal(6))
    b = Pose3.expmap(rng.standard_normal(6))
    out = np.empty(12)
    lib.ssl_se3_between(_pack(a), _pack(b), out)
    ref = a.between(b)
    np.testing.assert_allclose(out[:9].reshape(3, 3), ref.R, atol=1e-12)


def test_pose_only_lm_matches_python_tracker():
    rng = np.random.default_rng(1)
    calib = make_calib()
    true_pose = Pose3.expmap(np.array([0.02, -0.01, 0.03, 0.4, -0.1, 0.2]))
    Xw = true_pose.transform_from(rng.uniform([-4, -3, 4], [4, 3, 25], size=(50, 3)))
    meas = np.stack([stereo_project(true_pose, calib, x) for x in Xw])
    # A few sign-symmetric outliers to exercise the Huber path.
    meas[::7] += rng.uniform(30, 60, size=meas[::7].shape) * rng.choice(
        [-1, 1], size=meas[::7].shape
    )

    sigmas = stereo_diag_sigmas(10.0, meas[:, 0] - meas[:, 1], calib.bf)
    est_native = native.pose_only_lm(Xw, meas, sigmas, calib, HUBER_K, Pose3())
    est_py = FrameTracker(calib).track_arrays(Pose3(), Xw, meas)
    # Huber bounds the damage from 16% gross outliers at the coarse
    # (sigma=10 px) tracking noise; the strict check is native == python.
    assert np.linalg.norm(est_native.t - true_pose.t) < 0.3
    # Same optimum as the Python solver.
    assert np.linalg.norm(est_native.t - est_py.t) < 5e-3
    assert np.abs(est_native.R - est_py.R).max() < 1e-3


def test_pose_graph_lm_matches_python():
    rng = np.random.default_rng(2)
    true_poses = [Pose3(t=np.array([1.0 * i, 0.0, 0.0])) for i in range(6)]
    seeds = [true_poses[0]] + [
        p.retract(rng.standard_normal(6) * 0.1) for p in true_poses[1:]
    ]
    inv_sig = 1.0 / np.array([0.02, 0.02, 0.02, 0.05, 0.05, 0.05])
    edges = []
    for i in range(5):
        rel = true_poses[i].between(true_poses[i + 1])
        edges.append((i, i + 1, rel, inv_sig, 0.0))
    result = native.pose_graph_lm(seeds, edges, prior_idx=0, prior_sigma=1e-4)
    assert result is not None
    for i, tp in enumerate(true_poses):
        assert np.linalg.norm(result[i].t - tp.t) < 1e-3


def test_pose_graph_lm_with_huber_loop_edge():
    true_final = Pose3(t=np.array([7.0, 0.0, 0.0]))
    drift_rel = Pose3(t=np.array([1.0, 0.08, 0.0]))
    seeds = [Pose3()]
    for i in range(1, 8):
        seeds.append(seeds[-1] * drift_rel)
    inv_sig = 1.0 / np.array([0.02, 0.02, 0.02, 0.05, 0.05, 0.05])
    edges = [(i, i + 1, drift_rel, inv_sig, 0.0) for i in range(7)]
    edges.append(
        (0, 7, true_final, 1.0 / np.array([0.02] * 3 + [0.05] * 3), float(np.sqrt(7.815)))
    )
    result = native.pose_graph_lm(seeds, edges, prior_idx=0, prior_sigma=1e-4)
    assert result is not None
    assert abs(result[7].t[1]) < abs(seeds[7].t[1]) * 0.5


def test_window_lm_matches_python_smoother():
    """ssl_window_lm vs the numpy WindowSmoother._lm oracle on a noisy
    multi-keyframe window: identical keep/Schur/LM semantics must land on
    the same optimum from the same seeds."""
    from superslam_tpu import native
    from superslam_tpu.core.window_smoother import StereoObs, WindowSmoother
    from superslam_tpu.geometry import Pose3, stereo_project

    from helpers import make_calib

    assert native.build()
    rng = np.random.default_rng(11)
    calib = make_calib()
    gt = [
        Pose3.expmap(np.array([0, 0.01 * k, 0, 0.9 * k, 0.05 * k, 0.1 * k]))
        for k in range(5)
    ]
    lms = rng.uniform([-8, -5, 6], [8, 5, 28], size=(80, 3))

    def observe(pose):
        obs = []
        for lm_id, X in enumerate(lms):
            try:
                m = stereo_project(pose, calib, X)
            except Exception:
                continue
            obs.append(StereoObs(lm_id, m + rng.normal(0, 0.3, 3)))
        return obs

    def run(native_on):
        import os

        os.environ["SUPERSLAM_NATIVE"] = "1" if native_on else "0"
        try:
            sm = WindowSmoother(calib, window_size=5)
            per_kf = [observe(p) for p in gt]
            for k, tp in enumerate(gt):
                seed = tp if k == 0 else tp * Pose3.expmap(
                    np.array([0.004, -0.003, 0.006, 0.06, -0.04, 0.05])
                )
                sm.add_keyframe(k, seed, per_kf[k])
            sm.optimize()
            return [sm.pose_of(k) for k in range(5)]
        finally:
            os.environ.pop("SUPERSLAM_NATIVE", None)

    rng_state = rng.bit_generator.state
    py = run(False)
    rng.bit_generator.state = rng_state  # identical observation noise
    nat = run(True)
    for p, q in zip(py, nat):
        np.testing.assert_allclose(q.R, p.R, atol=2e-4)
        np.testing.assert_allclose(q.t, p.t, atol=2e-3)
    # Both recover the ground truth to the noise floor.
    for p, tp in zip(nat, gt):
        assert np.linalg.norm(p.t - tp.t) < 0.05

def test_window_seed_gate_matches_python():
    """ssl_window_seed_gate vs the numpy _prefilter_groups oracle: exact
    keep-set parity on an outlier-heavy window (~2/3 of tracks rejected),
    including cheirality / broken-disparity / near-threshold cases. The
    native gate sits on the tracking drain path at every keyframe insertion
    (the numpy batch was 80-90% of ws_solve)."""
    import os

    from superslam_tpu.core.window_smoother import WindowSmoother
    from superslam_tpu.geometry import Pose3, stereo_project

    from helpers import make_calib

    assert native.build()
    rng = np.random.default_rng(7)
    calib = make_calib()
    poses = [
        Pose3.expmap(
            np.concatenate([rng.normal(0, 0.02, 3), [0.2 * k, 0, 0.05 * k]])
        )
        for k in range(8)
    ]
    lms = rng.uniform([-8, -5, 6], [8, 5, 28], size=(500, 3))
    groups = {}
    for m in (2, 3, 5, 8):
        Lm = 150
        views = np.sort(rng.integers(0, 8, (Lm, m)), axis=1)
        sel = rng.choice(500, Lm)
        meas = np.zeros((Lm, m, 3))
        for i in range(Lm):
            for j in range(m):
                noise = (
                    rng.normal(0, 0.5, 3)
                    if rng.random() > 0.3
                    else rng.normal(0, 12.0, 3)  # > gate outlier views
                )
                meas[i, j] = stereo_project(
                    poses[views[i, j]], calib, lms[sel[i]]
                ) + noise
            if rng.random() < 0.05:  # broken first-view disparity
                meas[i, 0, 1] = meas[i, 0, 0] + abs(rng.normal(0, 1))
        groups[m] = (views, meas)

    sm = WindowSmoother(calib, window_size=8)
    ref = sm._prefilter_groups_ref(poses, groups, 6.0)
    try:
        os.environ["SUPERSLAM_NATIVE"] = "1"
        fast = sm._prefilter_groups(poses, groups, 6.0)
        os.environ["SUPERSLAM_NATIVE"] = "0"
        slow = sm._prefilter_groups(poses, groups, 6.0)
    finally:
        os.environ.pop("SUPERSLAM_NATIVE", None)

    assert set(fast) == set(slow) == set(ref)
    rejected = 0
    for m in groups:
        for a, b in ((fast[m], slow[m]), (fast[m], ref[m])):
            np.testing.assert_array_equal(a[0], b[0])
            np.testing.assert_array_equal(a[1], b[1])
        rejected += groups[m][0].shape[0] - fast[m][0].shape[0]
    assert rejected > 100  # the gate actually exercised rejection
