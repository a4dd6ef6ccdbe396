"""WindowSmoother recovers known poses + metric scale from perturbed seeds
(mirrors tests/test_window_smoother.cc), plus fixed-lag bookkeeping."""

import numpy as np

from superslam_tpu.core.window_smoother import StereoObs, WindowSmoother
from superslam_tpu.geometry import Pose3, stereo_project

from helpers import make_calib


def make_world(rng, n=60):
    return rng.uniform([-6, -4, 5], [6, 4, 30], size=(n, 3))


def observe(pose, lms, calib):
    obs = []
    for lm_id, X in enumerate(lms):
        try:
            m = stereo_project(pose, calib, X)
        except Exception:
            continue
        obs.append(StereoObs(lm_id, m))
    return obs


def test_recovers_poses_and_scale():
    """Mirror of tests/test_window_smoother.cc: 4 keyframes at 1 m spacing,
    6 landmarks at 7-12 m, later keyframes seeded with one shared perturbed
    offset (Rz(0.02), t=(0.1,-0.05,0.08)) the smoother must correct."""
    calib = make_calib()
    gt = [Pose3(t=np.array([float(i), 0.0, 0.0])) for i in range(4)]
    lms = np.array(
        [[0, 0, 8], [2, 1, 10], [-1, -1, 7], [3, 2, 12], [1, -2, 9], [-2, 1, 11]],
        dtype=float,
    )
    offset = Pose3.expmap(np.array([0.0, 0.0, 0.02, 0.1, -0.05, 0.08]))

    sm = WindowSmoother(calib, window_size=4)
    for k, tp in enumerate(gt):
        seed = tp if k == 0 else tp * offset
        sm.add_keyframe(k, seed, observe(tp, lms, calib))
    sm.optimize()

    assert sm.window_count() == 4
    # Metric scale: distance KF0->KF3 must be ~3 m (not drifted).
    d = np.linalg.norm(sm.pose_of(3).t - sm.pose_of(0).t)
    assert abs(d - 3.0) < 0.05
    for k, tp in enumerate(gt):
        est = sm.pose_of(k)
        assert np.linalg.norm(est.t - tp.t) < 0.05, f"kf {k}: {est.t} vs {tp.t}"
        assert np.abs(est.R - tp.R).max() < 0.05


def test_fixed_lag_drops_oldest():
    calib = make_calib()
    sm = WindowSmoother(calib, window_size=3)
    for i in range(5):
        sm.add_keyframe(i, Pose3(t=np.array([float(i), 0, 0])), [])
    assert sm.window_count() == 3
    assert not sm.in_window(0) and not sm.in_window(1)
    assert sm.in_window(2) and sm.in_window(4)


def test_single_keyframe_noop():
    calib = make_calib()
    sm = WindowSmoother(calib, window_size=8)
    sm.add_keyframe(0, Pose3(), [StereoObs(0, np.array([320.0, 295.0, 240.0]))])
    sm.optimize()  # needs parallax; must not throw
    assert sm.pose_of(0).translation_norm() == 0.0


def test_divergence_keeps_previous_poses():
    """Garbage observations must not corrupt the seeded poses."""
    rng = np.random.default_rng(22)
    calib = make_calib()
    sm = WindowSmoother(calib, window_size=8)
    seeds = [Pose3(t=np.array([0.5 * i, 0, 0])) for i in range(3)]
    for i, s in enumerate(seeds):
        obs = [
            StereoObs(j, rng.uniform([0, -2000, 0], [640, 0, 480]))
            for j in range(10)
        ]
        sm.add_keyframe(i, s, obs)
    sm.optimize()
    for i, s in enumerate(seeds):
        p = sm.pose_of(i)
        assert p.is_finite()
        assert p.translation_norm() < 1e6


def test_xla_smoother_matches_numpy(monkeypatch):
    """SUPERSLAM_XLA_SMOOTHER=1 routes optimize() through the on-device
    solve_window; the recovered window must match the numpy oracle."""
    calib = make_calib()
    gt = [Pose3(t=np.array([float(i), 0.0, 0.0])) for i in range(4)]
    lms = np.array(
        [[0, 0, 8], [2, 1, 10], [-1, -1, 7], [3, 2, 12], [1, -2, 9], [-2, 1, 11]],
        dtype=float,
    )
    offset = Pose3.expmap(np.array([0.0, 0.0, 0.02, 0.1, -0.05, 0.08]))

    def run():
        sm = WindowSmoother(calib, window_size=4)
        for k, tp in enumerate(gt):
            seed = tp if k == 0 else tp * offset
            sm.add_keyframe(k, seed, observe(tp, lms, calib))
        sm.optimize()
        return [sm.pose_of(k) for k in range(4)]

    monkeypatch.delenv("SUPERSLAM_XLA_SMOOTHER", raising=False)
    ref = run()
    monkeypatch.setenv("SUPERSLAM_XLA_SMOOTHER", "1")
    got = run()
    for a, b in zip(ref, got):
        assert np.linalg.norm(a.t - b.t) < 0.02
        assert np.abs(a.R - b.R).max() < 0.02
        # both recover ground truth
    for k, tp in enumerate(gt):
        assert np.linalg.norm(got[k].t - tp.t) < 0.05


def _contaminated_window(rng, calib, n_good=40, n_bad=16):
    """4 keyframes, good landmarks observed with mild noise plus wrong-
    association tracks: each bad track mixes measurements of two DIFFERENT
    3-D points (the failure mode noisy matchers feed the smoother)."""
    gt = [Pose3(t=np.array([0.25 * i, 0.0, 0.0])) for i in range(4)]
    good = rng.uniform([-5, -3, 6], [5, 3, 20], size=(n_good, 3))
    bad_a = rng.uniform([-5, -3, 6], [5, 3, 20], size=(n_bad, 3))
    bad_b = bad_a + rng.uniform(0.5, 2.0, size=(n_bad, 3))
    per_kf = []
    for k, tp in enumerate(gt):
        obs = []
        for j, X in enumerate(good):
            obs.append(StereoObs(j, stereo_project(tp, calib, X) + rng.normal(0, 0.5, 3)))
        for j in range(n_bad):
            X = bad_a[j] if k < 2 else bad_b[j]  # association switches mid-track
            obs.append(
                StereoObs(n_good + j, stereo_project(tp, calib, X) + rng.normal(0, 0.5, 3))
            )
        per_kf.append(obs)
    return gt, per_kf


def test_outlier_tracks_cannot_yank_window():
    """Regression for the r3 rendered-world blowup: with GTSAM's per-
    linearization outlier re-gate the LM could 'improve' error by moving
    poses until landmarks eject (5-7 m per-solve yanks, ATE 1.5 -> 1794 m).
    The frozen seed gate + Huber + trust region must keep every solve
    bounded AND not degrade the seeds."""
    rng = np.random.default_rng(5)
    calib = make_calib()
    gt, per_kf = _contaminated_window(rng, calib)
    offset = Pose3.expmap(np.array([0.0, 0.002, -0.003, 0.03, -0.02, 0.02]))

    sm = WindowSmoother(calib, window_size=4)
    seeds = []
    for k, tp in enumerate(gt):
        seed = tp if k == 0 else tp * offset
        seeds.append(seed)
        sm.add_keyframe(k, seed, per_kf[k])
    sm.optimize()

    seed_err = max(np.linalg.norm(s.t - g.t) for s, g in zip(seeds, gt))
    for k, tp in enumerate(gt):
        p = sm.pose_of(k)
        # bounded: no solve may move a pose past the trust region
        assert np.linalg.norm(p.t - seeds[k].t) <= 0.5 + 1e-9
        # and the contaminated solve must not be worse than the seeds
        assert np.linalg.norm(p.t - tp.t) <= seed_err + 0.02


def test_huber_native_matches_numpy_on_outliers():
    """The IRLS Huber weighting (SUPERSLAM_WS_HUBER_K) must agree between
    the numpy oracle and csrc ssl_window_lm on outlier-contaminated
    windows — the regime where the r3 native/numpy divergence appeared."""
    from superslam_tpu import native

    if not native.build():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(9)
    calib = make_calib()
    gt, per_kf = _contaminated_window(rng, calib)
    offset = Pose3.expmap(np.array([0.0, -0.002, 0.004, -0.04, 0.03, 0.05]))

    def run(native_on):
        import os

        os.environ["SUPERSLAM_NATIVE"] = "1" if native_on else "0"
        try:
            sm = WindowSmoother(calib, window_size=4)
            for k, tp in enumerate(gt):
                seed = tp if k == 0 else tp * offset
                sm.add_keyframe(k, seed, per_kf[k])
            sm.optimize()
            return [sm.pose_of(k) for k in range(4)]
        finally:
            os.environ.pop("SUPERSLAM_NATIVE", None)

    py = run(False)
    nat = run(True)
    for a, b in zip(py, nat):
        np.testing.assert_allclose(b.R, a.R, atol=5e-4)
        np.testing.assert_allclose(b.t, a.t, atol=5e-3)


def _reference_rebuild(sm, kf_ids):
    """The original per-obs Python rebuild (pre-vectorization), kept here as
    the oracle for the columnar fast path in WindowSmoother.optimize."""
    idx_of = {k: i for i, k in enumerate(kf_ids)}
    tracks = {}
    for kf in kf_ids:
        i = idx_of[kf]
        for o in sm._obs[kf]:
            tracks.setdefault(o.landmark_id, []).append((i, np.asarray(o.meas)))
    groups = {}
    by_len = {}
    for t in tracks.values():
        if len(t) < 2:
            continue
        views = np.array([v for v, _ in t], dtype=np.int64)
        meas = np.stack([m for _, m in t])
        by_len.setdefault(len(t), []).append((views, meas))
    for m, items in by_len.items():
        groups[m] = (
            np.stack([v for v, _ in items]),
            np.stack([x for _, x in items]),
        )
    return groups


def _vectorized_rebuild(sm, kf_ids):
    """Mirror of the columnar rebuild inside optimize() (same code path,
    extracted for the equality test)."""
    idx_of = {k: i for i, k in enumerate(kf_ids)}
    ids = np.concatenate([sm._obs_arr[kf][0] for kf in kf_ids])
    meas_all = np.concatenate([sm._obs_arr[kf][1] for kf in kf_ids])
    view_all = np.concatenate(
        [
            np.full(sm._obs_arr[kf][0].shape[0], idx_of[kf], np.int64)
            for kf in kf_ids
        ]
    )
    groups = {}
    if ids.size:
        _u, first, inv, counts = np.unique(
            ids, return_index=True, return_inverse=True, return_counts=True
        )
        perm = np.argsort(inv, kind="stable")
        starts = np.concatenate(([0], np.cumsum(counts[:-1])))
        views_s = view_all[perm]
        meas_s = meas_all[perm]
        fs_order = np.argsort(first, kind="stable")
        for m in dict.fromkeys(counts[fs_order].tolist()):
            if m < 2:
                continue
            sel = counts == m
            row_start = starts[sel][np.argsort(first[sel], kind="stable")]
            gi = row_start[:, None] + np.arange(m)[None, :]
            groups[int(m)] = (views_s[gi], meas_s[gi])
    return groups


def _random_window(rng, n_kf=8, n_lm=120, p_see=0.55):
    calib = make_calib()
    sm = WindowSmoother(calib, window_size=n_kf)
    lms = rng.uniform([-8, -4, 4], [8, 4, 28], size=(n_lm, 3))
    for k in range(n_kf):
        pose = Pose3(t=np.array([0.15 * k, 0.0, 0.6 * k]))
        obs = []
        for lm_id in rng.permutation(n_lm):  # scrambled per-kf obs order
            if rng.random() > p_see:
                continue
            try:
                m = stereo_project(pose, calib, lms[lm_id])
            except Exception:
                continue
            m = m + rng.normal(0, 0.4, 3)
            if rng.random() < 0.05:
                m = m + rng.normal(0, 25.0, 3)  # gross outliers for the gate
            obs.append(StereoObs(int(lm_id), m))
        sm.add_keyframe(k, pose, obs)
    return sm


def test_vectorized_rebuild_bitwise_equals_reference():
    rng = np.random.default_rng(3)
    for _ in range(3):
        sm = _random_window(rng)
        kf_ids = list(sm._window)
        ref = _reference_rebuild(sm, kf_ids)
        fast = _vectorized_rebuild(sm, kf_ids)
        assert list(ref) == list(fast)  # same group keys, same ORDER
        for m in ref:
            rv, rm = ref[m]
            fv, fm = fast[m]
            assert rv.dtype == fv.dtype and rm.dtype == fm.dtype
            np.testing.assert_array_equal(rv, fv)
            np.testing.assert_array_equal(rm, fm)


def test_merged_prefilter_bitwise_equals_reference():
    rng = np.random.default_rng(7)
    for _ in range(3):
        sm = _random_window(rng)
        kf_ids = list(sm._window)
        poses = [sm._poses[k] for k in kf_ids]
        groups = _vectorized_rebuild(sm, kf_ids)
        ref = sm._prefilter_groups_ref(poses, groups, 3.0)
        fast = sm._prefilter_groups(poses, groups, 3.0)
        assert list(ref) == list(fast)
        for m in ref:
            np.testing.assert_array_equal(ref[m][0], fast[m][0])
            np.testing.assert_array_equal(ref[m][1], fast[m][1])


def test_solve_every_cadence_still_recovers_poses(monkeypatch):
    """SUPERSLAM_WS_SOLVE_EVERY=2: incremental add+optimize per keyframe
    with alternating full/light solves must still recover ground truth,
    and the first optimize() is always a FULL solve (the counter seeds
    high), so a cold window never gets only the 1-iteration polish."""
    calib = make_calib()
    gt = [Pose3(t=np.array([float(i), 0.0, 0.0])) for i in range(6)]
    lms = make_world(np.random.default_rng(11), n=80)
    offset = Pose3.expmap(np.array([0.0, 0.0, 0.02, 0.1, -0.05, 0.08]))

    monkeypatch.setenv("SUPERSLAM_WS_SOLVE_EVERY", "2")
    sm = WindowSmoother(calib, window_size=6)
    seen_iters = []
    orig = sm._solve_backend

    def spy(poses, groups, sigma_px, prior_pose, prior_sigma, max_iters, huber_k=0.0):
        seen_iters.append(max_iters)
        return orig(poses, groups, sigma_px, prior_pose, prior_sigma, max_iters, huber_k)

    monkeypatch.setattr(sm, "_solve_backend", spy)
    for k, tp in enumerate(gt):
        seed = tp if k == 0 else tp * offset
        sm.add_keyframe(k, seed, observe(tp, lms, calib))
        sm.optimize()

    # optimize() early-returns at window_count < 2, so the first recorded
    # solve (k=1) must be full; thereafter full/light alternate.
    assert seen_iters[0] == 4
    assert 1 in seen_iters and 4 in seen_iters[1:]
    for k, tp in enumerate(gt):
        est = sm.pose_of(k)
        assert np.linalg.norm(est.t - tp.t) < 0.05, f"kf {k}: {est.t} vs {tp.t}"
