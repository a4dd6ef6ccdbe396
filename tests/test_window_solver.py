"""XLA window solver vs the numpy oracle: triangulation and the full
Schur-reduced camera system must agree on the same synthetic window."""

import numpy as np
import pytest

import jax.numpy as jnp

from superslam_tpu.core.window_smoother import WindowSmoother
from superslam_tpu.geometry import Pose3, stereo_project
from superslam_tpu.ops.window_solver import build_reduced_system, triangulate

from helpers import make_calib


@pytest.fixture
def problem():
    rng = np.random.default_rng(7)
    calib = make_calib()
    gt = [Pose3(t=np.array([float(i), 0.0, 0.0])) for i in range(4)]
    offset = Pose3.expmap(np.array([0.0, 0.0, 0.01, 0.05, -0.02, 0.04]))
    poses = [gt[0]] + [p * offset for p in gt[1:]]
    lms = rng.uniform([-5, -3, 6], [5, 3, 20], size=(24, 3))
    m = len(gt)
    views = np.tile(np.arange(m), (len(lms), 1)).astype(np.int32)
    meas = np.stack(
        [[stereo_project(g, calib, X) for g in gt] for X in lms]
    ).astype(np.float32)
    return calib, poses, lms, views, meas


def test_triangulation_matches_numpy(problem):
    calib, poses, lms, views, meas = problem
    R = np.stack([p.R for p in poses]).astype(np.float32)
    t = np.stack([p.t for p in poses]).astype(np.float32)
    ct = (calib.fx, calib.fy, calib.cx, calib.cy, calib.baseline)
    X, ok = triangulate(jnp.asarray(R), jnp.asarray(t), jnp.asarray(views), jnp.asarray(meas), ct)
    assert np.asarray(ok).all()

    sm = WindowSmoother(calib, 8)
    Xn, okn = sm._triangulate_group(
        np.stack([p.R for p in poses]), np.stack([p.t for p in poses]),
        views.astype(np.int64), meas.astype(np.float64),
    )
    assert okn.all()
    np.testing.assert_allclose(np.asarray(X), Xn, atol=2e-2)


def test_reduced_system_matches_numpy(problem):
    calib, poses, lms, views, meas = problem
    R = np.stack([p.R for p in poses]).astype(np.float32)
    t = np.stack([p.t for p in poses]).astype(np.float32)
    ct = (calib.fx, calib.fy, calib.cx, calib.cy, calib.baseline)
    lm_valid = np.ones(len(lms), bool)
    H, b, err = build_reduced_system(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(views), jnp.asarray(meas),
        jnp.asarray(lm_valid), ct, inv_sigma=1.0, dyn_outlier_px=1e9,
        num_poses=len(poses),
    )
    H, b = np.asarray(H, np.float64), np.asarray(b, np.float64)

    sm = WindowSmoother(calib, 8)
    groups = {views.shape[1]: (views.astype(np.int64), meas.astype(np.float64))}
    Hn, bn = sm._build_reduced_system(
        poses, groups, inv_sigma=1.0, dyn_outlier_px=0.0,
        prior_pose=poses[0], prior_info=0.0,
    )
    scale = max(np.abs(Hn).max(), 1.0)
    np.testing.assert_allclose(H / scale, Hn / scale, atol=2e-3)
    bscale = max(np.abs(bn).max(), 1.0)
    np.testing.assert_allclose(b / bscale, bn / bscale, atol=2e-3)


def test_gn_step_improves_error(problem):
    """One damped GN step on the XLA system must reduce the reprojection
    error of the perturbed window."""
    calib, poses, lms, views, meas = problem
    ct = (calib.fx, calib.fy, calib.cx, calib.cy, calib.baseline)
    lm_valid = np.ones(len(lms), bool)

    def system(ps):
        R = np.stack([p.R for p in ps]).astype(np.float32)
        t = np.stack([p.t for p in ps]).astype(np.float32)
        return build_reduced_system(
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(views), jnp.asarray(meas),
            jnp.asarray(lm_valid), ct, inv_sigma=1.0, dyn_outlier_px=1e9,
            num_poses=len(ps),
        )

    H, b, err0 = system(poses)
    H = np.asarray(H, np.float64)
    b = np.asarray(b, np.float64)
    K = len(poses)
    # Gauge: clamp the first pose block.
    H[:6, :6] += 1e8 * np.eye(6)
    delta = np.linalg.solve(H + 1e-3 * np.eye(6 * K), -b)
    new_poses = [p.retract(delta[6 * i : 6 * i + 6]) for i, p in enumerate(poses)]
    _, _, err1 = system(new_poses)
    assert float(err1) < 0.2 * float(err0)


def test_full_device_window_solve_matches_numpy(problem):
    """solve_window (on-device LM driver) must recover the window like the
    numpy smoother does on the same reference-style problem."""
    from superslam_tpu.ops.window_solver import solve_window

    calib, poses, lms, views, meas = problem
    gt = [Pose3(t=np.array([float(i), 0.0, 0.0])) for i in range(4)]
    ct = (calib.fx, calib.fy, calib.cx, calib.cy, calib.baseline)
    R0 = np.stack([p.R for p in poses]).astype(np.float32)
    t0 = np.stack([p.t for p in poses]).astype(np.float32)
    L, m = views.shape
    R, t = solve_window(
        jnp.asarray(R0),
        jnp.asarray(t0),
        jnp.asarray(views),
        jnp.asarray(meas),
        jnp.asarray(np.ones(L, bool)),
        jnp.asarray(np.ones((L, m), bool)),
        ct,
        inv_sigma=1.0,
        dyn_outlier_px=1e9,
        prior_info=1e8,
        num_poses=4,
        max_iters=8,
    )
    R, t = np.asarray(R, np.float64), np.asarray(t, np.float64)
    for k, g in enumerate(gt):
        assert np.linalg.norm(t[k] - g.t) < 0.05, (k, t[k], g.t)
        assert np.abs(R[k] - g.R).max() < 0.05


def test_obs_mask_equals_shorter_tracks(problem):
    """A padded (L, m) group with masked tail observations must equal the
    exact shorter-track system."""
    calib, poses, lms, views, meas = problem
    ct = (calib.fx, calib.fy, calib.cx, calib.cy, calib.baseline)
    R = np.stack([p.R for p in poses]).astype(np.float32)
    t = np.stack([p.t for p in poses]).astype(np.float32)
    L = views.shape[0]
    # Exact: only the first 3 views of each track.
    H3, b3, _ = build_reduced_system(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(views[:, :3]),
        jnp.asarray(meas[:, :3]), jnp.asarray(np.ones(L, bool)), ct,
        inv_sigma=1.0, dyn_outlier_px=1e9, num_poses=4,
    )
    # Padded: all 4 views, last one masked out.
    ov = np.ones((L, 4), bool)
    ov[:, 3] = False
    H4, b4, _ = build_reduced_system(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(views), jnp.asarray(meas),
        jnp.asarray(np.ones(L, bool)), ct, inv_sigma=1.0, dyn_outlier_px=1e9,
        num_poses=4, obs_valid=jnp.asarray(ov),
    )
    scale = max(float(np.abs(np.asarray(H3)).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(H4) / scale, np.asarray(H3) / scale, atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(b4), np.asarray(b3), rtol=2e-2, atol=2.0)
