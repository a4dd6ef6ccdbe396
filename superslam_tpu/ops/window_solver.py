"""Windowed-BA reduced camera system as batched XLA linear algebra.

The on-device re-expression of WindowSmoother's variable-projection smart-
stereo linearization (core/window_smoother.py, itself the equivalent of
GTSAM's SmartStereoProjectionPoseFactor stack): batched point triangulation
(GN, poses fixed), per-landmark 3x3 Schur elimination, and scatter-assembly
of the dense 6K x 6K reduced system — all one jitted program in f32.

The host numpy path is the accuracy oracle (f64) and remains the default:
on hosts with a high-latency device link the ~per-call round trip dwarfs
the window's tiny FLOP count, and SLAM's serial keyframe cadence cannot
amortize it. On a locally-attached chip this program lets the whole
tracking loop stay on-device. Validated against the numpy linearization in
tests/test_window_solver.py.

Layout: a window of K poses (R (K,3,3), t (K,3)) and one landmark group of
track length m: views (L, m) int32, meas (L, m, 3) f32, lm_valid (L,) bool.
Isotropic measurement sigma; dynamic outlier rejection threshold in px.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .precision import highest_f32_matmuls


def _proj_residuals(p, iz, meas, fx, fy, cx, cy, baseline):
    proj_uL = fx * p[..., 0] * iz + cx
    proj_uR = fx * (p[..., 0] - baseline) * iz + cx
    proj_v = fy * p[..., 1] * iz + cy
    return jnp.stack([proj_uL, proj_uR, proj_v], axis=-1) - meas


def _proj_jacobian(p, iz, fx, fy, baseline):
    iz2 = iz * iz
    z = jnp.zeros_like(iz)
    row0 = jnp.stack([fx * iz, z, -fx * p[..., 0] * iz2], axis=-1)
    row1 = jnp.stack([fx * iz, z, -fx * (p[..., 0] - baseline) * iz2], axis=-1)
    row2 = jnp.stack([z, fy * iz, -fy * p[..., 1] * iz2], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)  # (..., 3, 3)


@highest_f32_matmuls
def triangulate(R, t, views, meas, calib, iters: int = 5, obs_valid=None):
    """Batched GN point triangulation. Returns (X (L,3), ok (L,)).

    obs_valid (L, m) optionally masks padded observations (tracks shorter
    than the group length); the FIRST observation of every landmark must be
    valid (callers sort valid observations first).
    """
    fx, fy, cx, cy, baseline = calib
    Rv = R[views]  # (L, m, 3, 3)
    tv = t[views]  # (L, m, 3)
    ov = (
        jnp.ones(views.shape, jnp.float32)
        if obs_valid is None
        else obs_valid.astype(jnp.float32)
    )

    uL0, uR0, v0 = meas[:, 0, 0], meas[:, 0, 1], meas[:, 0, 2]
    disp0 = uL0 - uR0
    ok = disp0 > 1e-6
    z0 = fx * baseline / jnp.where(ok, disp0, 1.0)
    cam0 = jnp.stack([(uL0 - cx) * z0 / fx, (v0 - cy) * z0 / fy, z0], axis=1)
    X = jnp.einsum("lij,lj->li", Rv[:, 0], cam0) + tv[:, 0]

    def step(_, carry):
        X, ok = carry
        p = jnp.einsum("lmji,lmj->lmi", Rv, X[:, None, :] - tv)
        z = p[..., 2]
        ok = ok & jnp.all((z > 1e-9) | (ov < 0.5), axis=1)
        iz = 1.0 / jnp.where(z > 1e-9, z, 1.0)
        r = _proj_residuals(p, iz, meas, fx, fy, cx, cy, baseline) * ov[..., None]
        Jp = _proj_jacobian(p, iz, fx, fy, baseline) * ov[..., None, None]
        Jx = jnp.einsum("lmij,lmkj->lmik", Jp, Rv)
        A = jnp.einsum("lmij,lmik->ljk", Jx, Jx) + 1e-9 * jnp.eye(3)
        g = jnp.einsum("lmij,lmi->lj", Jx, r)
        delta = -jnp.linalg.solve(A, g[..., None])[..., 0]
        X = X + jnp.where(ok[:, None], delta, 0.0)
        return X, ok

    X, ok = jax.lax.fori_loop(0, iters, step, (X, ok))
    p = jnp.einsum("lmji,lmj->lmi", Rv, X[:, None, :] - tv)
    ok = ok & jnp.all((p[..., 2] > 1e-9) | (ov < 0.5), axis=1)
    ok = ok & jnp.isfinite(X).all(axis=1)
    return X, ok


@functools.partial(jax.jit, static_argnames=("num_poses",))
@highest_f32_matmuls
def build_reduced_system(
    R: jnp.ndarray,  # (K, 3, 3)
    t: jnp.ndarray,  # (K, 3)
    views: jnp.ndarray,  # (L, m) int32
    meas: jnp.ndarray,  # (L, m, 3)
    lm_valid: jnp.ndarray,  # (L,) bool (padding mask)
    calib: tuple,  # (fx, fy, cx, cy, baseline)
    inv_sigma: float,
    dyn_outlier_px: float,
    num_poses: int,
    obs_valid: jnp.ndarray | None = None,  # (L, m) per-observation mask
    huber_k: float = 0.0,
):
    """Returns (H (6K, 6K), b (6K,), error scalar) — Schur-reduced over the
    landmark group, with ZERO_ON_DEGENERACY + dynamic outlier rejection
    folded in as masks. With obs_valid, one padded (L, m_max) group covers
    mixed track lengths (valid observations must come first per landmark)."""
    fx, fy, cx, cy, baseline = calib
    K = num_poses
    ov = (
        jnp.ones(views.shape, jnp.float32)
        if obs_valid is None
        else obs_valid.astype(jnp.float32)
    )
    X, ok = triangulate(R, t, views, meas, calib, obs_valid=obs_valid)
    Rv, tv = R[views], t[views]
    p = jnp.einsum("lmji,lmj->lmi", Rv, X[:, None, :] - tv)
    z = p[..., 2]
    iz = 1.0 / jnp.where(z > 1e-9, z, 1.0)
    r = _proj_residuals(p, iz, meas, fx, fy, cx, cy, baseline) * ov[..., None]
    maxerr = jnp.max(jnp.linalg.norm(r, axis=-1), axis=-1)
    # dyn_outlier_px <= 0 disables the dynamic gate (the smoother pre-filters
    # outliers at the seed poses and passes 0 down; window_smoother.py).
    keep = ok & lm_valid & ((dyn_outlier_px <= 0) | (maxerr < dyn_outlier_px))
    wl = keep.astype(jnp.float32)  # (L,)

    Jp = _proj_jacobian(p, iz, fx, fy, baseline) * ov[..., None, None]
    L, m = views.shape
    # d p_cam / d xi = [skew(p_cam), -I] (right retraction, rotation-first).
    zeros = jnp.zeros_like(p[..., 0])
    Dcam = jnp.stack(
        [
            jnp.stack([zeros, -p[..., 2], p[..., 1], -jnp.ones_like(zeros), zeros, zeros], -1),
            jnp.stack([p[..., 2], zeros, -p[..., 0], zeros, -jnp.ones_like(zeros), zeros], -1),
            jnp.stack([-p[..., 1], p[..., 0], zeros, zeros, zeros, -jnp.ones_like(zeros)], -1),
        ],
        axis=-2,
    )  # (L, m, 3, 6)
    U = jnp.einsum("lmij,lmjk->lmik", Jp, Dcam) * inv_sigma
    Jx = jnp.einsum("lmij,lmkj->lmik", Jp, Rv) * inv_sigma
    rw = r * inv_sigma
    # IRLS Huber (huber_k > 0): scale each view's whitened residual/Jacobians
    # by sqrt(min(1, k/e)) — mirrors WindowSmoother._build_reduced_system.
    e = jnp.linalg.norm(rw, axis=-1)  # (L, m); padded views give e = 0
    sw = jnp.where(
        huber_k > 0,
        jnp.sqrt(jnp.minimum(1.0, huber_k / jnp.maximum(e, 1e-12))),
        1.0,
    )
    U = U * sw[..., None, None]
    Jx = Jx * sw[..., None, None]
    rw = rw * sw[..., None]

    # Zero dropped landmarks so their Schur terms vanish.
    U = U * wl[:, None, None, None]
    rw = rw * wl[:, None, None]

    A = jnp.einsum("lmij,lmik->ljk", Jx, Jx) + 1e-6 * jnp.eye(3)
    Ainv = jnp.linalg.inv(A)
    W = jnp.einsum("lmij,lmik->lmjk", U, Jx)  # (L, m, 6, 3)
    gx = jnp.einsum("lmij,lmi->lj", Jx, rw)
    Ainv_gx = jnp.einsum("lij,lj->li", Ainv, gx)

    Hdiag = jnp.einsum("lmij,lmik->lmjk", U, U)  # (L, m, 6, 6)
    gdiag = jnp.einsum("lmij,lmi->lmj", U, rw)
    gcorr = jnp.einsum("lmjk,lk->lmj", W, Ainv_gx)
    WAinv = jnp.einsum("lmjk,lki->lmji", W, Ainv)
    corr = jnp.einsum("lmji,lnki->lmnjk", WAinv, W)  # (L, m, m, 6, 6)

    Hblk = jnp.zeros((K, K, 6, 6))
    bblk = jnp.zeros((K, 6))
    vj = views  # (L, m)
    bblk = bblk.at[vj].add(gdiag - gcorr)
    Hblk = Hblk.at[vj, vj].add(Hdiag)
    vj_b = jnp.broadcast_to(views[:, :, None], (L, m, m))
    vk_b = jnp.broadcast_to(views[:, None, :], (L, m, m))
    Hblk = Hblk.at[vj_b, vk_b].add(-corr)

    H = Hblk.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    b = bblk.reshape(6 * K)
    err = 0.5 * jnp.sum(rw * rw)
    return H, b, err


def _window_error(
    R, t, views, meas, lm_valid, obs_valid, calib, inv_sigma, dyn_px,
    huber_k=0.0,
):
    fx, fy, cx, cy, baseline = calib
    ov = obs_valid.astype(jnp.float32)
    X, ok = triangulate(R, t, views, meas, calib, obs_valid=obs_valid)
    Rv, tv = R[views], t[views]
    p = jnp.einsum("lmji,lmj->lmi", Rv, X[:, None, :] - tv)
    z = p[..., 2]
    iz = 1.0 / jnp.where(z > 1e-9, z, 1.0)
    r = _proj_residuals(p, iz, meas, fx, fy, cx, cy, baseline) * ov[..., None]
    maxerr = jnp.max(jnp.linalg.norm(r, axis=-1), axis=-1)
    keep = (ok & lm_valid & ((dyn_px <= 0) | (maxerr < dyn_px))).astype(
        jnp.float32
    )
    rw = r * inv_sigma * keep[:, None, None]
    e = jnp.linalg.norm(rw, axis=-1)  # (L, m) whitened per-view norms
    rho = jnp.where(
        (huber_k > 0) & (e > huber_k),
        huber_k * e - 0.5 * huber_k * huber_k,
        0.5 * e * e,
    )
    return jnp.sum(rho)


@functools.partial(jax.jit, static_argnames=("num_poses", "max_iters"))
@highest_f32_matmuls
def solve_window(
    R0: jnp.ndarray,  # (K, 3, 3) seed rotations (Twc)
    t0: jnp.ndarray,  # (K, 3) seed translations
    views: jnp.ndarray,  # (L, m) int32
    meas: jnp.ndarray,  # (L, m, 3) f32
    lm_valid: jnp.ndarray,  # (L,) bool
    obs_valid: jnp.ndarray,  # (L, m) bool (valid observations FIRST per row)
    calib: tuple,
    inv_sigma: float,
    dyn_outlier_px: float,
    prior_info: float,
    num_poses: int,
    max_iters: int = 4,
    huber_k: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full smart-stereo window LM on device: the `lax.while_loop` driver
    around the Schur-reduced system (WindowSmoother._lm semantics: gauge
    prior on pose 0, accept/reject damping, tol 1e-3). Returns (R, t)."""
    from .pose_solver import _retract, _se3_log

    K = num_poses

    def prior_err(R, t):
        # Log( prior^-1 * pose0 ); prior = the seed pose of pose 0.
        dR = R0[0].T @ R[0]
        dt = R0[0].T @ (t[0] - t0[0])
        dxi = _se3_log(dR, dt)
        return 0.5 * prior_info * (dxi @ dxi), dxi

    def total_error(R, t):
        e, _ = prior_err(R, t)
        return e + _window_error(
            R, t, views, meas, lm_valid, obs_valid, calib, inv_sigma,
            dyn_outlier_px, huber_k,
        )

    def retract_all(R, t, delta):
        def one(i):
            return _retract(R[i], t[i], jax.lax.dynamic_slice(delta, (6 * i,), (6,)))

        Rs, ts = [], []
        for i in range(K):  # K is static and small
            Ri, ti = one(i)
            Rs.append(Ri)
            ts.append(ti)
        return jnp.stack(Rs), jnp.stack(ts)

    def cond(state):
        i, R, t, lam, err, done = state
        return (i < max_iters) & jnp.logical_not(done)

    def body(state):
        i, R, t, lam, err, done = state
        H, b, _ = build_reduced_system(
            R, t, views, meas, lm_valid, calib, inv_sigma, dyn_outlier_px,
            num_poses=K, obs_valid=obs_valid, huber_k=huber_k,
        )
        _, dxi0 = prior_err(R, t)
        H = H.at[:6, :6].add(prior_info * jnp.eye(6))
        b = b.at[:6].add(prior_info * dxi0)
        # Marquardt damping (lam * diag(H)) plus an absolute floor: in f32,
        # a pose block can be near-singular when the dynamic outlier gate
        # rejects most landmarks at a poor seed — pure additive damping then
        # amplifies numerical residue into a huge garbage step that the
        # masked error function spuriously accepts (fewer surviving
        # landmarks => smaller error).
        damp = lam * (jnp.diag(H) + 1.0)
        delta = jnp.linalg.solve(H + jnp.diag(damp), -b)
        ok = jnp.isfinite(delta).all() & (jnp.linalg.norm(delta) < 1e3)
        Rn, tn = retract_all(R, t, jnp.where(ok, delta, 0.0))
        new_err = total_error(Rn, tn)
        accept = ok & (new_err < err)
        R = jnp.where(accept, Rn, R)
        t = jnp.where(accept, tn, t)
        improvement = err - new_err
        err = jnp.where(accept, new_err, err)
        lam = jnp.where(accept, jnp.maximum(lam * 0.1, 1e-10), lam * 10.0)
        done = (accept & (improvement < 1e-3 * jnp.maximum(err, 1.0))) | (lam > 1e8)
        return i + 1, R, t, lam, err, done

    err0 = total_error(R0, t0)
    _, R, t, _, _, _ = jax.lax.while_loop(
        cond, body, (0, R0, t0, jnp.float32(1e-5), err0, jnp.array(False))
    )
    return R, t
