"""Pose-only stereo Levenberg-Marquardt as a single jitted XLA program.

The on-device re-expression of FrameTracker (core/frame_tracker.py /
csrc ssl_pose_only_lm): N pose-only stereo factors with Huber over the
disparity-aware diagonal noise, solved by LM with a `lax.while_loop` —
static shapes (padded N with a validity mask), f32, fully traceable so it
can be fused into the per-frame front-end program ("tracking never leaves
the chip", the BASELINE north star). The numpy/C++ solvers remain the f64
oracles; parity is pinned in tests/test_pose_solver.py.

SE(3) here is represented as (R (3,3), t (3,)) with the same rotation-first
right retraction as geometry.se3 (a jnp mirror of the host math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .precision import highest_f32_matmuls

HUBER_K = 2.7955  # sqrt(7.815)


def _skew(w):
    z = jnp.zeros(())
    return jnp.array(
        [[z, -w[2], w[1]], [w[2], z, -w[0]], [-w[1], w[0], z]]
    )


def _so3_exp(w):
    th2 = w @ w
    W = _skew(w)
    W2 = W @ W
    th = jnp.sqrt(th2 + 1e-20)
    a = jnp.where(th2 < 1e-12, 1.0, jnp.sin(th) / th)
    b = jnp.where(th2 < 1e-12, 0.5, (1.0 - jnp.cos(th)) / th2)
    return jnp.eye(3) + a * W + b * W2


def _se3_exp(xi):
    w, v = xi[:3], xi[3:]
    th2 = w @ w
    W = _skew(w)
    W2 = W @ W
    th = jnp.sqrt(th2 + 1e-20)
    b = jnp.where(th2 < 1e-12, 0.5, (1.0 - jnp.cos(th)) / th2)
    c = jnp.where(th2 < 1e-12, 1.0 / 6.0, (th - jnp.sin(th)) / (th2 * th))
    V = jnp.eye(3) + b * W + c * W2
    return _so3_exp(w), V @ v


def _so3_log(R):
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    c = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    th = jnp.arccos(c)
    v = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    f = jnp.where(th < 1e-6, 0.5, th / (2.0 * jnp.sin(jnp.maximum(th, 1e-9))))
    return f * v  # not valid within ~1e-6 of pi (fine for residual use)


def _se3_log(R, t):
    w = _so3_log(R)
    th2 = w @ w
    W = _skew(w)
    W2 = W @ W
    th = jnp.sqrt(th2 + 1e-20)
    half = 0.5 * th
    cot_term = jnp.where(
        th2 < 1e-12, 1.0 / 12.0, (1.0 - half / jnp.tan(jnp.maximum(half, 1e-9))) / th2
    )
    Vi = jnp.eye(3) - 0.5 * W + cot_term * W2
    return jnp.concatenate([w, Vi @ t])


def _retract(R, t, xi):
    dR, dt = _se3_exp(xi)
    return R @ dR, R @ dt + t


def _residuals(R, t, Xw, meas, calib):
    """(N,3) residuals + (N,) cheirality mask. calib = (fx,fy,cx,cy,b)."""
    fx, fy, cx, cy, baseline = calib
    p = (Xw - t) @ R  # (N,3) camera frame
    z = p[:, 2]
    good = z > 1e-9
    iz = 1.0 / jnp.where(good, z, 1.0)
    r = jnp.stack(
        [
            fx * p[:, 0] * iz + cx - meas[:, 0],
            fx * (p[:, 0] - baseline) * iz + cx - meas[:, 1],
            fy * p[:, 1] * iz + cy - meas[:, 2],
        ],
        axis=1,
    )
    r = jnp.where(good[:, None], r, 2.0 * fx)  # cheirality escape hatch
    return r, p, iz, good


def _system(R, t, Xw, meas, inv_sig, valid, calib):
    """Huber-IRLS normal equations: (H (6,6), g (6,), robust error)."""
    fx, fy, _, _, baseline = calib
    r, p, iz, good = _residuals(R, t, Xw, meas, calib)
    iz2 = iz * iz
    zeros = jnp.zeros_like(iz)
    Jp = jnp.stack(
        [
            jnp.stack([fx * iz, zeros, -fx * p[:, 0] * iz2], 1),
            jnp.stack([fx * iz, zeros, -fx * (p[:, 0] - baseline) * iz2], 1),
            jnp.stack([zeros, fy * iz, -fy * p[:, 1] * iz2], 1),
        ],
        axis=1,
    )  # (N,3,3)
    ones = jnp.ones_like(zeros)
    Dcam = jnp.stack(
        [
            jnp.stack([zeros, -p[:, 2], p[:, 1], -ones, zeros, zeros], 1),
            jnp.stack([p[:, 2], zeros, -p[:, 0], zeros, -ones, zeros], 1),
            jnp.stack([-p[:, 1], p[:, 0], zeros, zeros, zeros, -ones], 1),
        ],
        axis=1,
    )  # (N,3,6)
    J = jnp.einsum("nij,njk->nik", Jp, Dcam)
    J = jnp.where(good[:, None, None], J, 0.0)

    rw = r * inv_sig
    Jw = J * inv_sig[:, :, None]
    norms = jnp.linalg.norm(rw, axis=1)
    w = jnp.where(norms <= HUBER_K, 1.0, HUBER_K / jnp.maximum(norms, 1e-12))
    w = w * valid
    H = jnp.einsum("n,nij,nik->jk", w, Jw, Jw)
    g = jnp.einsum("n,nij,ni->j", w, Jw, rw)
    err = jnp.sum(
        jnp.where(
            norms <= HUBER_K,
            0.5 * norms**2,
            HUBER_K * norms - 0.5 * HUBER_K**2,
        )
        * valid
    )
    return H, g, err


def _error(R, t, Xw, meas, inv_sig, valid, calib):
    r, _, _, _ = _residuals(R, t, Xw, meas, calib)
    norms = jnp.linalg.norm(r * inv_sig, axis=1)
    return jnp.sum(
        jnp.where(
            norms <= HUBER_K, 0.5 * norms**2, HUBER_K * norms - 0.5 * HUBER_K**2
        )
        * valid
    )


@highest_f32_matmuls
def pose_only_lm_impl(
    R0: jnp.ndarray,  # (3,3) initial rotation (Twc)
    t0: jnp.ndarray,  # (3,)
    Xw: jnp.ndarray,  # (N,3) world points, padded
    meas: jnp.ndarray,  # (N,3) (uL,uR,v)
    inv_sig: jnp.ndarray,  # (N,3) inverse diagonal sigmas
    valid: jnp.ndarray,  # (N,) 0/1 padding mask
    calib: tuple,  # (fx, fy, cx, cy, baseline) — static floats
    max_iters: int = 20,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (R, t). LM with multiplicative damping adaptation — each
    iteration solves once at the current lambda and accepts/rejects, so the
    loop is a fixed-shape `lax.while_loop`. Unjitted so it can be traced
    inline inside larger programs (the fused per-frame tracking step)."""
    valid = valid.astype(jnp.float32)

    def cond(state):
        i, R, t, lam, err, done = state
        return (i < max_iters) & jnp.logical_not(done)

    def body(state):
        i, R, t, lam, err, done = state
        H, g, _ = _system(R, t, Xw, meas, inv_sig, valid, calib)
        delta = jnp.linalg.solve(H + lam * jnp.eye(6), -g)
        ok = jnp.isfinite(delta).all()
        Rn, tn = _retract(R, t, jnp.where(ok, delta, 0.0))
        new_err = _error(Rn, tn, Xw, meas, inv_sig, valid, calib)
        accept = ok & (new_err < err)
        R = jnp.where(accept, Rn, R)
        t = jnp.where(accept, tn, t)
        improvement = err - new_err
        err = jnp.where(accept, new_err, err)
        lam = jnp.where(accept, jnp.maximum(lam * 0.1, 1e-10), lam * 10.0)
        done = (accept & (improvement < 1e-4 * jnp.maximum(err, 1.0))) | (
            lam > 1e8
        )
        return i + 1, R, t, lam, err, done

    err0 = _error(R0, t0, Xw, meas, inv_sig, valid, calib)
    _, R, t, _, _, _ = jax.lax.while_loop(
        cond, body, (0, R0, t0, jnp.float32(1e-5), err0, jnp.array(False))
    )
    return R, t


pose_only_lm = jax.jit(pose_only_lm_impl, static_argnames=("max_iters",))
