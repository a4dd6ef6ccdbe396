"""The fused per-frame device program: ONE dispatch, ONE packed readback.

The reference's hot path makes 3 engine enqueues and ~6 host<->device
copies per frame (SURVEY §3.1): SuperPoint {2,1,H,W}, LightGlue L<->R,
LightGlue KF<->L, with score maps and matches crossing the boundary
separately. On this TPU the dominant cost is not compute (~25 GFLOP/frame,
sub-ms on a v5e) but the FIXED ~6 ms latency of every device->host
synchronization over the host tunnel. So the whole per-frame pipeline is
fused into a single XLA program:

    uint8 stereo pair -> normalize -> SuperPoint (B=2) -> select top-K
    -> LightGlue L<->R  (stereo match + disparity/row gates, on device)
    -> LightGlue KF<->L (frame-to-keyframe track match)
    -> pack everything the host estimator needs into ONE (10, K) f32 buffer

and the host reads back exactly one well-shaped array per frame. The
keyframe's features stay on device between frames (they are just the
program's own outputs from the frame that became a keyframe) — the
reference's DescriptorPool/D2D machinery has no equivalent here because
nothing ever leaves HBM.

The host link is BANDWIDTH-bound (~1.5 MB/s effective on tunneled hosts),
so the packed buffer is int16: SuperPoint keypoints are integer heatmap
coordinates and the stereo gates run on device, so four int16 rows carry
everything the estimator needs — 4.8 KB/frame instead of 24 KB.

Packed row layout (int16, shape (PACK_ROWS, K)):
  0: kpt x (left) in 1/PACK_SCALE px fixed point, <0 for invalid rows
     (valid rows form a prefix)
  1: kpt y (left), same fixed point
  2: stereo disparity (uL - uR), same fixed point, <0 when the stereo
     gates failed
  3: track match index into the KF set (-1 = none; plain integer)

Fixed point because keypoints are sub-pixel refined (SUPERSLAM_SP_SUBPIXEL,
models/superpoint.select_keypoints): 1/16 px quantization over int16 covers
images up to 2047 px wide while keeping the readback at 4 rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .precision import highest_f32_matmuls

from ..models.lightglue import extract_matches, lightglue_forward
from ..models.superpoint import select_keypoints, superpoint_dense
from ..utils.env import env_flag

PACK_ROWS = 4
PACK_SCALE = 16.0  # 1/16 px fixed point in the int16 readback


def _superpoint_stereo_features(
    sp_params,
    images_u8: jnp.ndarray,  # (2S, H, W) uint8 [L0, R0, L1, R1, ...], padded
    max_keypoints: int,
    keypoint_threshold: float,
    remove_borders: int,
    nms_radius: int,
    true_width: int,
    true_height: int,
):
    """SuperPoint over the interleaved L/R batch + top-K selection + L/R
    split + LightGlue-frame normalization — the shared front half of every
    fused stereo program. Returns (kl, kr, dl, dr, vl, vr, nkl, nkr)."""
    images = images_u8.astype(jnp.float32) / 255.0
    # Sub-pixel peaks (env-gated, default on): disparity noise converts to
    # depth noise as Z^2/(fx*b) per px, so the refinement directly tightens
    # the stereo factors downstream.
    subpixel = env_flag("SUPERSLAM_SP_SUBPIXEL", True)
    out = superpoint_dense(
        sp_params, images, nms_radius=nms_radius, return_pre_nms=subpixel
    )
    scores, grid = out[0], out[1]
    kpts, kp_scores, valid, desc = select_keypoints(
        scores,
        grid,
        max_keypoints,
        keypoint_threshold,
        remove_borders,
        true_width,
        true_height,
        raw_scores=out[2] if subpixel else None,
    )
    kl, kr = kpts[0::2], kpts[1::2]  # (S, K, 2)
    dl, dr = desc[0::2], desc[1::2]
    vl, vr = valid[0::2], valid[1::2]

    scale = max(true_width, true_height) / 2.0
    center = jnp.array([true_width / 2.0, true_height / 2.0], jnp.float32)
    nkl = (kl - center) / scale
    nkr = (kr - center) / scale
    return kl, kr, dl, dr, vl, vr, nkl, nkr


def _stereo_gates(kl, kr, vl, stereo_m, min_disparity: float):
    """Stereo gates on device (StereoFrontEnd.cc:35-46): disparity floor
    and rectified-row check. Returns (disparity (S,K), stereo_ok (S,K))."""
    j = jnp.maximum(stereo_m, 0)
    uR = jnp.take_along_axis(kr[..., 0], j, axis=1)
    vR = jnp.take_along_axis(kr[..., 1], j, axis=1)
    disparity = kl[..., 0] - uR
    row_ok = jnp.abs(kl[..., 1] - vR) <= 2.0
    stereo_ok = (stereo_m >= 0) & (disparity >= min_disparity) & row_ok & vl
    return disparity, stereo_ok


def _frontend_core(
    sp_params,
    lg_params,
    images_u8: jnp.ndarray,  # (2S, H, W) uint8 [L0, R0, L1, R1, ...], padded
    kf_kpts: jnp.ndarray,  # (K, 2) f32 pixel coords of the last keyframe
    kf_desc: jnp.ndarray,  # (K, D)
    kf_valid: jnp.ndarray,  # (K,) bool
    max_keypoints: int,
    keypoint_threshold: float,
    remove_borders: int,
    nms_radius: int,
    true_width: int,
    true_height: int,
    min_disparity: float,
    match_threshold: float,
    kf_prenormalized: bool = False,
):
    """Shared trace: extraction + stereo/track matching + stereo gates.

    Returns (kl (S,K,2), nkl (S,K,2), dl (S,K,D), vl (S,K), disparity (S,K),
    stereo_ok (S,K), track_m (S,K)) — everything both the packing step and
    the on-device pose solve consume.

    kf_prenormalized=True means kf_kpts is already in the LightGlue
    normalized frame (the device keyframe carry stores normalized coords —
    pixel coords never ride the carry).
    """
    S = images_u8.shape[0] // 2
    kl, kr, dl, dr, vl, vr, nkl, nkr = _superpoint_stereo_features(
        sp_params,
        images_u8,
        max_keypoints,
        keypoint_threshold,
        remove_borders,
        nms_radius,
        true_width,
        true_height,
    )
    scale = max(true_width, true_height) / 2.0
    center = jnp.array([true_width / 2.0, true_height / 2.0], jnp.float32)
    nkf = kf_kpts if kf_prenormalized else (kf_kpts - center) / scale

    # 2S pair problems in one LightGlue forward: S stereo matches (L_s, R_s)
    # and S track matches (KF, L_s). The transformer weights are read once.
    # kf_* may be shared (K, ...) — single sequence, batched frames — or
    # per-sequence (S, K, ...) — multi-sequence batched tracking.
    if kf_kpts.ndim == 2:
        kf_k = jnp.broadcast_to(nkf[None], (S,) + nkf.shape)
        kf_d = jnp.broadcast_to(kf_desc[None].astype(dl.dtype), dl.shape)
        kf_v = jnp.broadcast_to(kf_valid[None], vl.shape)
    else:
        kf_k = nkf
        kf_d = kf_desc.astype(dl.dtype)
        kf_v = kf_valid
    q_kpts = jnp.concatenate([nkl, kf_k], axis=0)
    q_desc = jnp.concatenate([dl, kf_d], axis=0)
    q_valid = jnp.concatenate([vl, kf_v], axis=0)
    t_kpts = jnp.concatenate([nkr, nkl], axis=0)
    t_desc = jnp.concatenate([dr, dl], axis=0)
    t_valid = jnp.concatenate([vr, vl], axis=0)
    la = lightglue_forward(lg_params, q_kpts, q_desc, t_kpts, t_desc, q_valid, t_valid)
    matches, _mscores = extract_matches(la, q_valid, t_valid, match_threshold)
    stereo_m = matches[:S]  # (S, K)
    track_m = matches[S:]  # match confidence is not consumed downstream

    disparity, stereo_ok = _stereo_gates(kl, kr, vl, stereo_m, min_disparity)
    return kl, nkl, dl, vl, disparity, stereo_ok, track_m


def _pack(kl, vl, disparity, stereo_ok, track_m):
    S, K = kl.shape[0], kl.shape[1]
    packed = jnp.stack(
        [
            jnp.where(vl, kl[..., 0] * PACK_SCALE, -1.0),
            kl[..., 1] * PACK_SCALE,
            jnp.where(stereo_ok, disparity * PACK_SCALE, -1.0),
            track_m.astype(jnp.float32),
        ],
        axis=1,
    )
    packed = jnp.round(packed).astype(jnp.int16)
    # Emit rank-2 (S*PACK_ROWS, K): rank-3 D2H is pathological on tunneled
    # hosts and an out-of-program reshape would cost an extra host-link op.
    return packed.reshape(S * PACK_ROWS, K)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_keypoints",
        "keypoint_threshold",
        "remove_borders",
        "nms_radius",
        "true_width",
        "true_height",
        "min_disparity",
        "match_threshold",
    ),
)
@highest_f32_matmuls
def fused_stereo_step_multi(
    sp_params,
    lg_params,
    images_u8: jnp.ndarray,  # (2S, H, W) uint8 [L0, R0, L1, R1, ...], padded
    kf_kpts: jnp.ndarray,  # (K, 2) f32 pixel coords of the last keyframe
    kf_desc: jnp.ndarray,  # (K, D)
    kf_valid: jnp.ndarray,  # (K,) bool
    max_keypoints: int,
    keypoint_threshold: float,
    remove_borders: int,
    nms_radius: int,
    true_width: int,
    true_height: int,
    min_disparity: float,
    match_threshold: float,
):
    """Process S consecutive stereo frames in ONE program.

    Returns (packed (S*PACK_ROWS, K) int16, desc (S, K, D), kpts (S, K, 2),
    valid (S, K)): the packed block is the single host readback for all S
    frames (frame s owns rows [s*PACK_ROWS, (s+1)*PACK_ROWS)); the per-frame
    left features stay on device and become the next keyframe's inputs when
    the gate fires. Batching frames amortizes the fixed host-link round trip
    — every frame's track-match refers to the same keyframe state (the
    estimator resolves lagged references).
    """
    kl, _nkl, dl, vl, disparity, stereo_ok, track_m = _frontend_core(
        sp_params,
        lg_params,
        images_u8,
        kf_kpts,
        kf_desc,
        kf_valid,
        max_keypoints,
        keypoint_threshold,
        remove_borders,
        nms_radius,
        true_width,
        true_height,
        min_disparity,
        match_threshold,
    )
    return _pack(kl, vl, disparity, stereo_ok, track_m), dl, kl, vl


TRACK_COLS = 13  # R row-major (9) + t (3) + n_matches (1)


def _reorthonormalize(R):
    """Project a near-rotation back onto SO(3) (Gram-Schmidt). The tracking
    carry multiplies thousands of f32 exponentials across a run; without
    this the prior drifts off the manifold linearly in frame count."""
    c0 = R[:, 0]
    c0 = c0 / jnp.sqrt(c0 @ c0 + 1e-20)
    c1 = R[:, 1] - (c0 @ R[:, 1]) * c0
    c1 = c1 / jnp.sqrt(c1 @ c1 + 1e-20)
    c2 = jnp.cross(c0, c1)
    return jnp.stack([c0, c1, c2], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_keypoints",
        "keypoint_threshold",
        "remove_borders",
        "nms_radius",
        "true_width",
        "true_height",
        "min_disparity",
        "match_threshold",
        "calib",
        "min_matches",
        "track_sigma_px",
        "disp_sigma0",
        "disp_cond",
        "track_iters",
    ),
)
@highest_f32_matmuls
def fused_stereo_track_step_multi(
    sp_params,
    lg_params,
    images_u8: jnp.ndarray,  # (2S, H, W) uint8 [L0, R0, ...], padded
    kf_kpts: jnp.ndarray,  # (K, 2) f32 pixel coords of the last keyframe
    kf_desc: jnp.ndarray,  # (K, D)
    kf_valid: jnp.ndarray,  # (K,) bool
    kf_xw: jnp.ndarray,  # (K, 3) f32 WORLD points of the KF's stereo features
    kf_depth_ok: jnp.ndarray,  # (K,) bool — KF feature has stereo depth
    carry_R: jnp.ndarray,  # (3,3) previous frame pose Twc (device-resident)
    carry_t: jnp.ndarray,  # (3,)
    rel_R: jnp.ndarray,  # (3,3) constant-velocity model (prev.between(cur))
    rel_t: jnp.ndarray,  # (3,)
    max_keypoints: int,
    keypoint_threshold: float,
    remove_borders: int,
    nms_radius: int,
    true_width: int,
    true_height: int,
    min_disparity: float,
    match_threshold: float,
    calib: tuple,  # (fx, fy, cx, cy, baseline) static floats
    min_matches: int,
    track_sigma_px: float,
    disp_sigma0: float,
    disp_cond: float,
    track_iters: int = 20,
):
    """The fully-fused per-frame program: extraction + matching + POSE.

    Everything fused_stereo_step_multi does, plus a `lax.scan` over the S
    frames running the pose-only LM (ops.pose_solver) on the KF->frame track
    matches — the on-device re-expression of the reference hot loop
    SuperPoint -> LightGlue -> FrameTracker::track (``src/VoEstimator.cc:
    238-258``), so on a locally-attached chip tracking never leaves the
    chip. Correspondences: track_m[i] = frame keypoint matched to KF feature
    i; Xw = kf_xw[i] (backprojected through the KF's smoothed pose at upload
    time, so each solve re-grounds the chain and pose error does not
    accumulate); meas = the frame keypoint's (uL, uR, v) from the on-device
    stereo gate; noise = the disparity-aware diagonal of
    core.factors.stereo_diag_sigmas. Frames with fewer than `min_matches`
    usable correspondences coast on the constant-velocity carry exactly like
    the host estimator.

    Returns (packed, dl, kl, vl, track_out (S, TRACK_COLS) f32,
    (carry_R, carry_t, rel_R, rel_t)) — the carry stays on device and feeds
    the next dispatch; only `packed` and `track_out` are fetched.
    """
    assert kf_kpts.ndim == 2, (
        "device tracking is single-sequence: the pose chain carry and the "
        "(K, 3) keyframe world points have no per-sequence axis (use "
        "fused_stereo_step_multi + host solves for multi-sequence batches)"
    )
    kl, _nkl, dl, vl, disparity, stereo_ok, track_m = _frontend_core(
        sp_params,
        lg_params,
        images_u8,
        kf_kpts,
        kf_desc,
        kf_valid,
        max_keypoints,
        keypoint_threshold,
        remove_borders,
        nms_radius,
        true_width,
        true_height,
        min_disparity,
        match_threshold,
    )
    track_out, carry = track_scan(
        kl,
        disparity,
        stereo_ok,
        track_m,
        kf_xw,
        kf_depth_ok,
        (carry_R, carry_t, rel_R, rel_t),
        calib=calib,
        min_matches=min_matches,
        track_sigma_px=track_sigma_px,
        disp_sigma0=disp_sigma0,
        disp_cond=disp_cond,
        track_iters=track_iters,
    )
    packed = _pack(kl, vl, disparity, stereo_ok, track_m)
    return packed, dl, kl, vl, track_out, carry


@highest_f32_matmuls
def _frame_solve(
    R_prev,
    t_prev,
    R_pred,
    t_pred,
    kl_s,  # (K, 2) this frame's left keypoints (pixels)
    disp_s,  # (K,)
    ok_s,  # (K,) bool stereo-gate pass
    tm_s,  # (K,) int32: frame keypoint matched to KF feature i, or -1
    kf_xw,  # (K, 3) world points of the KF features
    kf_depth_ok,  # (K,) bool
    *,
    calib,
    min_matches,
    inv_sig_uLv,
    disp_sigma0,
    disp_cond,
    mono,
    gate_px,
    chi2_px,
    chi2_rounds,
    track_iters,
):
    """One frame's prior-gated pose solve — the scan-body core shared by
    track_scan and track_kf_scan (the math must never diverge; the solve
    semantics are documented on track_scan). Returns
    (R_s, t_s, n, ok, resid): the solved pose, the usable-match count, the
    usable-match mask, and the reprojection-residual closure
    ``resid(R, t) -> (px_dist (K,), z_ok (K,))`` for support counting."""
    from .pose_solver import pose_only_lm_impl

    fx, fy, cx, cy, _ = calib
    fi = jnp.maximum(tm_s, 0)
    uL = jnp.take(kl_s[:, 0], fi)
    v = jnp.take(kl_s[:, 1], fi)
    d = jnp.take(disp_s, fi)
    ok = (tm_s >= 0) & jnp.take(ok_s, fi) & kf_depth_ok
    meas = jnp.stack([uL, uL - d, v], axis=1)
    dc = jnp.maximum(d, 1e-3)
    ratio = disp_cond / dc
    if mono:
        inv_sig_uR = jnp.zeros_like(dc)
    else:
        inv_sig_uR = 1.0 / (disp_sigma0 * jnp.sqrt(1.0 + ratio * ratio))
    inv_sig = jnp.stack(
        [jnp.full_like(dc, inv_sig_uLv), inv_sig_uR, jnp.full_like(dc, inv_sig_uLv)],
        axis=1,
    )
    n = jnp.sum(ok)

    def resid(R, t):
        p = (kf_xw - t) @ R  # rows are R^T (X - t), camera frame
        z = p[:, 2]
        zok = z > 0.1
        zs = jnp.where(zok, z, 1.0)
        uL_hat = fx * p[:, 0] / zs + cx
        v_hat = fy * p[:, 1] / zs + cy
        return jnp.hypot(uL_hat - uL, v_hat - v), zok

    keep = ok
    if gate_px > 0:
        r0, zok0 = resid(R_pred, t_pred)
        k0 = ok & zok0 & (r0 < gate_px)
        keep = jnp.where(jnp.sum(k0) >= min_matches, k0, ok)
    R_s, t_s = pose_only_lm_impl(
        R_prev,
        t_prev,
        kf_xw,
        meas,
        inv_sig,
        keep.astype(jnp.float32),
        calib,
        track_iters,
    )
    stopped = jnp.array(False)
    for _ in range(chi2_rounds):
        r, zok = resid(R_s, t_s)
        k2 = ok & zok & (r < chi2_px)
        round_ok = (jnp.sum(k2) >= min_matches) & jnp.logical_not(stopped)
        keep = jnp.where(round_ok, k2, keep)
        R_n, t_n = pose_only_lm_impl(
            R_s,
            t_s,
            kf_xw,
            meas,
            inv_sig,
            keep.astype(jnp.float32),
            calib,
            track_iters,
        )
        R_s = jnp.where(round_ok, R_n, R_s)
        t_s = jnp.where(round_ok, t_n, t_s)
        stopped = stopped | jnp.logical_not(round_ok)
    return R_s, t_s, n, ok, resid


@highest_f32_matmuls
def track_scan(
    kl,  # (S, K, 2) left keypoints (pixels)
    disparity,  # (S, K)
    stereo_ok,  # (S, K) bool
    track_m,  # (S, K) int32: frame keypoint matched to KF feature i, or -1
    kf_xw,  # (K, 3) world points of the KF features
    kf_depth_ok,  # (K,) bool
    carry,  # (R (3,3), t (3,), rel_R (3,3), rel_t (3,))
    *,
    calib: tuple,
    min_matches: int,
    track_sigma_px: float,
    disp_sigma0: float,
    disp_cond: float,
    track_iters: int = 20,
    mono: bool = False,
    gate_px: float | None = None,
    chi2_px: float | None = None,
    chi2_rounds: int | None = None,
):
    """The on-device tracking chain: a lax.scan over S frames running the
    pose-only LM per frame with coast-on-loss, exactly the host estimator's
    solve semantics (core.vo_estimator._track / core.frame_tracker).
    Separated from the fused step so tests can drive it with synthetic
    geometry. Returns (track_out (S, TRACK_COLS) f32, new carry).

    The solve is PRIOR-GATED, mirroring FrameTracker.track_gated steps 1-4
    (the host recipe's widen-gate retry and low-support rescue are
    host-side recovery paths: the device chain's carry re-anchors on every
    accepted solve and cannot latch the way the host estimator's
    prediction-distance coast guard could, so degenerate-frame recovery
    lives with the estimator — see VoEstimator's support-based acceptance):
    matches are rejected against the constant-velocity predicted pose
    (reprojection distance > gate_px) before the LM — which still inits at
    the PREVIOUS pose; init-at-prediction feeds the solver's residual error
    back through the velocity carry and diverges on weakly-observable
    geometry (track_gated docstring) — then `chi2_rounds` re-solves on
    shrinking chi2 inlier sets. Huber alone diverges under the structured
    outliers LightGlue produces at keyframe gaps.
    gate_px/chi2_px/chi2_rounds default from SUPERSLAM_TRACK_GATE{,_PX} /
    SUPERSLAM_TRACK_CHI2_{PX,ROUNDS} at trace time; gate_px=0 disables the
    pre-gate, chi2_rounds=0 the re-rounds. min_matches doubles as the
    minimum kept-set size.

    mono=True zeroes the uR residual weight: the RGB-D device program has
    no frame-side depth (the sensor depth image never visits the device,
    mirroring the reference's RgbdFrontEnd split), so its solve uses (uL, v)
    reprojection only — the KF world points carry the metric scale. Pass
    disparity=0 and stereo_ok=valid in that mode."""
    from ..utils.env import env_float, env_int

    gate_on = env_flag("SUPERSLAM_TRACK_GATE", True)
    if gate_px is None:
        gate_px = env_float("SUPERSLAM_TRACK_GATE_PX", 10.0) if gate_on else 0.0
    if chi2_px is None:
        chi2_px = env_float("SUPERSLAM_TRACK_CHI2_PX", 2.0)
    if chi2_rounds is None:
        chi2_rounds = env_int("SUPERSLAM_TRACK_CHI2_ROUNDS", 2) if gate_on else 0

    inv_sig_uLv = jnp.float32(1.0 / track_sigma_px)

    def step(c, per_frame):
        R_prev, t_prev, Rr, tr = c
        kl_s, disp_s, ok_s, tm_s = per_frame

        # Constant-velocity prediction: the GATING pose (the LM inits at
        # the previous pose — see docstring).
        R_pred = R_prev @ Rr
        t_pred = R_prev @ tr + t_prev

        R_s, t_s, n, _ok, _resid = _frame_solve(
            R_prev,
            t_prev,
            R_pred,
            t_pred,
            kl_s,
            disp_s,
            ok_s,
            tm_s,
            kf_xw,
            kf_depth_ok,
            calib=calib,
            min_matches=min_matches,
            inv_sig_uLv=inv_sig_uLv,
            disp_sigma0=disp_sigma0,
            disp_cond=disp_cond,
            mono=mono,
            gate_px=gate_px,
            chi2_px=chi2_px,
            chi2_rounds=chi2_rounds,
            track_iters=track_iters,
        )
        use = n >= min_matches
        R_coast = R_prev @ Rr
        t_coast = R_prev @ tr + t_prev
        R_new = _reorthonormalize(jnp.where(use, R_s, R_coast))
        t_new = jnp.where(use, t_s, t_coast)
        Rr_new = jnp.where(use, R_prev.T @ R_new, Rr)
        tr_new = jnp.where(use, R_prev.T @ (t_new - t_prev), tr)
        row = jnp.concatenate(
            [R_new.reshape(9), t_new, n.astype(jnp.float32)[None]]
        )
        return (R_new, t_new, Rr_new, tr_new), row

    new_carry, track_out = jax.lax.scan(
        step, carry, (kl, disparity, stereo_ok, track_m)
    )
    return track_out, new_carry


def _extract_stereo(
    sp_params,
    lg_params,
    images_u8: jnp.ndarray,  # (2S, H, W) uint8 [L0, R0, ...], padded
    max_keypoints: int,
    keypoint_threshold: float,
    remove_borders: int,
    nms_radius: int,
    true_width: int,
    true_height: int,
    min_disparity: float,
    match_threshold: float,
):
    """Extraction + stereo matching WITHOUT the keyframe track match: the
    front half of _frontend_core (shared via _superpoint_stereo_features /
    _stereo_gates) for programs that match against a keyframe carried
    inside their own scan (track_kf_scan). Returns
    (kl (S,K,2) px, nkl (S,K,2) normalized, dl (S,K,D), vl (S,K),
    disparity (S,K), stereo_ok (S,K))."""
    kl, kr, dl, dr, vl, vr, nkl, nkr = _superpoint_stereo_features(
        sp_params,
        images_u8,
        max_keypoints,
        keypoint_threshold,
        remove_borders,
        nms_radius,
        true_width,
        true_height,
    )
    la = lightglue_forward(lg_params, nkl, dl, nkr, dr, vl, vr)
    stereo_m, _ = extract_matches(la, vl, vr, match_threshold)
    disparity, stereo_ok = _stereo_gates(kl, kr, vl, stereo_m, min_disparity)
    return kl, nkl, dl, vl, disparity, stereo_ok


TRACK_KF_COLS = 16  # R row-major (9) + t (3) + n + support + accept + promo


@highest_f32_matmuls
def track_kf_scan(
    lg_params,
    kl,  # (S, K, 2) left keypoints (pixels)
    nkl,  # (S, K, 2) normalized left keypoints (LightGlue frame)
    dl,  # (S, K, D) left descriptors
    vl,  # (S, K) bool
    disparity,  # (S, K)
    stereo_ok,  # (S, K) bool
    kf_state,  # (kf_nk (K,2), kf_desc (K,D), kf_valid (K,), kf_xw (K,3),
    #             kf_depth_ok (K,), since (int32 scalar))
    pose_carry,  # (R (3,3), t (3,), rel_R (3,3), rel_t (3,))
    *,
    calib: tuple,
    min_matches: int,
    track_sigma_px: float,
    disp_sigma0: float,
    disp_cond: float,
    match_threshold: float,
    accept_frac: float,
    support_px: float,
    kf_min_frames: int,
    kf_max_frames: int,
    kf_min_matches: int,
    covis_ratio: float,
    track_iters: int = 20,
    gate_px: float | None = None,
    chi2_px: float | None = None,
    chi2_rounds: int | None = None,
    track_m0=None,  # (S, K) int32 batched matches vs the ENTRY keyframe
):
    """Zero-lag on-device tracking: the KEYFRAME LIVES IN THE SCAN CARRY.

    track_scan matches every frame of a dispatch against the keyframe state
    frozen at dispatch time, so pipelined frames track against a keyframe up
    to depth*batch insertions old — the rendered-circuit A/B measured that
    lag at 3x the ATE of the synchronous path (0.296 m vs 0.103 m), with a
    host re-match against the newest keyframe recovering sync exactly. This
    scan removes the lag at the source instead of paying a host round trip:
    each frame runs its own LightGlue forward against the CARRIED keyframe,
    solves, and — when the keyframe gate fires — promotes itself to be the
    keyframe for the very next frame, all inside one XLA program. The host
    follows the readback's promo bit (VoEstimator track(device_promote=...))
    so host map bookkeeping stays in lockstep, and the per-insertion
    keyframe H2D upload disappears entirely (the keyframe never leaves the
    chip).

    Gate semantics mirror core.keyframe_gate.should_insert_keyframe
    (reference ``include/KeyframeGate.h:11-24``) with reference_features =
    the carried keyframe's depth-valid count, and solve acceptance mirrors
    VoEstimator's support-based rule (support/accept also ride the readback
    row so the host adopts the same decision instead of recomputing it in
    f64 and desyncing at the boundary). Promotion grounds the new keyframe's
    world points through the ACCEPTED device solve — the instantaneous LM
    pose, not the host's window-smoothed pose (the one intentional
    divergence from the host insertion path; the smoother still corrects
    the host-side trajectory).

    Stereo-only: RGB-D promotion would need frame-side depth, which never
    visits the device (ops.rgbd_step docstring).

    SPECULATIVE HYBRID (track_m0 is not None): the caller already matched
    every frame against the scan's ENTRY keyframe in one batched LightGlue
    forward (2S pairs, amortized with the stereo match — _frontend_core).
    Those speculative matches are exact until the first in-scan promotion;
    only frames AFTER a promotion within this dispatch re-run the
    serialized pair-batch-1 forward, under a ``lax.cond`` so the compiled
    program skips it at runtime on non-promotion frames. At keyframe
    cadences of ~10 frames and dispatch batch S<=4 that removes ~80-100%
    of the in-scan forwards the original zero-lag design paid on EVERY
    frame (round-3 measured cost: ~1.3 ms/frame of device budget), while
    matching stays zero-lag: a frame matches a stale keyframe only if the
    promotion happened in a frame this same dispatch already processed,
    and exactly those frames take the re-match branch.

    Returns (track_out (S, TRACK_KF_COLS) f32, track_m (S, K) int32,
    new_kf_state, new_pose_carry).
    """
    from ..utils.env import env_float, env_int

    gate_on = env_flag("SUPERSLAM_TRACK_GATE", True)
    if gate_px is None:
        gate_px = env_float("SUPERSLAM_TRACK_GATE_PX", 10.0) if gate_on else 0.0
    if chi2_px is None:
        chi2_px = env_float("SUPERSLAM_TRACK_CHI2_PX", 2.0)
    if chi2_rounds is None:
        chi2_rounds = env_int("SUPERSLAM_TRACK_CHI2_ROUNDS", 2) if gate_on else 0

    inv_sig_uLv = jnp.float32(1.0 / track_sigma_px)
    fx, fy, cx, cy, baseline = calib

    hybrid = track_m0 is not None

    def step(c, per_frame):
        if hybrid:
            (R_prev, t_prev, Rr, tr, kf_nk, kf_d, kf_v, kf_xw, kf_dok,
             since, fresh) = c
            kl_s, nkl_s, dl_s, vl_s, disp_s, sok_s, tm0_s = per_frame
        else:
            R_prev, t_prev, Rr, tr, kf_nk, kf_d, kf_v, kf_xw, kf_dok, since = c
            kl_s, nkl_s, dl_s, vl_s, disp_s, sok_s = per_frame

        def _rematch():
            la = lightglue_forward(
                lg_params,
                kf_nk[None],
                kf_d[None],
                nkl_s[None],
                dl_s[None],
                kf_v[None],
                vl_s[None],
            )
            tm, _ = extract_matches(
                la, kf_v[None], vl_s[None], match_threshold
            )
            return tm[0]

        if hybrid and kl.shape[0] == 1:
            # S=1: the cond is dead code — a promotion can only go stale
            # for LATER frames of the same dispatch, and there are none;
            # the next dispatch's batched forward sees the promoted carry.
            # Dropping it removes the second (pair-batch-1) LightGlue
            # program from the executable entirely.
            tm_s = tm0_s
        elif hybrid:
            # The batched speculative match is valid while the carried
            # keyframe is still the one the dispatch-time forward saw.
            tm_s = jax.lax.cond(fresh, lambda: tm0_s, _rematch)
        else:
            tm_s = _rematch()

        R_pred = R_prev @ Rr
        t_pred = R_prev @ tr + t_prev
        R_s, t_s, n, ok, resid = _frame_solve(
            R_prev,
            t_prev,
            R_pred,
            t_pred,
            kl_s,
            disp_s,
            sok_s,
            tm_s,
            kf_xw,
            kf_dok,
            calib=calib,
            min_matches=min_matches,
            inv_sig_uLv=inv_sig_uLv,
            disp_sigma0=disp_sigma0,
            disp_cond=disp_cond,
            mono=False,
            gate_px=gate_px,
            chi2_px=chi2_px,
            chi2_rounds=chi2_rounds,
            track_iters=track_iters,
        )

        # Support-based acceptance — VoEstimator._attempt's rule, in-program.
        r, zok = resid(R_s, t_s)
        support = jnp.sum(ok & zok & (r < support_px))
        finite = jnp.all(jnp.isfinite(t_s)) & jnp.all(jnp.isfinite(R_s))
        accept = (n >= min_matches) & finite
        if accept_frac > 0:
            accept = accept & (
                support.astype(jnp.float32)
                >= jnp.maximum(
                    jnp.float32(min_matches), accept_frac * n.astype(jnp.float32)
                )
            )

        R_new = _reorthonormalize(jnp.where(accept, R_s, R_pred))
        t_new = jnp.where(accept, t_s, t_pred)
        Rr_new = jnp.where(accept, R_prev.T @ R_new, Rr)
        tr_new = jnp.where(accept, R_prev.T @ (t_new - t_prev), tr)

        # Keyframe gate (should_insert_keyframe, exact semantics).
        since1 = since + 1
        nref = jnp.sum(kf_dok)
        ratio_low = n.astype(jnp.float32) < covis_ratio * jnp.maximum(
            nref, 1
        ).astype(jnp.float32)
        gate = (since1 >= kf_min_frames) & (
            (since1 >= kf_max_frames) | (n < kf_min_matches) | ratio_low
        )
        promo = accept & gate

        # Promotion: this frame's features become the keyframe; world points
        # ground through the accepted solve (Xw = R Xc + t).
        d_safe = jnp.maximum(disp_s, 1e-3)
        z = (fx * baseline) / d_safe
        x = (kl_s[:, 0] - cx) * z / fx
        y = (kl_s[:, 1] - cy) * z / fy
        xw_new = jnp.stack([x, y, z], axis=1) @ R_new.T + t_new
        kf_nk2 = jnp.where(promo, nkl_s, kf_nk)
        kf_d2 = jnp.where(promo, dl_s, kf_d)
        kf_v2 = jnp.where(promo, vl_s, kf_v)
        kf_xw2 = jnp.where(promo, xw_new, kf_xw)
        kf_dok2 = jnp.where(promo, sok_s, kf_dok)
        since2 = jnp.where(promo, 0, since1)

        row = jnp.concatenate(
            [
                R_new.reshape(9),
                t_new,
                n.astype(jnp.float32)[None],
                support.astype(jnp.float32)[None],
                accept.astype(jnp.float32)[None],
                promo.astype(jnp.float32)[None],
            ]
        )
        new_c = (
            R_new,
            t_new,
            Rr_new,
            tr_new,
            kf_nk2,
            kf_d2,
            kf_v2,
            kf_xw2,
            kf_dok2,
            since2,
        )
        if hybrid:
            new_c = new_c + (fresh & jnp.logical_not(promo),)
        return new_c, (row, tm_s)

    xs = (kl, nkl, dl, vl, disparity, stereo_ok)
    carry0 = pose_carry + kf_state
    if hybrid:
        xs = xs + (track_m0,)
        carry0 = carry0 + (jnp.array(True),)
    new_carry, (track_out, track_m) = jax.lax.scan(step, carry0, xs)
    return track_out, track_m, new_carry[4:10], new_carry[:4]


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_keypoints",
        "keypoint_threshold",
        "remove_borders",
        "nms_radius",
        "true_width",
        "true_height",
        "min_disparity",
        "match_threshold",
        "calib",
        "min_matches",
        "track_sigma_px",
        "disp_sigma0",
        "disp_cond",
        "accept_frac",
        "support_px",
        "kf_min_frames",
        "kf_max_frames",
        "kf_min_matches",
        "covis_ratio",
        "track_iters",
        "hybrid",
    ),
)
@highest_f32_matmuls
def fused_stereo_track_kf_step_multi(
    sp_params,
    lg_params,
    images_u8: jnp.ndarray,  # (2S, H, W) uint8 [L0, R0, ...], padded
    kf_state: tuple,  # see track_kf_scan
    pose_carry: tuple,  # (R, t, rel_R, rel_t)
    max_keypoints: int,
    keypoint_threshold: float,
    remove_borders: int,
    nms_radius: int,
    true_width: int,
    true_height: int,
    min_disparity: float,
    match_threshold: float,
    calib: tuple,
    min_matches: int,
    track_sigma_px: float,
    disp_sigma0: float,
    disp_cond: float,
    accept_frac: float,
    support_px: float,
    kf_min_frames: int,
    kf_max_frames: int,
    kf_min_matches: int,
    covis_ratio: float,
    track_iters: int = 20,
    hybrid: bool | None = None,
):
    """fused_stereo_track_step_multi with ZERO-LAG keyframe promotion: the
    keyframe state rides the scan carry (track_kf_scan docstring).

    hybrid=True (the default, SUPERSLAM_DEVICE_KF_HYBRID): the KF<->frame
    match runs BATCHED with the stereo match in one 2S-pair LightGlue
    forward against the scan's entry keyframe (the device carry feeds
    _frontend_core directly — no host involvement), and the serialized
    in-scan forward survives only behind a ``lax.cond`` for frames that
    follow an intra-dispatch promotion. At S=1 the in-scan forward never
    executes at all — promotion updates the carry and the NEXT dispatch's
    batched forward sees the new keyframe, which is already zero-lag.
    Round 3 paid that serialized forward on every frame (~1.3 ms/frame,
    device-only 2.6 -> 3.9 ms); the hybrid wins it back.

    hybrid=False: the round-3 behavior (every frame re-matches in-scan).

    Extra readback stays 3 f32 per frame; the per-insertion keyframe
    feature/world uploads stay gone.

    Returns (packed, dl, kl, vl, track_out (S, TRACK_KF_COLS),
    new_kf_state, new_pose_carry)."""
    if hybrid is None:
        hybrid = env_flag("SUPERSLAM_DEVICE_KF_HYBRID", True)
    if hybrid:
        kl, nkl, dl, vl, disparity, stereo_ok, track_m0 = _frontend_core(
            sp_params,
            lg_params,
            images_u8,
            kf_state[0],
            kf_state[1],
            kf_state[2],
            max_keypoints,
            keypoint_threshold,
            remove_borders,
            nms_radius,
            true_width,
            true_height,
            min_disparity,
            match_threshold,
            kf_prenormalized=True,
        )
    else:
        kl, nkl, dl, vl, disparity, stereo_ok = _extract_stereo(
            sp_params,
            lg_params,
            images_u8,
            max_keypoints,
            keypoint_threshold,
            remove_borders,
            nms_radius,
            true_width,
            true_height,
            min_disparity,
            match_threshold,
        )
        track_m0 = None
    track_out, track_m, kf_state2, pose_carry2 = track_kf_scan(
        lg_params,
        kl,
        nkl,
        dl,
        vl,
        disparity,
        stereo_ok,
        kf_state,
        pose_carry,
        track_m0=track_m0,
        calib=calib,
        min_matches=min_matches,
        track_sigma_px=track_sigma_px,
        disp_sigma0=disp_sigma0,
        disp_cond=disp_cond,
        match_threshold=match_threshold,
        accept_frac=accept_frac,
        support_px=support_px,
        kf_min_frames=kf_min_frames,
        kf_max_frames=kf_max_frames,
        kf_min_matches=kf_min_matches,
        covis_ratio=covis_ratio,
        track_iters=track_iters,
    )
    packed = _pack(kl, vl, disparity, stereo_ok, track_m)
    return packed, dl, kl, vl, track_out, kf_state2, pose_carry2


def fused_stereo_step(
    sp_params,
    lg_params,
    images_u8: jnp.ndarray,  # (2, H, W) uint8 [L, R], padded
    kf_kpts: jnp.ndarray,
    kf_desc: jnp.ndarray,
    kf_valid: jnp.ndarray,
    **kw,
):
    """Single-frame convenience wrapper over fused_stereo_step_multi.

    Returns (packed (PACK_ROWS, K), desc (K, D), kpts (K, 2), valid (K,)).
    """
    packed, dl, kl, vl = fused_stereo_step_multi(
        sp_params, lg_params, images_u8, kf_kpts, kf_desc, kf_valid, **kw
    )
    return packed, dl[0], kl[0], vl[0]
