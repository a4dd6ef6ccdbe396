"""Fused per-frame device program for the RGB-D path.

RGB-D needs no stereo match (depth comes from the sensor), but the
frame-to-keyframe track match is still a per-frame LightGlue call; leaving
it as a separate program would pay this host's fixed readback round trip
twice. So the RGB-D step fuses: normalize -> SuperPoint (B=1) -> top-K
select -> LightGlue KF<->frame match -> one packed (3, K) int16 readback
(kpt x with -1 marking invalid, kpt y, track match idx). Depth sampling,
undistortion and uR synthesis stay host-side (the depth image never needs
to visit the device) — mirroring the reference's RgbdFrontEnd split
(src/RgbdFrontEnd.cc:23-58).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .precision import highest_f32_matmuls

from ..models.lightglue import extract_matches, lightglue_forward
from ..models.superpoint import select_keypoints, superpoint_dense
from ..utils.env import env_flag
from .frontend_step import PACK_SCALE

# int16 rows: [kpt x (<0 = invalid), kpt y, track match idx]; x and y in
# 1/PACK_SCALE px fixed point (sub-pixel refined keypoints).
RGBD_PACK_ROWS = 3


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_keypoints",
        "keypoint_threshold",
        "remove_borders",
        "nms_radius",
        "true_width",
        "true_height",
        "match_threshold",
    ),
)
@highest_f32_matmuls
def fused_rgbd_step(
    sp_params,
    lg_params,
    image_u8: jnp.ndarray,  # (1, H, W) uint8, padded
    kf_kpts: jnp.ndarray,
    kf_desc: jnp.ndarray,
    kf_valid: jnp.ndarray,
    max_keypoints: int,
    keypoint_threshold: float,
    remove_borders: int,
    nms_radius: int,
    true_width: int,
    true_height: int,
    match_threshold: float,
):
    """Returns (packed (RGBD_PACK_ROWS, K), desc (K, D), kpts (K, 2),
    valid (K,))."""
    image = image_u8.astype(jnp.float32) / 255.0
    subpixel = env_flag("SUPERSLAM_SP_SUBPIXEL", True)
    out = superpoint_dense(
        sp_params, image, nms_radius=nms_radius, return_pre_nms=subpixel
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
    kl, dl, vl = kpts[0], desc[0], valid[0]

    scale = max(true_width, true_height) / 2.0
    center = jnp.array([true_width / 2.0, true_height / 2.0], jnp.float32)
    la = lightglue_forward(
        lg_params,
        ((kf_kpts - center) / scale)[None],
        kf_desc.astype(dl.dtype)[None],
        ((kl - center) / scale)[None],
        dl[None],
        kf_valid[None],
        vl[None],
    )
    track_m, track_s = extract_matches(la, kf_valid[None], vl[None], match_threshold)
    del track_s, kp_scores  # confidences are not consumed downstream

    packed = jnp.stack(
        [
            jnp.where(vl, kl[:, 0] * PACK_SCALE, -1.0),
            kl[:, 1] * PACK_SCALE,
            track_m[0].astype(jnp.float32),
        ],
        axis=0,
    )
    packed = jnp.round(packed).astype(jnp.int16)
    return packed, dl, kl, vl


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_keypoints",
        "keypoint_threshold",
        "remove_borders",
        "nms_radius",
        "true_width",
        "true_height",
        "match_threshold",
    ),
)
@highest_f32_matmuls
def fused_rgbd_step_multi(
    sp_params,
    lg_params,
    images_u8: jnp.ndarray,  # (S, H, W) uint8, padded
    kf_kpts: jnp.ndarray,
    kf_desc: jnp.ndarray,
    kf_valid: jnp.ndarray,
    max_keypoints: int,
    keypoint_threshold: float,
    remove_borders: int,
    nms_radius: int,
    true_width: int,
    true_height: int,
    match_threshold: float,
):
    """S consecutive RGB frames in ONE program (the RGB-D analogue of
    fused_stereo_step_multi): S pair-batched LightGlue track matches against
    the shared keyframe state, one packed (S*RGBD_PACK_ROWS, K) readback.
    Frame s owns rows [s*RGBD_PACK_ROWS, (s+1)*RGBD_PACK_ROWS)."""
    S = images_u8.shape[0]
    images = images_u8.astype(jnp.float32) / 255.0
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

    scale = max(true_width, true_height) / 2.0
    center = jnp.array([true_width / 2.0, true_height / 2.0], jnp.float32)
    nk = (kpts - center) / scale
    kf_k = jnp.broadcast_to(((kf_kpts - center) / scale)[None], nk.shape)
    kf_d = jnp.broadcast_to(kf_desc[None].astype(desc.dtype), desc.shape)
    kf_v = jnp.broadcast_to(kf_valid[None], valid.shape)
    la = lightglue_forward(lg_params, kf_k, kf_d, nk, desc, kf_v, valid)
    track_m, _ = extract_matches(la, kf_v, valid, match_threshold)
    del kp_scores

    packed = jnp.stack(
        [
            jnp.where(valid, kpts[..., 0] * PACK_SCALE, -1.0),
            kpts[..., 1] * PACK_SCALE,
            track_m.astype(jnp.float32),
        ],
        axis=1,
    )  # (S, 3, K)
    packed = jnp.round(packed).astype(jnp.int16)
    return packed.reshape(S * RGBD_PACK_ROWS, -1), desc, kpts, valid


def undistort_points_jnp(
    uv: jnp.ndarray, calib: tuple, dist: tuple, iterations: int = 8
) -> jnp.ndarray:
    """Radtan undistortion on device — the jnp mirror of
    io.undistort.undistort_points (cv::undistortPoints semantics,
    src/RgbdFrontEnd.cc:36-40). uv (..., 2) pixels -> (..., 2) pixels."""
    fx, fy, cx, cy, _b = calib
    k1, k2, p1, p2, k3 = dist
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy

    def distort(x, y):
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        xn = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yn = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        return xn, yn

    x, y = xd, yd
    for _ in range(iterations):
        dx, dy = distort(x, y)
        x = x + (xd - dx)
        y = y + (yd - dy)
    return jnp.stack([x * fx + cx, y * fy + cy], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_keypoints",
        "keypoint_threshold",
        "remove_borders",
        "nms_radius",
        "true_width",
        "true_height",
        "match_threshold",
        "calib",
        "min_matches",
        "track_sigma_px",
        "track_iters",
        "dist",
    ),
)
@highest_f32_matmuls
def fused_rgbd_track_step_multi(
    sp_params,
    lg_params,
    images_u8: jnp.ndarray,  # (S, H, W) uint8, padded
    kf_kpts: jnp.ndarray,
    kf_desc: jnp.ndarray,
    kf_valid: jnp.ndarray,
    kf_xw: jnp.ndarray,  # (K, 3) world points of the KF features
    kf_depth_ok: jnp.ndarray,  # (K,) bool
    carry_R: jnp.ndarray,
    carry_t: jnp.ndarray,
    rel_R: jnp.ndarray,
    rel_t: jnp.ndarray,
    max_keypoints: int,
    keypoint_threshold: float,
    remove_borders: int,
    nms_radius: int,
    true_width: int,
    true_height: int,
    match_threshold: float,
    calib: tuple,
    min_matches: int,
    track_sigma_px: float,
    track_iters: int = 20,
    dist: tuple | None = None,
):
    """fused_rgbd_step_multi + the on-device pose chain (MONO factors).

    The sensor depth image never visits the device (the reference's
    RgbdFrontEnd split, src/RgbdFrontEnd.cc:23-58), so the per-frame solve
    uses (uL, v) reprojection residuals only — track_scan with mono=True;
    the KF world points (backprojected from sensor depth at keyframe
    insertion, uploaded once per keyframe) carry the metric scale. For
    distorted calibrations pass `dist` (radtan k1,k2,p1,p2,k3): the frame
    keypoints are undistorted ON DEVICE before the solve, matching the host
    estimator's cv::undistortPoints-equivalent coordinates.

    Returns (packed, desc, kpts, valid, track_out (S, TRACK_COLS) f32,
    (carry_R, carry_t, rel_R, rel_t)).
    """
    from .frontend_step import track_scan

    packed, desc, kpts, valid = fused_rgbd_step_multi.__wrapped__(
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
        match_threshold,
    )
    S = images_u8.shape[0]
    track_m = packed.reshape(S, RGBD_PACK_ROWS, -1)[:, 2].astype(jnp.int32)
    kl = kpts if dist is None else undistort_points_jnp(kpts, calib, dist)
    track_out, carry = track_scan(
        kl,
        jnp.zeros(valid.shape, jnp.float32),
        valid,
        track_m,
        kf_xw,
        kf_depth_ok,
        (carry_R, carry_t, rel_R, rel_t),
        calib=calib,
        min_matches=min_matches,
        track_sigma_px=track_sigma_px,
        disp_sigma0=1.0,  # unused in mono mode
        disp_cond=1.0,
        track_iters=track_iters,
        mono=True,
    )
    return packed, desc, kpts, valid, track_out, carry
