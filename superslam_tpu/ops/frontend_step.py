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

Packed row layout (f32, shape (10, K)):
  0: kpt x (left)        5: uR of the stereo match (gated; NaN-free, use row 6)
  1: kpt y (left)        6: stereo-valid flag
  2: keypoint score      7: track match index into the KF set (-1 = none)
  3: keypoint valid      8: track match score
  4: (reserved: 0)       9: (reserved: 0)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.lightglue import extract_matches, lightglue_forward
from ..models.superpoint import select_keypoints, superpoint_dense

PACK_ROWS = 10


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
def fused_stereo_step(
    sp_params,
    lg_params,
    images_u8: jnp.ndarray,  # (2, H, W) uint8 [L, R], padded
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
    """Returns (packed (PACK_ROWS, K) f32, desc (K, D), kpts (K, 2), valid (K,)).

    `packed` is the single host readback; the other outputs stay on device
    and become the next keyframe's inputs when the gate fires.
    """
    images = images_u8.astype(jnp.float32) / 255.0
    scores, grid = superpoint_dense(sp_params, images, nms_radius=nms_radius)
    kpts, kp_scores, valid, desc = select_keypoints(
        scores,
        grid,
        max_keypoints,
        keypoint_threshold,
        remove_borders,
        true_width,
        true_height,
    )
    kl, kr = kpts[0], kpts[1]
    dl, dr = desc[0], desc[1]
    vl, vr = valid[0], valid[1]

    scale = max(true_width, true_height) / 2.0
    center = jnp.array([true_width / 2.0, true_height / 2.0], jnp.float32)
    nkl = (kl - center) / scale
    nkr = (kr - center) / scale
    nkf = (kf_kpts - center) / scale

    # Stereo match L<->R + KF<->L track match: batch the two pair-problems
    # into one LightGlue forward (leading batch of 2) so the transformer
    # weights are read once and the MXU sees twice the work per dispatch.
    q_kpts = jnp.stack([nkl, nkf])
    q_desc = jnp.stack([dl, kf_desc.astype(dl.dtype)])
    q_valid = jnp.stack([vl, kf_valid])
    t_kpts = jnp.stack([nkr, nkl])
    t_desc = jnp.stack([dr, dl])
    t_valid = jnp.stack([vr, vl])
    la = lightglue_forward(lg_params, q_kpts, q_desc, t_kpts, t_desc, q_valid, t_valid)
    matches, mscores = extract_matches(la, q_valid, t_valid, match_threshold)
    stereo_m, stereo_s = matches[0], mscores[0]
    track_m, track_s = matches[1], mscores[1]

    # Stereo gates on device (StereoFrontEnd.cc:35-46): disparity floor and
    # rectified-row check.
    j = jnp.maximum(stereo_m, 0)
    uR = kr[j, 0]
    vR = kr[j, 1]
    disparity = kl[:, 0] - uR
    row_ok = jnp.abs(kl[:, 1] - vR) <= 2.0
    stereo_ok = (stereo_m >= 0) & (disparity >= min_disparity) & row_ok & vl

    K = kl.shape[0]
    packed = jnp.zeros((PACK_ROWS, K), jnp.float32)
    packed = packed.at[0].set(kl[:, 0])
    packed = packed.at[1].set(kl[:, 1])
    packed = packed.at[2].set(kp_scores[0])
    packed = packed.at[3].set(vl.astype(jnp.float32))
    packed = packed.at[5].set(uR)
    packed = packed.at[6].set(stereo_ok.astype(jnp.float32))
    packed = packed.at[7].set(track_m.astype(jnp.float32))
    packed = packed.at[8].set(track_s)
    return packed, dl, kl, vl
