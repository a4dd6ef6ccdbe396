"""Multi-sequence batched tracking: the data-parallel TPU capability.

BASELINE config 5 asks for "multi-sequence batched tracking on TPU": run S
independent camera streams through one compiled front-end program with the
sequence axis sharded over the ``data`` mesh axis. Each chip owns S/n
sequences; there is no cross-sequence communication, so the collective cost
is zero and throughput scales linearly over ICI-attached chips.

This wraps the same jitted programs the single-sequence facade uses —
superpoint_extract and lightglue_match vmapped over the sequence axis — and
is exercised by the multi-chip dry-run.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.lightglue import lightglue_forward, extract_matches
from ..models.superpoint import select_keypoints, superpoint_dense


@partial(
    jax.jit,
    static_argnames=("max_keypoints", "keypoint_threshold", "remove_borders"),
)
def batched_stereo_frontend(
    sp_params,
    lg_params,
    left: jnp.ndarray,  # (S, H, W) f32
    right: jnp.ndarray,  # (S, H, W) f32
    max_keypoints: int = 512,
    keypoint_threshold: float = 0.005,
    remove_borders: int = 4,
):
    """S stereo pairs -> keypoints, descriptors and L<->R matches, one XLA
    program. Shard `left`/`right` on the mesh 'data' axis to distribute
    sequences over chips."""
    s, h, w = left.shape
    images = jnp.concatenate([left, right], axis=0)  # (2S, H, W)
    scores, desc_grid = superpoint_dense(sp_params, images)
    kpts, kp_scores, valid, desc = select_keypoints(
        scores, desc_grid, max_keypoints, keypoint_threshold, remove_borders
    )
    kl, kr = kpts[:s], kpts[s:]
    dl, dr = desc[:s], desc[s:]
    vl, vr = valid[:s], valid[s:]

    scale = max(w, h) / 2.0
    center = jnp.array([w / 2.0, h / 2.0], jnp.float32)
    la = lightglue_forward(
        lg_params, (kl - center) / scale, dl, (kr - center) / scale, dr, vl, vr
    )
    matches0, mscores0 = extract_matches(la, vl, vr)
    return {
        "kpts_left": kl,
        "kpts_right": kr,
        "scores_left": kp_scores[:s],
        "desc_left": dl,
        "valid_left": vl,
        "matches0": matches0,
        "mscores0": mscores0,
    }


@partial(
    jax.jit,
    static_argnames=(
        "calib",
        "min_matches",
        "track_sigma_px",
        "disp_sigma0",
        "disp_cond",
        "track_iters",
        "mono",
    ),
)
def batched_track_scan(
    kl: jnp.ndarray,  # (Q, S, K, 2) — Q sequences, S frames each
    disparity: jnp.ndarray,  # (Q, S, K)
    stereo_ok: jnp.ndarray,  # (Q, S, K) bool
    track_m: jnp.ndarray,  # (Q, S, K) int32
    kf_xw: jnp.ndarray,  # (Q, K, 3) per-sequence keyframe world points
    kf_depth_ok: jnp.ndarray,  # (Q, K) bool
    carry,  # (R (Q,3,3), t (Q,3), rel_R (Q,3,3), rel_t (Q,3))
    *,
    calib: tuple,
    min_matches: int,
    track_sigma_px: float,
    disp_sigma0: float,
    disp_cond: float,
    track_iters: int = 20,
    mono: bool = False,
):
    """Data-parallel on-device tracking: ops.frontend_step.track_scan vmapped
    over the sequence axis. Shard every argument's leading Q axis on the
    mesh 'data' axis and each chip runs its own sequences' pose chains with
    zero cross-sequence communication — the tracking-on-chip form of
    multi-sequence batched tracking (vmap's while_loop batching rule runs
    each sequence's LM to its own convergence under a joint mask).

    Returns (track_out (Q, S, TRACK_COLS), carry with leading Q)."""
    from ..ops.frontend_step import track_scan

    f = partial(
        track_scan,
        calib=calib,
        min_matches=min_matches,
        track_sigma_px=track_sigma_px,
        disp_sigma0=disp_sigma0,
        disp_cond=disp_cond,
        track_iters=track_iters,
        mono=mono,
    )
    return jax.vmap(f)(kl, disparity, stereo_ok, track_m, kf_xw, kf_depth_ok, carry)
