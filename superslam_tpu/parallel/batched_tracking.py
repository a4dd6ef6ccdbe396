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
