"""SuperPoint pretraining losses and the jitted train step.

Implements the training objective of "SuperPoint: Self-Supervised Interest
Point Detection and Description" (DeTone et al. 2018) over the procedural
data of ``train.synthetic_shapes``:

- detector: per-cell 65-way softmax cross-entropy against the known corner
  positions, on BOTH views of the homographic pair;
- descriptor: dense cell-pair hinge loss with the correspondence matrix
  derived from the sampled homography.

The step is one jitted program (donated params/opt state); batches shard
naturally over a data mesh the same way ``parallel.training`` shards the
matcher fine-tuning step. The reference has no training path at all
(SURVEY §2 #25 — export-only); this is what lets a zero-egress TPU
deployment bootstrap working weights and demonstrate trajectory accuracy on
rendered ground truth (tests/test_synthetic_e2e.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.superpoint import superpoint_raw

Params = dict[str, Any]


def _detector_ce(
    logits: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Masked mean softmax cross-entropy. logits (B, gh, gw, 65),
    labels (B, gh, gw) int32, valid (B, gh, gw) f32."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.sum(picked * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def _descriptor_hinge(
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    corr: jnp.ndarray,
    valid1: jnp.ndarray,
    row_valid: jnp.ndarray | None = None,
    margin_pos: float = 1.0,
    margin_neg: float = 0.2,
    lambda_d: float = 250.0,
) -> jnp.ndarray:
    """Dense hinge over all cell pairs (the paper's L_desc).

    desc0/1: (B, gh, gw, D) normalized; corr: (B, gh*gw, gh*gw) f32 with
    corr[b, i, j] = 1 when cell i of view0 maps into cell j of view1;
    valid1: (B, gh, gw) f32 masking border cells of the warped view;
    row_valid: optional (B, gh*gw) f32 masking view0 cells — two-view
    render pairs exclude no-correspondence rows (mostly background), whose
    all-negative gradients would push visually identical background cells
    apart at random."""
    b, gh, gw, d = desc0.shape
    n = gh * gw
    f0 = desc0.reshape(b, n, d)
    f1 = desc1.reshape(b, n, d)
    dot = jnp.einsum("bid,bjd->bij", f0, f1)
    pos = corr * jnp.maximum(0.0, margin_pos - dot)
    neg = (1.0 - corr) * jnp.maximum(0.0, dot - margin_neg)
    pair_valid = valid1.reshape(b, 1, n)
    if row_valid is not None:
        pair_valid = pair_valid * row_valid[:, :, None]
    loss = (lambda_d * pos + neg) * pair_valid
    # Mean over the contributing (i, j) pairs.
    denom = jnp.sum(jnp.broadcast_to(pair_valid, (b, n, n)))
    return jnp.sum(loss) / jnp.maximum(denom, 1.0)


def pair_targets_from_h(
    H: jnp.ndarray, h: int, w: int, radius: float = 8.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side descriptor targets from the pair homography.

    The host pipeline ships only the 3x3 H per sample (9 floats) instead of
    the (gh*gw)^2 correspondence matrix — on this environment's narrow
    host->TPU link the training batch is bandwidth-bound, so targets are
    derived on device.

    Returns (corr (B, n, n) f32, valid1 (B, gh, gw) f32) matching
    synthetic_shapes._cell_correspondence / training_pair's valid1: corr is
    1 where cell i of view0 warps within `radius` px of cell j of view1;
    valid1 is 1 where the whole cell of the warped view is real content
    (its preimage under H^-1 lies inside the source image).
    """
    cell = 8
    gh, gw = h // cell, w // cell
    ys = jnp.arange(gh, dtype=jnp.float32) * cell + cell / 2 - 0.5
    xs = jnp.arange(gw, dtype=jnp.float32) * cell + cell / 2 - 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    centers = jnp.stack([gx.ravel(), gy.ravel()], 1)  # (n, 2) pixel (x, y)

    def project(M, pts):  # M (B,3,3), pts (m,2) -> (B,m,2)
        p = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1), pts.dtype)], 1)
        q = jnp.einsum("bij,mj->bmi", M, p)
        return q[..., :2] / (q[..., 2:3] + 1e-12)

    warped = project(H, centers)  # view0 cell centers in view1 pixels
    d2 = jnp.sum(
        (warped[:, :, None, :] - centers[None, None, :, :]) ** 2, axis=-1
    )
    corr = (d2 <= radius * radius).astype(jnp.float32)

    # Cell corners of view1, pulled back into view0 by H^-1.
    cyg, cxg = jnp.meshgrid(
        jnp.arange(gh, dtype=jnp.float32) * cell,
        jnp.arange(gw, dtype=jnp.float32) * cell,
        indexing="ij",
    )
    corners = jnp.stack(
        [
            jnp.stack([cxg + ox, cyg + oy], -1)
            for ox, oy in ((0.0, 0.0), (cell - 1, 0.0), (0.0, cell - 1), (cell - 1, cell - 1))
        ],
        0,
    ).reshape(4 * gh * gw, 2)
    back = project(jnp.linalg.inv(H), corners).reshape(-1, 4, gh, gw, 2)
    inside = (
        (back[..., 0] >= 0.0)
        & (back[..., 0] <= w - 1.0)
        & (back[..., 1] >= 0.0)
        & (back[..., 1] <= h - 1.0)
    )
    valid1 = jnp.all(inside, axis=1).astype(jnp.float32)
    return corr, valid1


def pair_targets_from_points(
    corr_pts: jnp.ndarray,
    h: int,
    w: int,
    radius: float = 8.0,
    excl_radius: float = 20.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side correspondence matrix from per-cell target points.

    ``corr_pts`` (B, n, 2): where each view0 cell center lands in view1
    pixels (any true cross-view mapping — the two-view render pairs of
    train/render_domain.py reproject through the sprite planes with
    occlusion checks; invisible cells carry a far-away sentinel). Ships 8
    bytes/cell over the host->TPU link instead of the n^2 matrix.

    Returns (corr, excl): corr marks cells within ``radius`` of the target
    (positives); excl additionally covers the ``excl_radius`` ring whose
    patches overlap the target — excluded from hardest-negative mining."""
    cell = 8
    gh, gw = h // cell, w // cell
    ys = jnp.arange(gh, dtype=jnp.float32) * cell + cell / 2 - 0.5
    xs = jnp.arange(gw, dtype=jnp.float32) * cell + cell / 2 - 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    centers = jnp.stack([gx.ravel(), gy.ravel()], 1)  # (n, 2)
    d2 = jnp.sum(
        (corr_pts[:, :, None, :] - centers[None, None, :, :]) ** 2, axis=-1
    )
    corr = (d2 <= radius * radius).astype(jnp.float32)
    excl = (d2 <= excl_radius * excl_radius).astype(jnp.float32)
    return corr, excl


def _hardest_negative_loss(
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    corr: jnp.ndarray,
    excl: jnp.ndarray,
    row_valid: jnp.ndarray,
    margin: float = 0.4,
) -> jnp.ndarray:
    """HardNet-style ranking loss: the true cell must beat the hardest
    non-overlapping distractor by ``margin`` in cosine.

    The dense hinge optimizes pos-vs-MEAN separation (desc_margin 0.7 on
    renders) yet mutual-NN matching stayed at 0.25 precision — the matcher
    gate is pos-vs-MAX over all candidates, which is what this term
    optimizes directly."""
    b, gh, gw, d = desc0.shape
    n = gh * gw
    f0 = desc0.reshape(b, n, d)
    f1 = desc1.reshape(b, n, d)
    dot = jnp.einsum("bid,bjd->bij", f0, f1)
    pos = jnp.max(jnp.where(corr > 0, dot, -2.0), axis=2)  # (b, n)
    hard = jnp.max(jnp.where(excl > 0, -2.0, dot), axis=2)
    per_row = jnp.maximum(0.0, margin + hard - pos) * row_valid
    return jnp.sum(per_row) / jnp.maximum(jnp.sum(row_valid), 1.0)


def _image_f32(x: jnp.ndarray) -> jnp.ndarray:
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def sp_loss(
    params: Params,
    batch: dict[str, jnp.ndarray],
    lambda_desc: float = 1e-4,
    lambda_hard: float = 1.0,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Total loss = CE(view0) + CE(view1) + lambda * descriptor hinge.

    `batch` carries either the precomputed host targets (`corr`, `valid1`,
    `valid0` — synthetic_shapes.training_batch) or the compact wire format
    (`H` only, uint8 images — scripts/train_superpoint.py) with targets
    derived on device by `pair_targets_from_h`."""
    img0, img1 = _image_f32(batch["img0"]), _image_f32(batch["img1"])
    logits0, desc0 = superpoint_raw(params, img0)
    logits1, desc1 = superpoint_raw(params, img1)
    row_valid = None
    hard = jnp.float32(0.0)
    if "corr" in batch:
        corr, valid1 = batch["corr"], batch["valid1"]
        valid0 = batch["valid0"]
    elif "corr_pts" in batch:
        # Two-view render pair: exact reprojection targets, full frames.
        h_, w_ = img0.shape[1], img0.shape[2]
        corr, excl = pair_targets_from_points(batch["corr_pts"], h_, w_)
        valid1 = jnp.ones(
            (img0.shape[0], h_ // 8, w_ // 8), jnp.float32
        )
        valid0 = valid1
        row_valid = (batch["corr_pts"][..., 0] > -1e5).astype(jnp.float32)
        hard = _hardest_negative_loss(desc0, desc1, corr, excl, row_valid)
    else:
        corr, valid1 = pair_targets_from_h(
            batch["H"], img0.shape[1], img0.shape[2]
        )
        valid0 = jnp.ones_like(valid1)
    ce0 = _detector_ce(logits0, batch["labels0"], valid0)
    ce1 = _detector_ce(logits1, batch["labels1"], valid1)
    dh = _descriptor_hinge(desc0, desc1, corr, valid1, row_valid)
    total = ce0 + ce1 + lambda_desc * dh + lambda_hard * hard
    return total, {"ce0": ce0, "ce1": ce1, "desc": dh, "hard": hard}


@partial(jax.jit, static_argnames=("tx",), donate_argnums=(0, 1))
def sp_train_step(params: Params, opt_state, batch, tx):
    (loss, aux), grads = jax.value_and_grad(sp_loss, has_aux=True)(params, batch)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, aux


def make_sp_optimizer(lr: float = 1e-3):
    return optax.adam(lr)


def evaluate_detector(
    params: Params,
    rng: np.random.Generator,
    n_images: int = 8,
    h: int = 120,
    w: int = 160,
    threshold: float = 0.015,
    max_keypoints: int = 256,
    image_fn=None,
) -> dict[str, float]:
    """Detection quality on fresh synthetic images through the PRODUCTION
    extraction program (dense heads + NMS + on-device top-K select), plus a
    descriptor discriminability margin (mean cosine at corresponding cells
    minus mean cosine at random non-corresponding cells).

    ``image_fn(rng) -> (img, corners)`` overrides the image source (default
    procedural shapes; pass RenderDomainSource.labeled_image to score the
    sprite-world domain)."""
    import jax.numpy as jnp

    from ..models.superpoint import superpoint_extract
    from .synthetic_shapes import render_shapes, sample_homography, warp_points

    import cv2

    if image_fn is None:
        image_fn = lambda r: render_shapes(r, h, w)  # noqa: E731

    ps, rs, fs, margins = [], [], [], []
    for _ in range(n_images):
        img, corners = image_fn(rng)
        h, w = img.shape
        if len(corners) == 0:
            continue
        kpts, scores, valid, desc = superpoint_extract(
            params,
            jnp.asarray(img)[None],
            max_keypoints=max_keypoints,
            keypoint_threshold=threshold,
        )
        det = np.asarray(kpts[0])[np.asarray(valid[0])]
        p, r, f1 = detection_prf(det, corners)
        ps.append(p)
        rs.append(r)
        fs.append(f1)

        # Descriptor margin across a homographic warp.
        H = sample_homography(rng, h, w)
        img1 = cv2.warpPerspective(img, H.astype(np.float32), (w, h))
        k1, s1, v1, d1 = superpoint_extract(
            params,
            jnp.asarray(img1)[None],
            max_keypoints=max_keypoints,
            keypoint_threshold=threshold,
        )
        det0 = np.asarray(kpts[0])[np.asarray(valid[0])]
        dsc0 = np.asarray(desc[0])[np.asarray(valid[0])]
        det1 = np.asarray(k1[0])[np.asarray(v1[0])]
        dsc1 = np.asarray(d1[0])[np.asarray(v1[0])]
        if len(det0) and len(det1):
            w0 = warp_points(H, det0)
            dist = np.linalg.norm(w0[:, None] - det1[None], axis=2)
            j = dist.argmin(1)
            close = dist[np.arange(len(det0)), j] < 4.0
            if close.sum() >= 3:
                cos = np.sum(dsc0 * dsc1[j], axis=1)
                pos = float(cos[close].mean())
                neg = float((dsc0 @ dsc1.T).mean())
                margins.append(pos - neg)
    return {
        "precision": float(np.mean(ps)) if ps else 0.0,
        "recall": float(np.mean(rs)) if rs else 0.0,
        "f1": float(np.mean(fs)) if fs else 0.0,
        "desc_margin": float(np.mean(margins)) if margins else 0.0,
    }


def detection_prf(
    detected: np.ndarray, gt: np.ndarray, tol_px: float = 4.0
) -> tuple[float, float, float]:
    """Precision / recall / F1 of detected (N, 2) vs ground-truth (M, 2)
    corner locations with a pixel tolerance — the pretraining quality gate.
    """
    if len(detected) == 0 or len(gt) == 0:
        return 0.0, 0.0, 0.0
    d = np.linalg.norm(detected[:, None, :] - gt[None, :, :], axis=2)
    prec = float(np.mean(d.min(axis=1) <= tol_px))
    rec = float(np.mean(d.min(axis=0) <= tol_px))
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return prec, rec, f1
