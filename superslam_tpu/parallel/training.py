"""Self-supervised fine-tuning step for the matcher, sharded over a mesh.

The reference has no training loop at all (models are exported from
published checkpoints, SURVEY §2 #25); this module is the TPU-native
capability the reference lacks but a production deployment wants: adapt
LightGlue on-domain with synthetic correspondence supervision
(homography/shift-style augmentation gives ground-truth i<->i assignments).

The step is a single pjit-compiled program over a (data, model) mesh:
batch sharded on ``data``, LightGlue attention/FFN weights sharded on
``model`` (see parallel.mesh), gradients all-reduced by XLA over ICI.
This is also the program the driver's multi-chip dry-run executes.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.lightglue import lightglue_forward

Params = dict[str, Any]


def matching_loss(
    params: Params,
    kpts0: jnp.ndarray,
    desc0: jnp.ndarray,
    kpts1: jnp.ndarray,
    desc1: jnp.ndarray,
    mask0: jnp.ndarray,
    mask1: jnp.ndarray,
    gt_indices: jnp.ndarray,  # (B, K) index into set1, -1 = unmatched
) -> jnp.ndarray:
    """Negative log-likelihood of the ground-truth assignment.

    Matched rows: -log P(i -> gt_i). Unmatched rows: -log(1 - sum_j P(i,j))
    (the dual-softmax 'dustbin' mass), clamped for stability.
    """
    la = lightglue_forward(
        params, kpts0, desc0, kpts1, desc1, mask0, mask1,
        compute_dtype=jnp.float32, fused=False,
    )
    b, k, _ = la.shape
    matched = gt_indices >= 0
    safe_idx = jnp.where(matched, gt_indices, 0)
    picked = jnp.take_along_axis(la, safe_idx[..., None], axis=2)[..., 0]
    pos_nll = -jnp.where(matched & mask0, picked, 0.0)

    row_mass = jnp.sum(jnp.exp(la), axis=2)  # (B, K)
    neg_nll = -jnp.where(
        (~matched) & mask0, jnp.log1p(-jnp.clip(row_mass, 0.0, 1.0 - 1e-6)), 0.0
    )
    denom = jnp.maximum(jnp.sum(mask0), 1.0)
    return (jnp.sum(pos_nll) + jnp.sum(neg_nll)) / denom


@partial(jax.jit, static_argnames=("tx",), donate_argnums=(0, 1))
def train_step(
    params: Params,
    opt_state,
    batch: dict[str, jnp.ndarray],
    tx,
):
    """One optimizer step. `batch` keys: kpts0, desc0, kpts1, desc1, mask0,
    mask1, gt_indices — all with a leading (sharded) batch dim."""
    loss, grads = jax.value_and_grad(matching_loss)(
        params,
        batch["kpts0"],
        batch["desc0"],
        batch["kpts1"],
        batch["desc1"],
        batch["mask0"],
        batch["mask1"],
        batch["gt_indices"],
    )
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_optimizer(lr: float = 1e-4):
    return optax.adamw(lr)


def synthetic_matching_batch(
    rng: np.random.Generator,
    batch: int,
    k: int,
    dim: int = 256,
    kpt_jitter: float = 0.01,
) -> dict[str, np.ndarray]:
    """Self-supervision: set1 is a noised permutation-free copy of set0 with
    a random keypoint jitter — ground truth is i <-> i for the valid prefix.
    `kpt_jitter` (normalized units) controls the simulated motion scale."""
    n_valid = k * 3 // 4
    kpts0 = rng.uniform(-1, 1, (batch, k, 2)).astype(np.float32)
    jitter = rng.normal(0, kpt_jitter, (batch, k, 2)).astype(np.float32)
    kpts1 = kpts0 + jitter
    desc0 = rng.standard_normal((batch, k, dim)).astype(np.float32)
    desc0 /= np.linalg.norm(desc0, axis=-1, keepdims=True)
    noise = rng.normal(0, 0.05, (batch, k, dim)).astype(np.float32)
    desc1 = desc0 + noise
    desc1 /= np.linalg.norm(desc1, axis=-1, keepdims=True)
    mask = (np.arange(k) < n_valid)[None].repeat(batch, 0)
    gt = np.where(mask, np.arange(k)[None], -1).astype(np.int32)
    return {
        "kpts0": kpts0,
        "desc0": desc0,
        "kpts1": kpts1,
        "desc1": desc1,
        "mask0": mask,
        "mask1": mask,
        "gt_indices": gt,
    }
