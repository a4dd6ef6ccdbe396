"""Pretrained-weight parity harness (BASELINE.md configs 1-2).

Runs the moment real checkpoints land in ``weights/`` and SKIPS cleanly
until then. This environment has zero egress and no local caches — searched
2026-08-16: ``~/.cache/torch/hub`` (empty), ``~/.cache/huggingface``
(absent), filesystem-wide ``*.safetensors``/``*.pth`` (none outside the jit
cache) — so the whole system currently runs deterministic random init.
``scripts/export_weights.py`` produces the three files from the published
torch checkpoints when egress exists.

Config 1: SuperPoint dense activation parity — our JAX forward vs an
independent torch forward built HERE from the same state dict (conv
semantics per the exported architecture,
/root/reference/utils/convert_superpoint_to_onnx.py:26-124).
Config 2: LightGlue match quality on a warped pair — with real weights the
matcher must recover a known homography's correspondences; random weights
cannot pass this.
"""

import os

import numpy as np
import pytest

WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "weights")
SP_WEIGHTS = os.path.join(WEIGHTS_DIR, "superpoint_v1.safetensors")
LG_WEIGHTS = os.path.join(WEIGHTS_DIR, "lightglue_superpoint.safetensors")


def _need(path: str):
    if not os.path.exists(path):
        pytest.skip(
            f"no pretrained checkpoint at {path} (zero-egress environment; "
            "run scripts/export_weights.py where downloads are possible)"
        )


def _torch_superpoint_dense(state: dict, img: np.ndarray):
    """Independent torch forward over the published SuperPoint state dict:
    VGG encoder + detector/descriptor heads, the semantics our JAX model
    must reproduce."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}
    x = torch.from_numpy(img).float()[None, None]

    def conv(x, name, relu=True):
        y = F.conv2d(x, t[f"{name}.weight"], t[f"{name}.bias"], padding=t[f"{name}.weight"].shape[-1] // 2)
        return F.relu(y) if relu else y

    for n in ("conv1a", "conv1b"):
        x = conv(x, n)
    x = F.max_pool2d(x, 2)
    for n in ("conv2a", "conv2b"):
        x = conv(x, n)
    x = F.max_pool2d(x, 2)
    for n in ("conv3a", "conv3b"):
        x = conv(x, n)
    x = F.max_pool2d(x, 2)
    for n in ("conv4a", "conv4b"):
        x = conv(x, n)
    cPa = conv(x, "convPa")
    logits = conv(cPa, "convPb", relu=False)
    scores = torch.softmax(logits, dim=1)[:, :-1]
    b, c, h, w = scores.shape
    scores = scores.permute(0, 2, 3, 1).reshape(b, h, w, 8, 8)
    scores = scores.permute(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)
    cDa = conv(x, "convDa")
    desc = conv(cDa, "convDb", relu=False)
    desc = torch.nn.functional.normalize(desc, p=2, dim=1)
    return scores[0].numpy(), desc[0].permute(1, 2, 0).numpy()


def test_superpoint_activation_parity_vs_torch():
    _need(SP_WEIGHTS)
    import jax.numpy as jnp
    from safetensors import safe_open

    from superslam_tpu.models.superpoint import superpoint_dense
    from superslam_tpu.models.weights import load_safetensors

    state = {}
    with safe_open(SP_WEIGHTS, framework="numpy") as f:
        for name in f.keys():
            state[name] = np.asarray(f.get_tensor(name))
    params = load_safetensors(SP_WEIGHTS)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (120, 160)).astype(np.float32)  # TUM-shaped crop

    ref_scores, ref_desc = _torch_superpoint_dense(state, img)
    scores, desc = superpoint_dense(
        params, jnp.asarray(img)[None], nms_radius=0, compute_dtype=jnp.float32
    )
    scores, desc = np.asarray(scores)[0], np.asarray(desc)[0]

    assert np.abs(scores - ref_scores).max() < 1e-4
    cos = np.sum(desc * ref_desc, axis=-1) / (
        np.linalg.norm(desc, axis=-1) * np.linalg.norm(ref_desc, axis=-1) + 1e-12
    )
    assert cos.min() > 0.999


def test_lightglue_recovers_shift_correspondences():
    _need(LG_WEIGHTS)
    _need(SP_WEIGHTS)
    import jax.numpy as jnp

    from superslam_tpu.models.lightglue import extract_matches, lightglue_forward
    from superslam_tpu.models.superpoint import superpoint_extract
    from superslam_tpu.models.weights import load_safetensors

    sp = load_safetensors(SP_WEIGHTS)
    lg = load_safetensors(LG_WEIGHTS)

    rng = np.random.default_rng(1)
    base = rng.uniform(0, 1, (400, 1280)).astype(np.float32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3
    left = base[:376, :1241]
    shift = 24
    right = base[:376, shift : shift + 1241]  # pure horizontal shift
    K = 512
    img = jnp.asarray(np.stack([np.pad(left, ((0, 8), (0, 7))), np.pad(right, ((0, 8), (0, 7)))]))
    kpts, sc, valid, desc = superpoint_extract(
        sp, img, max_keypoints=K, keypoint_threshold=5e-4,
        true_width=1241, true_height=376,
    )
    center = jnp.array([620.5, 188.0], jnp.float32)
    nk = (kpts - center) / 620.5
    la = lightglue_forward(lg, nk[:1], desc[:1], nk[1:], desc[1:], valid[:1], valid[1:])
    matches, mscores = extract_matches(la, valid[:1], valid[1:], 0.2)
    m = np.asarray(matches)[0]
    k0, k1 = np.asarray(kpts[0]), np.asarray(kpts[1])
    qi = np.flatnonzero(m >= 0)
    assert qi.size > 50  # real weights find many matches on a textured pair
    dx = k0[qi, 0] - k1[m[qi], 0]
    dy = k0[qi, 1] - k1[m[qi], 1]
    good = (np.abs(dx - shift) < 2) & (np.abs(dy) < 2)
    assert good.mean() > 0.8  # the known shift dominates
