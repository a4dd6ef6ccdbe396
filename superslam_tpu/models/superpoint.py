"""SuperPoint keypoint detector + descriptor as a pure-JAX function.

Reimplements the architecture the reference exports to ONNX/TensorRT
(``/root/reference/utils/convert_superpoint_to_onnx.py:26-124``): the
conv1a..conv4b VGG encoder, the 65-channel detector head with softmax +
depth-to-space + in-graph max-pool NMS (radius 4), and the 256-d descriptor
head with channel-wise L2 normalization — designed TPU-first:

- NHWC layout (TPU conv-friendly), bfloat16 compute, f32 score head.
- Keypoint selection runs ON DEVICE: border mask + threshold + `lax.top_k`
  + descriptor gather + renormalize, all inside the same jitted program.
  The reference copies the full score map to the host, scans and sorts it on
  CPU, then launches a custom CUDA gather (``src/SuperPoint.cc:681-750``,
  ``src/DescriptorGather.cu:14-82``); on TPU the whole path is one XLA
  program and descriptors never exist anywhere but HBM.
- Static shapes: images are padded to a fixed H x W per dataset and the
  keypoint count is a static K = max_keypoints with a validity mask.

Parameters are a flat dict keyed by the torch state-dict names
(``conv1a.weight`` etc.) so the published superpoint_v1.pth / safetensors
weights load without renaming (conv kernels transposed OIHW -> HWIO at load;
see models.weights).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

DESCRIPTOR_DIM = 256
CELL = 8  # stride of the descriptor grid


def _conv(x: jnp.ndarray, params: Params, name: str, compute_dtype) -> jnp.ndarray:
    """3x3 (SAME) or 1x1 conv in NHWC with HWIO weights."""
    w = params[f"{name}.weight"].astype(compute_dtype)
    b = params[f"{name}.bias"].astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _pool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _pallas_convs_wanted() -> bool:
    """Whether the large-spatial-extent encoder convs route through the
    Pallas kernels (ops/pallas/conv.py). Default: on for TPU backends, off
    on CPU (where the XLA conv path is the oracle and interpret-mode Pallas
    is orders of magnitude slower). SUPERSLAM_PALLAS_CONV=0/1 overrides.
    The kernels are Mosaic (TPU)-only, so any other backend (gpu, a future
    plugin) takes the XLA path."""
    import os

    v = os.environ.get("SUPERSLAM_PALLAS_CONV")
    if v is not None:
        return v not in ("0", "", "false")
    return jax.default_backend() == "tpu"


def _front_convs_pallas(
    params: Params,
    image: jnp.ndarray,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """conv1a..conv2b + pools via the Pallas CHW kernels (the stages whose
    spatial extent makes XLA's conv lowering run at ~10% MXU utilization).
    Returns quarter-res NHWC (B, H/4, ceil(W/128)*128 / 4, 64) with zeros in
    the width padding, ready for the XLA conv3a.. stages."""
    from ..ops.pallas.conv import (
        PAD_ROWS,
        conv1a1b_chw,
        conv_pair_chw,
        hpool_canvas,
        to_canvas,
    )

    def lane_pad(t):
        wp = -(-t.shape[3] // 128) * 128
        if wp == t.shape[3]:
            return t
        return jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, wp - t.shape[3])))

    b, h, w = image.shape
    x = lane_pad(to_canvas(image, w))
    # Each conv stage emits its output vertically pooled (the row pair is
    # combined in-registers on the way out); XLA finishes only the cheap
    # horizontal half on half the rows. reduce_window on the full-res canvas
    # measured ~0.8 ms — 5x off bandwidth — so the pool must never see it.
    x = conv1a1b_chw(
        x,
        params["conv1a.weight"],
        params["conv1a.bias"],
        params["conv1b.weight"],
        params["conv1b.bias"],
        w_img=w,
        interpret=interpret,
        out_dtype=compute_dtype,
        pool_vert=True,
    )
    x = lane_pad(hpool_canvas(x))
    x = conv_pair_chw(
        x,
        params["conv2a.weight"],
        params["conv2a.bias"],
        params["conv2b.weight"],
        params["conv2b.bias"],
        w_img=w // 2,
        interpret=interpret,
        out_dtype=compute_dtype,
        pool_vert=True,
    )
    x = hpool_canvas(x)
    # Slice to the EXACT quarter-res extent: from here the XLA stages see
    # the same canvas as the pure-XLA path (SAME padding semantics and all).
    core = x[:, :, PAD_ROWS : PAD_ROWS + h // 4, : w // 4]
    return core.transpose(0, 2, 3, 1)  # NHWC


def _encoder_and_heads(
    params: Params,
    image: jnp.ndarray,
    compute_dtype,
    use_pallas_convs: bool | None,
) -> tuple[jnp.ndarray, jnp.ndarray, bool]:
    """VGG encoder + both heads at descriptor-grid resolution.

    Returns (logits (B, H/8, Wp/8, 65) f32, desc_raw (B, H/8, Wp/8, 256)
    UNnormalized, compute_dtype, resolved use_pallas_convs) where Wp >= W is
    the lane-padded width when the Pallas conv path is active (callers slice
    back to W).
    """
    if use_pallas_convs is None:
        use_pallas_convs = _pallas_convs_wanted()
    b_, h_, w_ = image.shape
    # The Pallas conv+pool kernels grid 16-row stripes at full AND half
    # resolution, so H must be a multiple of 32 (the frontends pad to it;
    # tiny synthetic frames fall back to the XLA path).
    if h_ % 32 != 0 or w_ % 8 != 0:
        use_pallas_convs = False
    relu = jax.nn.relu
    if use_pallas_convs:
        x = _front_convs_pallas(
            params,
            image,
            interpret=jax.default_backend() == "cpu",
            compute_dtype=compute_dtype,
        )
    else:
        x = image[..., None]  # NHWC
        x = relu(_conv(x, params, "conv1a", compute_dtype))
        x = relu(_conv(x, params, "conv1b", compute_dtype))
        x = _pool2(x)
        x = relu(_conv(x, params, "conv2a", compute_dtype))
        x = relu(_conv(x, params, "conv2b", compute_dtype))
        x = _pool2(x)
    x = relu(_conv(x, params, "conv3a", compute_dtype))
    x = relu(_conv(x, params, "conv3b", compute_dtype))
    x = _pool2(x)
    x = relu(_conv(x, params, "conv4a", compute_dtype))
    x = relu(_conv(x, params, "conv4b", compute_dtype))

    # Detector head: 65 channels = 8x8 cell logits + dustbin.
    cPa = relu(_conv(x, params, "convPa", compute_dtype))
    logits = _conv(cPa, params, "convPb", compute_dtype).astype(jnp.float32)
    cDa = relu(_conv(x, params, "convDa", compute_dtype))
    desc = _conv(cDa, params, "convDb", compute_dtype)
    return logits, desc, use_pallas_convs


def superpoint_raw(
    params: Params,
    image: jnp.ndarray,
    compute_dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Training-time forward: raw detector logits and L2-normalized
    descriptor grid, both at cell resolution, differentiable end to end
    (always the XLA conv path — the Pallas kernels are inference-only).

    Returns:
      logits (B, H/8, W/8, 65) f32 — 64 in-cell positions + dustbin;
      desc (B, H/8, W/8, 256) L2-normalized over channels.
    """
    logits, desc, _ = _encoder_and_heads(
        params, image, compute_dtype, use_pallas_convs=False
    )
    desc = desc.astype(jnp.float32)
    desc = desc * jax.lax.rsqrt(
        jnp.sum(jnp.square(desc), axis=-1, keepdims=True) + 1e-12
    )
    return logits, desc


def superpoint_dense(
    params: Params,
    image: jnp.ndarray,
    nms_radius: int = 4,
    compute_dtype=jnp.bfloat16,
    use_pallas_convs: bool | None = None,
    return_pre_nms: bool = False,
) -> tuple[jnp.ndarray, ...]:
    """Dense forward pass.

    Args:
      image: (B, H, W) grayscale in [0, 1]. H must be a multiple of 8; when
        the Pallas conv path is active, W is internally padded to a lane
        multiple and the outputs are sliced back, so results match the XLA
        path up to bf16 rounding.
      return_pre_nms: also return the heatmap BEFORE non-max suppression —
        the 3x3 neighborhoods select_keypoints' sub-pixel refinement needs
        (NMS zeroes exactly those neighbors).
    Returns:
      scores (B, H, W) f32 NMS'd heatmap;
      descriptors (B, H/8, W/8, 256) L2-normalized grid (compute_dtype);
      [pre_nms (B, H, W) f32 when return_pre_nms].
    """
    b_, h_, w_ = image.shape
    logits, desc_raw, use_pallas_convs = _encoder_and_heads(
        params, image, compute_dtype, use_pallas_convs
    )
    scores = jax.nn.softmax(logits, axis=-1)[..., :-1]  # (B, h, w, 64)
    b, h, w, _ = scores.shape
    # Depth-to-space: (B, h, w, 8, 8) -> (B, h*8, w*8).
    scores = scores.reshape(b, h, w, CELL, CELL)
    scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, h * CELL, w * CELL)
    pre_nms = scores if return_pre_nms else None

    if nms_radius > 0:
        hs = scores.shape[1]
        if use_pallas_convs and hs % 16 == 0 and nms_radius <= 8:
            from ..ops.pallas.nms import nms_suppress

            scores = nms_suppress(
                scores, nms_radius, interpret=jax.default_backend() == "cpu"
            )
        else:
            k = 2 * nms_radius + 1
            # Max is separable: two 1-D windows (2k taps) instead of one
            # k x k window (k^2 taps) — identical result, ~4x less VPU work.
            pooled = jax.lax.reduce_window(
                scores, -jnp.inf, jax.lax.max, (1, 1, k), (1, 1, 1), "SAME"
            )
            pooled = jax.lax.reduce_window(
                pooled, -jnp.inf, jax.lax.max, (1, k, 1), (1, 1, 1), "SAME"
            )
            scores = jnp.where(scores == pooled, scores, 0.0)

    # Descriptor grid, L2-normalized over channels.
    desc = desc_raw
    desc = desc * jax.lax.rsqrt(
        jnp.sum(jnp.square(desc.astype(jnp.float32)), axis=-1, keepdims=True) + 1e-12
    ).astype(compute_dtype)
    if scores.shape[2] != w_:  # slice off the Pallas path's lane padding
        scores = scores[:, :, :w_]
        desc = desc[:, :, : w_ // CELL]
        if pre_nms is not None:
            pre_nms = pre_nms[:, :, :w_]
    if return_pre_nms:
        return scores, desc, pre_nms
    return scores, desc


def select_keypoints(
    scores: jnp.ndarray,
    descriptors: jnp.ndarray,
    max_keypoints: int,
    keypoint_threshold: float = 0.005,
    remove_borders: int = 4,
    true_width: int | None = None,
    true_height: int | None = None,
    use_pallas: bool = False,
    raw_scores: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """On-device top-K keypoint selection + nearest-cell descriptor gather.

    Replaces the reference's host score scan + sort + CUDA gather
    (src/SuperPoint.cc:696-750). Static output shapes: exactly K rows per
    image with a validity mask (score > threshold). Valid rows always form a
    prefix (top_k sorts scores descending and suppressed cells score 0).

    Args:
      scores: (B, H, W) f32 NMS'd heatmap (H, W may include right/bottom
        zero padding to reach conv-friendly multiples of 8).
      descriptors: (B, H/8, W/8, D) normalized grid.
      true_width/true_height: the un-padded image extent; borders are
        enforced against it so padding never produces keypoints.
      raw_scores: optional (B, H, W) PRE-NMS heatmap. When given, each
        keypoint is refined to sub-pixel position by independent 1-D
        parabolic fits over the raw 3x3 neighborhood (offsets clamped to
        +-0.5 px). The reference keeps integer NMS peaks
        (src/SuperPoint.cc:696-750); at stereo depth Z the induced depth
        noise is Z^2/(fx*b) per px of disparity error, so the sub-pixel
        gain compounds — a deliberate accuracy improvement, env-gated
        SUPERSLAM_SP_SUBPIXEL in the pipeline paths.
    Returns:
      kpts (B, K, 2) f32 (x, y) pixels; kp_scores (B, K) f32;
      valid (B, K) bool; desc (B, K, D) gathered rows (renormalized f32).
    """
    b, h, w = scores.shape
    gh, gw = descriptors.shape[1], descriptors.shape[2]
    tw = true_width if true_width is not None else w
    th = true_height if true_height is not None else h

    # Border suppression against the TRUE image extent.
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (
        (ys >= remove_borders)
        & (ys < th - remove_borders)
        & (xs >= remove_borders)
        & (xs < tw - remove_borders)
    )
    scores = jnp.where(border[None], scores, 0.0)

    flat = scores.reshape(b, h * w)
    # approx_max_k is the TPU-native top-k (hardware-binned); recall target
    # 0.99 on an NMS'd heatmap loses essentially nothing, and exact top_k's
    # full sort costs ~2.5 ms at H*W ~ 500k. (A 4x4 block-max pre-reduction
    # was tried and measured SLOWER: the block relayout / winner-position
    # recovery costs more than the saved top-k work.)
    top_scores, top_idx = jax.lax.approx_max_k(
        flat, max_keypoints, recall_target=0.99
    )
    yy = top_idx // w
    xx = top_idx % w
    valid = top_scores > keypoint_threshold

    # Nearest descriptor cell (8x downsample), clamped to the grid.
    cy = jnp.minimum(yy // CELL, gh - 1)
    cx = jnp.minimum(xx // CELL, gw - 1)
    cell = cy * gw + cx  # (B, K)
    if use_pallas:
        from ..ops.pallas.gather import gather_normalize

        desc = jnp.stack(
            [gather_normalize(descriptors[i], cell[i]) for i in range(b)]
        )
    else:
        grid = descriptors.reshape(b, gh * gw, -1).astype(jnp.float32)
        desc = jnp.take_along_axis(grid, cell[..., None], axis=1)  # (B, K, D)
        # Renormalize (bf16 grid rows are only approximately unit).
        desc = desc * jax.lax.rsqrt(
            jnp.sum(jnp.square(desc), axis=-1, keepdims=True) + 1e-12
        )
    desc = jnp.where(valid[..., None], desc, 0.0)

    kpts = jnp.stack([xx, yy], axis=-1).astype(jnp.float32)
    if raw_scores is not None:
        rflat = raw_scores.reshape(b, h * w)

        def nb(dy: int, dx: int) -> jnp.ndarray:
            yq = jnp.clip(yy + dy, 0, h - 1)
            xq = jnp.clip(xx + dx, 0, w - 1)
            return jnp.take_along_axis(rflat, yq * w + xq, axis=1)

        def para(sm: jnp.ndarray, s0: jnp.ndarray, sp: jnp.ndarray):
            # Vertex of the parabola through (-1, sm), (0, s0), (1, sp);
            # a peak has negative curvature, anything else keeps 0.
            denom = sm - 2.0 * s0 + sp
            safe = jnp.where(denom < -1e-9, denom, -1.0)
            off = jnp.where(denom < -1e-9, 0.5 * (sm - sp) / safe, 0.0)
            return jnp.clip(off, -0.5, 0.5)

        s0 = nb(0, 0)
        dx = para(nb(0, -1), s0, nb(0, 1))
        dy = para(nb(-1, 0), s0, nb(1, 0))
        off = jnp.stack([dx, dy], axis=-1) * valid[..., None]
        kpts = kpts + off
    return kpts, top_scores, valid, desc


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_keypoints",
        "keypoint_threshold",
        "remove_borders",
        "nms_radius",
        "true_width",
        "true_height",
        "subpixel",
    ),
)
def superpoint_extract(
    params: Params,
    image: jnp.ndarray,
    max_keypoints: int = 1024,
    keypoint_threshold: float = 0.005,
    remove_borders: int = 4,
    nms_radius: int = 4,
    true_width: int | None = None,
    true_height: int | None = None,
    subpixel: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full extraction: dense heads + on-device selection, one XLA program.

    image: (B, H, W) f32 in [0, 1]. The stereo path is simply B=2 — the
    reference's batched {2,1,H,W} enqueue (src/SuperPoint.cc:754-892) is the
    natural leading batch dimension here. subpixel=True adds the 3x3
    parabolic refinement (select_keypoints docstring); default off to stay
    output-identical to the reference extractor.
    """
    out = superpoint_dense(
        params, image, nms_radius=nms_radius, return_pre_nms=subpixel
    )
    scores, desc = out[0], out[1]
    return select_keypoints(
        scores,
        desc,
        max_keypoints,
        keypoint_threshold,
        remove_borders,
        true_width,
        true_height,
        raw_scores=out[2] if subpixel else None,
    )


# -- parameter init ---------------------------------------------------------

_SP_LAYERS = [
    ("conv1a", 1, 64),
    ("conv1b", 64, 64),
    ("conv2a", 64, 64),
    ("conv2b", 64, 64),
    ("conv3a", 64, 128),
    ("conv3b", 128, 128),
    ("conv4a", 128, 128),
    ("conv4b", 128, 128),
    ("convPa", 128, 256),
    ("convPb", 256, 65),
    ("convDa", 128, 256),
    ("convDb", 256, DESCRIPTOR_DIM),
]


def init_superpoint_params(seed: int = 0, dtype=jnp.float32) -> Params:
    """He-init random parameters (HWIO) for weight-free testing/benching."""
    rng = np.random.default_rng(seed)
    params: Params = {}
    for name, cin, cout in _SP_LAYERS:
        k = 1 if name in ("convPb", "convDb") else 3
        std = float(np.sqrt(2.0 / (k * k * cin)))
        params[f"{name}.weight"] = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)) * std, dtype
        )
        params[f"{name}.bias"] = jnp.zeros((cout,), dtype)
    return params
