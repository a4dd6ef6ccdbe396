"""EigenPlaces place-recognition embedding (ResNet18 -> GeM -> 512-d).

Reimplements the model the reference runs via TensorRT
(``/root/reference/src/EigenPlaces.cc:123-174``; export in
``utils/convert_eigenplaces_to_onnx.py``): a ResNet18 backbone (no
avgpool/fc) followed by the EigenPlaces aggregation head — L2Norm -> GeM
pooling -> Flatten -> Linear(512, fc_dim) -> L2Norm — on an ImageNet-
normalized 512x512 RGB input, producing one L2-normalized global descriptor.

TPU-first: NHWC, bfloat16 convs, BN folded to inference scale/shift from the
running statistics. Parameter names mirror the torch.hub state dict
(``backbone.conv1.weight``, ``backbone.layer1.0.conv1.weight``,
``aggregation.3.weight``...) so the published EigenPlaces weights load
without renaming.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

# ResNet18 stage plan: (name, blocks, out_channels, first_stride)
_STAGES = [("layer1", 2, 64, 1), ("layer2", 2, 128, 2), ("layer3", 2, 256, 2), ("layer4", 2, 512, 2)]


def _conv(x, params, name, stride, dtype):
    w = params[f"{name}.weight"].astype(dtype)  # HWIO
    # Explicit symmetric k//2 padding: torch semantics. XLA "SAME" pads
    # asymmetrically for strided convs and would shift the whole network.
    p = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        w,
        window_strides=(stride, stride),
        padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, params, name, dtype):
    """Inference batch norm from running stats: scale/shift precomputable."""
    g = params[f"{name}.weight"].astype(jnp.float32)
    b = params[f"{name}.bias"].astype(jnp.float32)
    mean = params[f"{name}.running_mean"].astype(jnp.float32)
    var = params[f"{name}.running_var"].astype(jnp.float32)
    scale = g * jax.lax.rsqrt(var + 1e-5)
    return (x.astype(jnp.float32) * scale + (b - mean * scale)).astype(dtype)


def _basic_block(x, params, name, stride, dtype):
    out = _conv(x, params, f"{name}.conv1", stride, dtype)
    out = jax.nn.relu(_bn(out, params, f"{name}.bn1", dtype))
    out = _conv(out, params, f"{name}.conv2", 1, dtype)
    out = _bn(out, params, f"{name}.bn2", dtype)
    if f"{name}.downsample.0.weight" in params:
        x = _conv(x, params, f"{name}.downsample.0", stride, dtype)
        x = _bn(x, params, f"{name}.downsample.1", dtype)
    return jax.nn.relu(out + x)


def resnet18_features(params: Params, image: jnp.ndarray, dtype=jnp.bfloat16):
    """(B, H, W, 3) normalized RGB -> (B, H/32, W/32, 512) feature map."""
    x = _conv(image, params, "backbone.conv1", 2, dtype)  # 7x7 s2
    x = jax.nn.relu(_bn(x, params, "backbone.bn1", dtype))
    x = jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),  # torch maxpool(3, 2, padding=1)
    )
    for stage, blocks, _, first_stride in _STAGES:
        for b in range(blocks):
            x = _basic_block(
                x,
                params,
                f"backbone.{stage}.{b}",
                first_stride if b == 0 else 1,
                dtype,
            )
    return x


@functools.partial(jax.jit, static_argnames=())
def eigenplaces_descriptor(params: Params, image: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) ImageNet-normalized RGB -> (B, Dg) L2-normalized
    global descriptor. Aggregation: L2Norm -> GeM(p) -> Linear -> L2Norm."""
    feat = resnet18_features(params, image).astype(jnp.float32)
    # aggregation.0: channel L2 norm at each spatial location.
    feat = feat * jax.lax.rsqrt(
        jnp.sum(jnp.square(feat), axis=-1, keepdims=True) + 1e-12
    )
    # aggregation.1: GeM pooling over space, learnable exponent p.
    p = params["aggregation.1.p"].astype(jnp.float32).reshape(())
    pooled = jnp.mean(jnp.clip(feat, 1e-6, None) ** p, axis=(1, 2)) ** (1.0 / p)
    # aggregation.3: Linear(512 -> Dg); weights stored (in, out).
    out = pooled @ params["aggregation.3.weight"].astype(jnp.float32)
    out = out + params["aggregation.3.bias"].astype(jnp.float32)
    # aggregation.4: final L2 norm.
    return out * jax.lax.rsqrt(
        jnp.sum(jnp.square(out), axis=-1, keepdims=True) + 1e-12
    )


@functools.partial(
    jax.jit, static_argnames=("true_height", "true_width", "size")
)
def eigenplaces_descriptor_from_device_gray(
    params: Params,
    gray_u8: jnp.ndarray,  # (H, W) uint8, device-resident (may be padded)
    true_height: int,
    true_width: int,
    size: int = 512,
) -> jnp.ndarray:
    """Global descriptor straight from a device-resident tracking frame.

    The reference (and the host path) re-uploads a host-preprocessed
    (1, size, size, 3) f32 image per keyframe (src/EigenPlaces.cc:123-143,
    ~3 MB over this host link); here the fused front-end's own uint8 upload
    is reused: slice off padding, scale, bilinear-resize, replicate gray to
    RGB and ImageNet-normalize ON DEVICE, then the ResNet18+GeM forward.
    Matches preprocess_image + eigenplaces_descriptor to resize precision.
    Returns (Dg,) L2-normalized f32.
    """
    img = gray_u8[:true_height, :true_width].astype(jnp.float32) / 255.0
    img = jax.image.resize(img, (size, size), method="bilinear")
    img = jnp.stack([img] * 3, axis=-1)
    img = (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return eigenplaces_descriptor(params, img[None])[0]


def _bn_batch(x, params, name, dtype, stats: dict):
    """Train-mode batch norm: normalize by THIS batch's statistics and
    record them in ``stats`` (the caller EMAs them into the running stats
    that the inference forward (_bn) consumes — standard torch semantics,
    expressed functionally: the stats ride the returned pytree instead of
    being module state)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.var(xf, axis=(0, 1, 2))
    stats[f"{name}.running_mean"] = mean
    stats[f"{name}.running_var"] = var
    g = params[f"{name}.weight"].astype(jnp.float32)
    b = params[f"{name}.bias"].astype(jnp.float32)
    scale = g * jax.lax.rsqrt(var + 1e-5)
    return (xf * scale + (b - mean * scale)).astype(dtype)


def _basic_block_train(x, params, name, stride, dtype, stats):
    out = _conv(x, params, f"{name}.conv1", stride, dtype)
    out = jax.nn.relu(_bn_batch(out, params, f"{name}.bn1", dtype, stats))
    out = _conv(out, params, f"{name}.conv2", 1, dtype)
    out = _bn_batch(out, params, f"{name}.bn2", dtype, stats)
    if f"{name}.downsample.0.weight" in params:
        x = _conv(x, params, f"{name}.downsample.0", stride, dtype)
        x = _bn_batch(x, params, f"{name}.downsample.1", dtype, stats)
    return jax.nn.relu(out + x)


def eigenplaces_descriptor_train(
    params: Params, image: jnp.ndarray, dtype=jnp.bfloat16
) -> tuple[jnp.ndarray, dict]:
    """Training forward (scripts/train_eigenplaces.py): identical math to
    ``eigenplaces_descriptor`` except batch norm uses batch statistics.
    Returns (L2-normalized descriptors, {bn running-stat name: batch stat})
    so the trainer can EMA the stats the inference forward will use."""
    stats: dict = {}
    x = _conv(image, params, "backbone.conv1", 2, dtype)
    x = jax.nn.relu(_bn_batch(x, params, "backbone.bn1", dtype, stats))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for stage, blocks, _, first_stride in _STAGES:
        for b in range(blocks):
            x = _basic_block_train(
                x, params, f"backbone.{stage}.{b}",
                first_stride if b == 0 else 1, dtype, stats,
            )
    feat = x.astype(jnp.float32)
    feat = feat * jax.lax.rsqrt(
        jnp.sum(jnp.square(feat), axis=-1, keepdims=True) + 1e-12
    )
    p = params["aggregation.1.p"].astype(jnp.float32).reshape(())
    pooled = jnp.mean(jnp.clip(feat, 1e-6, None) ** p, axis=(1, 2)) ** (1.0 / p)
    out = pooled @ params["aggregation.3.weight"].astype(jnp.float32)
    out = out + params["aggregation.3.bias"].astype(jnp.float32)
    desc = out * jax.lax.rsqrt(
        jnp.sum(jnp.square(out), axis=-1, keepdims=True) + 1e-12
    )
    return desc, stats


def preprocess_image(image: np.ndarray, size: int = 512) -> np.ndarray:
    """Gray/BGR uint8 or float -> (1, size, size, 3) ImageNet-normalized RGB.

    Mirrors the reference preprocessing (src/EigenPlaces.cc:123-143): gray is
    replicated to 3 channels; BGR is flipped to RGB; bilinear resize.
    """
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    else:
        img = img.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    elif img.shape[-1] == 3:
        img = img[..., ::-1]  # BGR -> RGB (reference convention)
    if img.shape[0] != size or img.shape[1] != size:
        img = np.asarray(
            jax.image.resize(jnp.asarray(img), (size, size, 3), method="bilinear")
        )
    img = (img - IMAGENET_MEAN) / IMAGENET_STD
    return img[None]


# -- parameter init -----------------------------------------------------------


def init_eigenplaces_params(seed: int = 0, fc_dim: int = 512, dtype=jnp.float32) -> Params:
    rng = np.random.default_rng(seed)
    params: Params = {}

    def conv(name, cin, cout, k):
        std = float(np.sqrt(2.0 / (k * k * cin)))
        params[f"{name}.weight"] = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)) * std, dtype
        )

    def bn(name, c):
        params[f"{name}.weight"] = jnp.ones((c,), dtype)
        params[f"{name}.bias"] = jnp.zeros((c,), dtype)
        params[f"{name}.running_mean"] = jnp.zeros((c,), dtype)
        params[f"{name}.running_var"] = jnp.ones((c,), dtype)

    conv("backbone.conv1", 3, 64, 7)
    bn("backbone.bn1", 64)
    cin = 64
    for stage, blocks, cout, first_stride in _STAGES:
        for b in range(blocks):
            name = f"backbone.{stage}.{b}"
            stride = first_stride if b == 0 else 1
            conv(f"{name}.conv1", cin if b == 0 else cout, cout, 3)
            bn(f"{name}.bn1", cout)
            conv(f"{name}.conv2", cout, cout, 3)
            bn(f"{name}.bn2", cout)
            if b == 0 and (stride != 1 or cin != cout):
                conv(f"{name}.downsample.0", cin, cout, 1)
                bn(f"{name}.downsample.1", cout)
        cin = cout
    params["aggregation.1.p"] = jnp.asarray(3.0, dtype)
    params["aggregation.3.weight"] = jnp.asarray(
        rng.standard_normal((512, fc_dim)) * np.sqrt(1.0 / 512), dtype
    )
    params["aggregation.3.bias"] = jnp.zeros((fc_dim,), dtype)
    return params
