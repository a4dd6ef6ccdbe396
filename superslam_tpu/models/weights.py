"""Checkpoint loading: safetensors / torch .pth -> flat JAX param dicts.

The reference ships weights as torch state dicts and safetensors
(``/root/reference/utils/export_safetensors.py``); our models keep the torch
parameter NAMES but use TPU-friendly LAYOUTS, so loading is one generic
layout rule applied uniformly:

- 4-D conv kernels:   OIHW  -> HWIO   (transpose 2,3,1,0)
- 2-D linear weights: (out,in) -> (in,out)
- 1-D / scalar tensors (biases, norms, GeM p): unchanged
- ``num_batches_tracked`` counters: dropped

No pretrained weights are bundled in this environment; every model has a
deterministic random ``init_*_params`` fallback, and ``load_params``
gracefully returns the fallback when the checkpoint is absent.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from ..utils.logging import get_logger

Params = dict[str, Any]


def convert_torch_layout(name: str, arr: np.ndarray) -> np.ndarray | None:
    if name.endswith("num_batches_tracked"):
        return None
    if arr.ndim == 4:
        return np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
    if arr.ndim == 2:
        return np.transpose(arr, (1, 0))  # (out,in) -> (in,out)
    return arr


def load_safetensors(path: str, dtype=jnp.float32) -> Params:
    """Load a safetensors checkpoint into a flat JAX param dict."""
    from safetensors import safe_open

    params: Params = {}
    with safe_open(path, framework="numpy") as f:
        for name in f.keys():
            arr = convert_torch_layout(name, np.asarray(f.get_tensor(name)))
            if arr is not None:
                params[name] = jnp.asarray(arr, dtype)
    return params


def load_torch_pth(path: str, dtype=jnp.float32) -> Params:
    """Load a torch .pth state dict (CPU) into a flat JAX param dict."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict):
        state = state.get("model", state.get("state_dict", state))
    params: Params = {}
    for name, tensor in state.items():
        arr = convert_torch_layout(name, tensor.detach().numpy())
        if arr is not None:
            params[name] = jnp.asarray(arr, dtype)
    return params


def save_params_torch_layout(
    params: Params, path: str, dtype: np.dtype = np.float16
) -> None:
    """Inverse of the load-time layout rule: write a flat param dict as a
    torch-layout safetensors checkpoint (HWIO -> OIHW, (in,out) -> (out,in))
    so our own trained checkpoints (train/) round-trip through the exact
    production ``load_params`` path a published torch state dict would."""
    from safetensors.numpy import save_file

    flat: dict[str, np.ndarray] = {}
    for name, arr in params.items():
        a = np.asarray(arr)
        if a.ndim == 4:
            a = np.transpose(a, (3, 2, 0, 1))  # HWIO -> OIHW
        elif a.ndim == 2:
            a = np.transpose(a, (1, 0))
        flat[name] = np.ascontiguousarray(a.astype(dtype))
    save_file(flat, path)


def load_params(
    path: str | None,
    fallback: Callable[[], Params],
    dtype=jnp.float32,
) -> Params:
    """Load from `path` (safetensors or .pth by extension); fall back to a
    random init when missing — the framework stays runnable weight-free."""
    if path and os.path.exists(path):
        if path.endswith(".safetensors"):
            return load_safetensors(path, dtype)
        return load_torch_pth(path, dtype)
    if path:
        get_logger().warning(
            "weights not found at %s; using random initialization", path
        )
    return fallback()
