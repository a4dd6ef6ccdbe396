"""Device-mesh construction and sharding rules.

The reference is a single-process single-GPU system (SURVEY §2's parallelism
table): it has no DP/TP/PP/SP/EP. On TPU the meaningful axes are:

- ``data``: multi-sequence batched tracking (BASELINE config 5) — pure data
  parallelism over independent image streams, and the batch axis of the
  self-supervised fine-tuning step in parallel.training.
- ``model``: tensor parallelism over LightGlue's FFN hidden dim and
  attention projections. The models are small (SuperPoint ~1.3M, LightGlue
  ~12M params) so TP is never required for memory — the axis exists to keep
  the sharding machinery real and exercised; XLA inserts the all-reduces
  over ICI.

Pipeline/sequence/expert parallelism are N/A at this model scale (documented
in SURVEY §2); the mesh is therefore 2-D.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_axis: int | None = None) -> Mesh:
    """A (data, model) mesh over the first n devices. model axis defaults to
    2 when the device count allows it, else 1."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh({n_devices}) needs {n} devices but the {devs[0].platform} "
            f"backend exposes only {len(devs)}; for a virtual mesh set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=<n> and "
            'jax.config.update("jax_platforms", "cpu") before backend init'
        )
    devs = devs[:n]
    if model_axis is None:
        model_axis = 2 if n % 2 == 0 and n >= 2 else 1
    data_axis = n // model_axis
    arr = np.array(devs[: data_axis * model_axis]).reshape(data_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


# name-suffix -> PartitionSpec rules for LightGlue parameters (weights are
# stored (in, out); shard the contracted or output dim on 'model').
_LG_RULES: list[tuple[str, P]] = [
    (".Wqkv.weight", P(None, "model")),
    (".Wqkv.bias", P("model")),
    (".out_proj.weight", P("model", None)),
    (".to_qk.weight", P(None, "model")),
    (".to_qk.bias", P("model")),
    (".to_v.weight", P(None, "model")),
    (".to_v.bias", P("model")),
    (".to_out.weight", P("model", None)),
    (".ffn.0.weight", P(None, "model")),
    (".ffn.0.bias", P("model")),
    (".ffn.3.weight", P("model", None)),
]


def lightglue_param_sharding(mesh: Mesh, params: dict) -> dict:
    """NamedShardings for a LightGlue param dict: TP on attention/FFN dims,
    replicated elsewhere."""
    out = {}
    for name in params:
        spec = P()
        for suffix, rule in _LG_RULES:
            if name.endswith(suffix):
                spec = rule
                break
        out[name] = NamedSharding(mesh, spec)
    return out


def data_sharding(mesh: Mesh, *batch_axes: int) -> NamedSharding:
    """Shard the leading batch dimension over 'data'."""
    spec = [None] * (max(batch_axes) + 1 if batch_axes else 1)
    spec[0] = "data"
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
