#!/usr/bin/env python
"""Export published SuperPoint / LightGlue / EigenPlaces checkpoints to the
safetensors files this framework loads (weights/*.safetensors).

Equivalent of the reference's model export pipeline
(``/root/reference/utils/convert_*_to_onnx.py`` + ``export_safetensors.py``)
minus the ONNX/TensorRT leg — JAX loads the torch state dicts directly via
superslam_tpu.models.weights (names preserved, layouts converted at load),
so "export" is just a state-dict -> safetensors dump.

Requires network access (torch.hub / github downloads); run offline-first
environments skip it and use random init.

Usage:
  python scripts/export_weights.py superpoint --weights superpoint_v1.pth
  python scripts/export_weights.py lightglue
  python scripts/export_weights.py eigenplaces
"""

from __future__ import annotations

import argparse
import os


def save_safetensors(state_dict, path: str) -> None:
    import numpy as np
    from safetensors.numpy import save_file

    flat = {}
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue
        flat[k] = np.ascontiguousarray(v.detach().cpu().numpy())
    save_file(flat, path)
    print(f"wrote {path} ({len(flat)} tensors)")


def export_superpoint(args) -> None:
    import torch

    state = torch.load(args.weights, map_location="cpu", weights_only=True)
    if isinstance(state, dict):
        state = state.get("model", state.get("state_dict", state))
    save_safetensors(state, os.path.join(args.out_dir, "superpoint_v1.safetensors"))


def export_lightglue(args) -> None:
    import torch

    url = "https://github.com/cvg/LightGlue/releases/download/v0.1_arxiv/superpoint_lightglue.pth"
    state = torch.hub.load_state_dict_from_url(url, map_location="cpu")
    save_safetensors(
        state, os.path.join(args.out_dir, "lightglue_superpoint.safetensors")
    )


def export_eigenplaces(args) -> None:
    import torch

    model = torch.hub.load(
        "gmberton/eigenplaces",
        "get_trained_model",
        backbone="ResNet18",
        fc_output_dim=512,
    )
    save_safetensors(
        model.state_dict(),
        os.path.join(args.out_dir, "eigenplaces_resnet18_512.safetensors"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=["superpoint", "lightglue", "eigenplaces"])
    ap.add_argument("--weights", default="weights/superpoint_v1.pth")
    ap.add_argument("--out-dir", default="weights")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    {"superpoint": export_superpoint, "lightglue": export_lightglue,
     "eigenplaces": export_eigenplaces}[args.model](args)


if __name__ == "__main__":
    main()
