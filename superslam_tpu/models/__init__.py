from .eigenplaces import (
    eigenplaces_descriptor,
    init_eigenplaces_params,
    preprocess_image,
)
from .lightglue import (
    extract_matches,
    init_lightglue_params,
    lightglue_forward,
    lightglue_match,
    normalize_keypoints,
)
from .superpoint import (
    init_superpoint_params,
    select_keypoints,
    superpoint_dense,
    superpoint_extract,
)
from .weights import load_params, load_safetensors, load_torch_pth

__all__ = [
    "eigenplaces_descriptor",
    "init_eigenplaces_params",
    "preprocess_image",
    "extract_matches",
    "init_lightglue_params",
    "lightglue_forward",
    "lightglue_match",
    "normalize_keypoints",
    "init_superpoint_params",
    "select_keypoints",
    "superpoint_dense",
    "superpoint_extract",
    "load_params",
    "load_safetensors",
    "load_torch_pth",
]
