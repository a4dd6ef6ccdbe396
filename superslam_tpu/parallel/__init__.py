from .batched_tracking import batched_stereo_frontend
from .mesh import (
    data_sharding,
    lightglue_param_sharding,
    make_mesh,
    replicate,
)
from .training import (
    make_optimizer,
    matching_loss,
    synthetic_matching_batch,
    train_step,
)

__all__ = [
    "batched_stereo_frontend",
    "data_sharding",
    "lightglue_param_sharding",
    "make_mesh",
    "replicate",
    "make_optimizer",
    "matching_loss",
    "synthetic_matching_batch",
    "train_step",
]
