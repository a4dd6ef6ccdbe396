"""On-TPU model (pre)training.

The reference ships only published checkpoints (SURVEY §2 #25 — export
scripts, no training). Zero-egress deployments cannot fetch those, so this
package makes the framework self-bootstrapping: a MagicPoint-style synthetic
-shapes pretraining pipeline for SuperPoint (detector cross-entropy +
homographic-warp descriptor hinge loss, after "SuperPoint: Self-Supervised
Interest Point Detection and Description", DeTone et al.) and harvested-
correspondence fine-tuning for LightGlue (parallel.training). The resulting
checkpoints drive the full SLAM stack on rendered synthetic worlds with
ground-truth trajectories — the accuracy axis, demonstrated end to end
without any downloaded artifact.
"""

from .synthetic_shapes import (  # noqa: F401
    corners_to_labels,
    render_shapes,
    sample_homography,
    training_batch,
    training_pair,
    warp_points,
)
from .superpoint_train import (  # noqa: F401
    detection_prf,
    make_sp_optimizer,
    sp_loss,
    sp_train_step,
)
