"""superslam_tpu — a TPU-native (JAX/XLA/Pallas) stereo + RGB-D visual SLAM
framework with the capabilities of SuperSLAM (reference mounted at
/root/reference; see SURVEY.md for the component map).

Layering (bottom-up):
  geometry/  SE(3) + stereo camera (host numpy; JAX mirrors in ops/)
  ops/       on-device programs: keypoint select, matching, retrieval, Pallas
  models/    SuperPoint / LightGlue / EigenPlaces as pure-JAX functions
  frontend/  extractor + matcher backends, stereo/RGB-D front-ends
  core/      device-free estimation core (tracker, smoother, pose graph, loop)
  parallel/  device-mesh sharding + multi-sequence batched tracking + training
  io/, eval/ datasets, trajectory writers, ATE/RPE metrics
  slam.py    the SuperSLAM facade (the one object users construct)
"""

__version__ = "0.1.0"

from .core import VoEstimator  # noqa: F401
from .geometry import Pose3, StereoCalib  # noqa: F401


def __getattr__(name):
    # Lazy: `from superslam_tpu import SuperSLAM` without forcing jax (and
    # the device runtime) on import of the device-free core.
    if name == "SuperSLAM":
        from .slam import SuperSLAM

        return SuperSLAM
    raise AttributeError(name)
