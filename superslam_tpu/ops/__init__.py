from .frontend_step import PACK_ROWS, fused_stereo_step, fused_stereo_step_multi
from .retrieval import DeviceCosineIndex
from .rgbd_step import RGBD_PACK_ROWS, fused_rgbd_step
from .pose_solver import pose_only_lm
from .window_solver import build_reduced_system, solve_window, triangulate

__all__ = [
    "PACK_ROWS",
    "fused_stereo_step",
    "fused_stereo_step_multi",
    "DeviceCosineIndex",
    "RGBD_PACK_ROWS",
    "fused_rgbd_step",
    "pose_only_lm",
    "build_reduced_system",
    "solve_window",
    "triangulate",
]
