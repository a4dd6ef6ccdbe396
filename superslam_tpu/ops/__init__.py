from .frontend_step import PACK_ROWS, fused_stereo_step

__all__ = ["PACK_ROWS", "fused_stereo_step"]
