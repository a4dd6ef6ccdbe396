from .gather import gather_normalize

__all__ = ["gather_normalize"]
