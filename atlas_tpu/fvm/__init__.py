from .method import FvmMethod
from .nabla import Nabla

__all__ = ["FvmMethod", "Nabla"]
