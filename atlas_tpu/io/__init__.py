from .cache import cache_path, load_geometry, save_geometry

__all__ = ["cache_path", "load_geometry", "save_geometry"]
