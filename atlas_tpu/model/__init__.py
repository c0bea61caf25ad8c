from .shallow_water import ShallowWaterModel

__all__ = ["ShallowWaterModel"]
