from .base import FunctionSpace
from .structured_columns import StructuredColumns, BlockStructuredColumns
from .node_columns import NodeColumns
from .cell_columns import CellColumns, EdgeColumns
from .spectral import Spectral
from .point_cloud import PointCloud
from .cubedsphere import CubedSphereColumns

__all__ = [
    "FunctionSpace",
    "StructuredColumns",
    "BlockStructuredColumns",
    "NodeColumns",
    "CellColumns",
    "EdgeColumns",
    "Spectral",
    "PointCloud",
    "CubedSphereColumns",
]
