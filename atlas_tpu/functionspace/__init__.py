from .structured_columns import StructuredColumns, BlockStructuredColumns
from .node_columns import NodeColumns
from .spectral import Spectral
from .point_cloud import PointCloud

__all__ = [
    "StructuredColumns",
    "BlockStructuredColumns",
    "NodeColumns",
    "Spectral",
    "PointCloud",
]
