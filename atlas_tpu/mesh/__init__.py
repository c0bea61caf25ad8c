from .mesh import Mesh
from .structured import StructuredMeshGenerator, generate_mesh
from .generator import MeshGenerator, meshgenerator_factory
from .edges import build_edges, build_node_to_edge_connectivity
from .dual import build_median_dual_mesh

__all__ = [
    "Mesh",
    "StructuredMeshGenerator",
    "MeshGenerator",
    "meshgenerator_factory",
    "generate_mesh",
    "build_edges",
    "build_node_to_edge_connectivity",
    "build_median_dual_mesh",
]
