from .gmsh import GmshWriter, write_gmsh
from .pointcloud_io import read_pointcloud, write_pointcloud

__all__ = ["GmshWriter", "write_gmsh", "read_pointcloud", "write_pointcloud"]
