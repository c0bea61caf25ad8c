from .config import Config
from .factory import Factory
from . import constants
from . import geometry
from .topology import Topology
from . import options

__all__ = ["Config", "Factory", "constants", "geometry", "Topology"]
