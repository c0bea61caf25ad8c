"""atlas_tpu: a TPU-native framework for parallel NWP/climate data structures.

Built from scratch on JAX/XLA/Pallas with the capabilities of ECMWF's Atlas
(reference: /root/reference): global/regional grids, domain decomposition,
function spaces, halo exchange as sharded collectives, median-dual finite-volume
operators as TPU kernels, spherical-harmonic transforms as batched MXU matmuls,
and interpolation/remapping as vectorized stencil kernels.

Design stance (see SURVEY.md section 7):
 - Setup layer (grids, partitioners, mesh + dual-mesh, stencil and remap weight
   assembly) runs host-side once, vectorized, producing plain arrays.
 - Compute layer is pure jax: jit/shard_map kernels over those arrays.
 - Ragged (reduced-grid) structures are padded + masked; halo exchange is a
   static permute schedule.
"""

__version__ = "0.1.0"

from .util.config import Config
from .grid import Grid, StructuredGrid
from .grid.vertical import Vertical
from .field import Field, FieldSet, State

__all__ = [
    "Config",
    "Grid",
    "StructuredGrid",
    "Vertical",
    "Field",
    "FieldSet",
    "State",
    "__version__",
]
