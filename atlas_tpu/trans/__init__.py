from .legendre import legendre_polynomials, spectral_index, nspec2
from .trans_local import TransLocal

__all__ = ["TransLocal", "legendre_polynomials", "spectral_index", "nspec2"]
