from .legendre import legendre_polynomials, spectral_index, nspec2
from .trans_local import TransLocal
from .vordiv import VorDivToUV

__all__ = ["TransLocal", "VorDivToUV", "legendre_polynomials", "spectral_index", "nspec2"]
