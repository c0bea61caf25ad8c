from .legendre import legendre_polynomials, spectral_index, nspec2
from .trans_local import LegendreCacheCreator, TransLocal
from .dist import SpectralDistribution, TransDistributed
from .vordiv import VorDivToUV
from .facade import Trans, trans_factory

__all__ = [
    "Trans",
    "trans_factory",
    "TransLocal",
    "LegendreCacheCreator",
    "TransDistributed",
    "SpectralDistribution",
    "VorDivToUV",
    "legendre_polynomials",
    "spectral_index",
    "nspec2",
]
