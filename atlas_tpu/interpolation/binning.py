"""Binning interpolation: high-resolution -> low-resolution aggregation.

Reference behavior: atlas interpolation/method/binning/Binning.cc:39 — the
binning matrix is the row-normalized TRANSPOSE of an ancillary interpolation
matrix built in the opposite direction (coarse -> fine) with a configurable
`scheme` (default structured-bicubic in the reference; any registered method
works here).  Each coarse box thus averages the fine points that the ancillary
scheme would have used to produce them, an approximately conservative
aggregation.
"""

from __future__ import annotations

import numpy as np

from ..util.config import Config
from .interpolation import Method, interpolation_factory


class Binning(Method):
    def __init__(self, config, source, target):
        scheme = Config(config.get("scheme", {"type": "structured-bilinear"}))
        from .interpolation import Interpolation

        # ancillary interpolation: target(coarse) -> source(fine)
        anc = Interpolation(scheme, target, source)
        nfine = len(anc.idx)  # = number of fine (source) points
        self.nsrc = nfine
        ncoarse = anc.nsrc  # = number of coarse (target) points

        # transpose the (nfine, k) product into per-coarse-row lists
        k = anc.idx.shape[1]
        rows = anc.idx.ravel()  # coarse index per entry
        cols = np.repeat(np.arange(nfine), k)  # fine index per entry
        vals = anc.w.ravel()
        keep = vals != 0.0
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
        order = np.argsort(rows, kind="stable")
        rows, cols, vals = rows[order], cols[order], vals[order]
        counts = np.bincount(rows, minlength=ncoarse)
        kmax = max(int(counts.max()), 1) if len(counts) else 1
        idx = np.zeros((ncoarse, kmax), dtype=np.int32)
        w = np.zeros((ncoarse, kmax))
        offs = np.concatenate([[0], np.cumsum(counts)])
        slot = np.arange(len(rows)) - offs[rows]
        idx[rows, slot] = cols
        w[rows, slot] = vals
        # row-normalize (reference normalizes so each coarse value is a
        # weighted average of fine values)
        s = w.sum(axis=1, keepdims=True)
        self.w = np.divide(w, s, out=np.zeros_like(w), where=s != 0)
        self.idx = idx


@interpolation_factory.register("binning")
def _binning(config, source, target):
    return Binning(config, source, target)
