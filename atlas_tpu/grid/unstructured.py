"""Unstructured grid: an explicit list of points.

Reference: atlas grid/detail/grid/Unstructured.cc:243.
"""

from __future__ import annotations

import hashlib

import numpy as np


class UnstructuredGrid:
    def __init__(self, lonlat: np.ndarray, name: str = "unstructured"):
        self._lonlat = np.asarray(lonlat, dtype=np.float64).reshape(-1, 2)
        self._name = name

    @property
    def name(self):
        return self._name

    @property
    def size(self):
        return len(self._lonlat)

    def __len__(self):
        return self.size

    def lonlat(self) -> np.ndarray:
        return self._lonlat

    def xy(self) -> np.ndarray:
        return self._lonlat

    def uid(self) -> str:
        h = hashlib.md5()
        h.update(self._lonlat.tobytes())
        return h.hexdigest()

    def __repr__(self):
        return f"UnstructuredGrid(size={self.size})"
