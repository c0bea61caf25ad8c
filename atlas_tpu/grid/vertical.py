"""Vertical coordinate (reference: atlas grid/Vertical.h:23-43).

z-levels normalized to [0, 1] by default; k ranges over [0, nlev).
"""

from __future__ import annotations

import numpy as np


class Vertical:
    def __init__(self, nlev: int | None = None, z: np.ndarray | None = None):
        if z is not None:
            self.z = np.asarray(z, dtype=np.float64)
            self.nlev = len(self.z)
        elif nlev is not None:
            self.nlev = int(nlev)
            self.z = (
                np.linspace(0.0, 1.0, self.nlev) if self.nlev > 1 else np.zeros(max(self.nlev, 1))
            )[: self.nlev]
        else:
            self.nlev = 0
            self.z = np.zeros(0)

    def __len__(self):
        return self.nlev

    def __getitem__(self, k):
        return self.z[k]

    @property
    def min(self):
        return float(self.z.min()) if self.nlev else 0.0

    @property
    def max(self):
        return float(self.z.max()) if self.nlev else 1.0

    def __repr__(self):
        return f"Vertical(nlev={self.nlev})"
