"""MultiField and MissingValue.

Reference: atlas field/MultiField.h:50-70 (several same-shape fields in ONE
contiguous array — IFS NPROMA-block style, creators "MultiFieldCreatorIFS" /
"Array") and field/MissingValue.h (missing-data semantics used by the
interpolation non-linear hooks).
"""

from __future__ import annotations

import numpy as np

from .field import Field


class MultiField:
    """Named views over one contiguous (nfields, ...) array."""

    def __init__(self, names: list[str], shape: tuple, dtype=np.float64):
        self.names = list(names)
        self.array = np.zeros((len(self.names),) + tuple(shape), dtype)
        self._index = {n: i for i, n in enumerate(self.names)}

    @classmethod
    def create_ifs(cls, names, nblk: int, nproma: int, nlev: int, dtype=np.float64):
        """IFS layout: (nblk, nfld, nlev, nproma) single allocation."""
        mf = cls.__new__(cls)
        mf.names = list(names)
        mf.array = np.zeros((nblk, len(names), nlev, nproma), dtype)
        mf._index = {n: i for i, n in enumerate(mf.names)}
        mf._ifs = True
        return mf

    def field(self, name: str) -> Field:
        i = self._index[name]
        data = self.array[:, i] if getattr(self, "_ifs", False) else self.array[i]
        return Field(name, data)

    def __getitem__(self, name: str):
        return self.field(name)

    def __len__(self):
        return len(self.names)


class MissingValue:
    """Missing-data predicate: NaN or sentinel (approximate or exact)."""

    def __init__(self, value=None, epsilon: float = 0.0, use_nan: bool = True):
        self.value = value
        self.epsilon = float(epsilon)
        self.use_nan = use_nan

    def __call__(self, data) -> np.ndarray:
        data = np.asarray(data)
        mask = np.zeros(data.shape, bool)
        if self.use_nan:
            mask |= np.isnan(data)
        if self.value is not None:
            if self.epsilon > 0:
                mask |= np.abs(data - self.value) <= self.epsilon
            else:
                mask |= data == self.value
        return mask

    def mask_interpolation_weights(self, idx, w, data):
        """Non-linear hook: zero weights on missing sources, renormalize
        (reference interpolation/nonlinear/Missing*)."""
        missing = self(data)[idx]
        w2 = np.where(missing, 0.0, w)
        norm = w2.sum(axis=1, keepdims=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            w2 = np.where(norm > 0, w2 / norm, 0.0)
        return w2
