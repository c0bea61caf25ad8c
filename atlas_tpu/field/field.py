"""Field / FieldSet / State (reference: atlas field/Field.h:49-64,
field/FieldSet.h, field/State.h).

A Field wraps an array (numpy or jax) with a name, metadata, an optional
function space, and the levels/variables structure. The dual host/device
mirror + dirty-flag machinery of the reference (array/ArrayDataStore.h:45-77)
is subsumed by jax unified arrays (SURVEY.md section 2.2 note); `dirty` here
tracks only the halo state like field/detail/FieldImpl.h.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional

import numpy as np


class Field:
    def __init__(
        self,
        name: str,
        data,
        functionspace=None,
        levels: int | None = None,
        variables: int | None = None,
        metadata: Optional[Dict[str, Any]] = None,
    ):
        self.name = name
        self.data = data
        self.functionspace = functionspace
        self.levels = levels
        self.variables = variables
        self.metadata = dict(metadata or {})
        self._dirty = True

    # -- array-like ------------------------------------------------------
    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def size(self):
        return int(np.prod(self.data.shape))

    def __array__(self, dtype=None):
        arr = np.asarray(self.data)
        return arr.astype(dtype) if dtype else arr

    def __getitem__(self, k):
        return self.data[k]

    @property
    def rank(self):
        return self.data.ndim

    # -- halo state ------------------------------------------------------
    @property
    def dirty(self) -> bool:
        return self._dirty

    def set_dirty(self, value: bool = True):
        self._dirty = value
        return self

    def halo_exchange(self):
        if self.functionspace is None:
            raise ValueError(f"field {self.name!r} has no function space")
        self.data = self.functionspace.halo_exchange(self.data)
        self._dirty = False
        return self

    def clone(self, name: str | None = None) -> "Field":
        data = np.array(self.data, copy=True) if isinstance(self.data, np.ndarray) else self.data
        return Field(
            name or self.name,
            data,
            self.functionspace,
            self.levels,
            self.variables,
            dict(self.metadata),
        )

    def __repr__(self):
        return f"Field({self.name!r}, shape={tuple(self.shape)}, dtype={self.dtype})"


class FieldSet:
    """Ordered, named collection of fields."""

    def __init__(self, fields=()):
        self._fields: list[Field] = []
        self._index: Dict[str, int] = {}
        for f in fields:
            self.add(f)

    def add(self, field: Field) -> Field:
        if field.name in self._index:
            raise KeyError(f"FieldSet already has a field {field.name!r}")
        self._index[field.name] = len(self._fields)
        self._fields.append(field)
        return field

    def has(self, name: str) -> bool:
        return name in self._index

    def field_names(self):
        return [f.name for f in self._fields]

    def __getitem__(self, key) -> Field:
        if isinstance(key, str):
            return self._fields[self._index[key]]
        return self._fields[key]

    def __len__(self):
        return len(self._fields)

    def __iter__(self) -> Iterator[Field]:
        return iter(self._fields)

    def halo_exchange(self):
        for f in self._fields:
            f.halo_exchange()
        return self

    def set_dirty(self, value: bool = True):
        for f in self._fields:
            f.set_dirty(value)
        return self


class State:
    """Fields + metadata container (reference: field/State.h)."""

    def __init__(self):
        self.fields = FieldSet()
        self.metadata: Dict[str, Any] = {}

    def add(self, field: Field) -> Field:
        return self.fields.add(field)

    def __getitem__(self, name: str) -> Field:
        return self.fields[name]
