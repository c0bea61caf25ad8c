"""Record file format: named arrays + metadata in one self-describing file.

Reference behavior: atlas_io RecordWriter/RecordReader (atlas_io/src/atlas_io)
— a GRIB-like record container for arbitrary arrays and metadata used for
caches and mesh/field serialization, with lazy per-item reads.

Format here: a JSON index (name -> {dtype, shape, offset, nbytes, metadata})
followed by raw little-endian array payloads, 64-byte aligned. Items can be
read individually without loading the whole file (memory-mapped).
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

_MAGIC = b"ATPURECO"
_VERSION = 1
_ALIGN = 64


class RecordWriter:
    def __init__(self):
        self._items: dict[str, tuple[np.ndarray, dict]] = {}

    def set(self, name: str, array: np.ndarray, metadata: dict | None = None):
        self._items[name] = (np.ascontiguousarray(array), dict(metadata or {}))
        return self

    def write(self, path: str):
        index = {}
        offset = 0
        payloads = []
        for name, (arr, meta) in self._items.items():
            pad = (-offset) % _ALIGN
            offset += pad
            payloads.append((pad, arr))
            index[name] = {
                "dtype": arr.dtype.str,
                "shape": list(arr.shape),
                "offset": offset,
                "nbytes": arr.nbytes,
                "metadata": meta,
            }
            offset += arr.nbytes
        index_bytes = json.dumps(index).encode()
        with open(path + ".tmp", "wb") as f:
            f.write(_MAGIC)
            f.write(struct.pack("<II", _VERSION, len(index_bytes)))
            f.write(index_bytes)
            data_start = f.tell()
            pad0 = (-data_start) % _ALIGN
            f.write(b"\0" * pad0)
            for pad, arr in payloads:
                f.write(b"\0" * pad)
                f.write(arr.tobytes())
        os.replace(path + ".tmp", path)


class RecordReader:
    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            magic = f.read(8)
            if magic != _MAGIC:
                raise ValueError(f"{path} is not an atlas_tpu record file")
            version, index_len = struct.unpack("<II", f.read(8))
            if version != _VERSION:
                raise ValueError(f"unsupported record version {version}")
            self.index = json.loads(f.read(index_len).decode())
            data_start = f.tell()
            self._data_offset = data_start + ((-data_start) % _ALIGN)

    def keys(self):
        return list(self.index)

    def metadata(self, name: str) -> dict:
        return self.index[name]["metadata"]

    def read(self, name: str) -> np.ndarray:
        item = self.index[name]
        mm = np.memmap(
            self.path,
            dtype=np.dtype(item["dtype"]),
            mode="r",
            offset=self._data_offset + item["offset"],
            shape=tuple(item["shape"]),
        )
        return np.array(mm)  # materialize (file handle freed)

    def read_all(self) -> dict:
        return {k: self.read(k) for k in self.index}
