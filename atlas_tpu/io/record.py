"""Record file format: named arrays + metadata in one self-describing file.

Reference behavior: atlas_io RecordWriter/RecordReader (atlas_io/src/atlas_io)
— a GRIB-like record container for arbitrary arrays and metadata used for
caches and mesh/field serialization, with lazy per-item reads, per-item
compression, endianness handling, and reader Sessions.

Format here: a JSON index (name -> {dtype, shape, offset, nbytes,
compression, metadata}) followed by array payloads, 64-byte aligned.
Uncompressed items are stored little-endian raw (memory-mappable); compressed
items are zlib streams. Items are read individually without loading the whole
file. Big-endian input arrays are byteswapped to little-endian on write and
arrays are always returned in NATIVE byte order on read.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

import numpy as np

_MAGIC = b"ATPURECO"
_VERSION = 2
_ALIGN = 64


def _to_le(arr: np.ndarray) -> np.ndarray:
    """Contiguous little-endian view/copy of an array."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype.byteorder == ">":
        arr = arr.astype(arr.dtype.newbyteorder("<"))
    return arr


class RecordWriter:
    def __init__(self, compression: str | None = None):
        """compression: None or "zlib" (default for items without an
        explicit per-item setting; reference atlas_io compression option)."""
        if compression not in (None, "zlib"):
            raise ValueError(f"unknown compression {compression!r}")
        self.compression = compression
        self._items: dict[str, tuple[np.ndarray, dict, str | None]] = {}

    def set(self, name: str, array: np.ndarray,
            metadata: dict | None = None, compression: str | None = "default"):
        comp = self.compression if compression == "default" else compression
        if comp not in (None, "zlib"):
            raise ValueError(f"unknown compression {comp!r}")
        self._items[name] = (_to_le(np.asarray(array)),
                             dict(metadata or {}), comp)
        return self

    def write(self, path: str):
        index = {}
        offset = 0
        payloads = []
        for name, (arr, meta, comp) in self._items.items():
            raw = arr.tobytes()
            payload = zlib.compress(raw) if comp == "zlib" else raw
            pad = (-offset) % _ALIGN
            offset += pad
            payloads.append((pad, payload))
            index[name] = {
                "dtype": arr.dtype.newbyteorder("<").str,
                "shape": list(arr.shape),
                "offset": offset,
                "nbytes": len(payload),
                "raw_nbytes": arr.nbytes,
                "compression": comp,
                "metadata": meta,
            }
            offset += len(payload)
        index_bytes = json.dumps(index).encode()
        with open(path + ".tmp", "wb") as f:
            f.write(_MAGIC)
            f.write(struct.pack("<II", _VERSION, len(index_bytes)))
            f.write(index_bytes)
            data_start = f.tell()
            pad0 = (-data_start) % _ALIGN
            f.write(b"\0" * pad0)
            for pad, payload in payloads:
                f.write(b"\0" * pad)
                f.write(payload)
        os.replace(path + ".tmp", path)


class RecordReader:
    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            magic = f.read(8)
            if magic != _MAGIC:
                raise ValueError(f"{path} is not an atlas_tpu record file")
            version, index_len = struct.unpack("<II", f.read(8))
            if version not in (1, 2):
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
        dtype = np.dtype(item["dtype"])
        shape = tuple(item["shape"])
        if item.get("compression") == "zlib":
            with open(self.path, "rb") as f:
                f.seek(self._data_offset + item["offset"])
                raw = zlib.decompress(f.read(item["nbytes"]))
            arr = np.frombuffer(raw, dtype=dtype).reshape(shape).copy()
        else:
            mm = np.memmap(
                self.path, dtype=dtype, mode="r",
                offset=self._data_offset + item["offset"], shape=shape)
            arr = np.array(mm)  # materialize (file handle freed)
        if arr.dtype.byteorder == ">":  # always return native order
            arr = arr.astype(arr.dtype.newbyteorder("="))
        return arr

    def read_all(self) -> dict:
        return {k: self.read(k) for k in self.index}


class Session:
    """Reader cache: repeated reads of the same record file share one parsed
    index (reference atlas_io sessions keep records open across accesses).
    Usable as a context manager."""

    def __init__(self):
        self._readers: dict[str, RecordReader] = {}

    def record(self, path: str) -> RecordReader:
        key = os.path.abspath(path)
        if key not in self._readers:
            self._readers[key] = RecordReader(key)
        return self._readers[key]

    def read(self, path: str, name: str) -> np.ndarray:
        return self.record(path).read(name)

    def close(self):
        self._readers.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
