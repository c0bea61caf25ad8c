"""Order-independent, bit-reproducible field checksum.

Reference behavior: atlas parallel/Checksum.h + util/Checksum.cc — a global
checksum of a distributed field that is identical for any rank/thread count
(asserted by atlas-benchmark.cc:25-28).

Implementation: reinterpret the float payload as uint64 and reduce with
wrapping integer addition — exactly associative/commutative, so any partition
or summation order yields the same digits.
"""

from __future__ import annotations

import numpy as np


def checksum(data) -> str:
    arr = np.ascontiguousarray(np.asarray(data))
    if arr.dtype.kind == "f":
        if arr.dtype.itemsize == 8:
            bits = arr.view(np.uint64)
        else:
            bits = arr.astype(np.float32).view(np.uint32).astype(np.uint64)
    else:
        bits = arr.astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        total = np.bitwise_xor.reduce(bits.ravel() * np.uint64(0x9E3779B97F4A7C15)) \
            + np.uint64(bits.size)
    return f"{int(total):016x}"
