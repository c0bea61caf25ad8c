"""Setup-product caching (reference: ATLAS_CACHE_PATH, trans/Cache.h,
interpolation/Cache.h — atlas caches Legendre tables, remap matrices and mesh
products on disk; SURVEY.md section 5.4).

Here: assembled FvmGeometry (and later Legendre/stencil/remap tensors) stored
as .npz keyed by grid uid + a format version.
"""

from __future__ import annotations

import os

import numpy as np

_FORMAT_VERSION = 2


def cache_path(kind: str, key: str) -> str:
    root = os.environ.get(
        "ATLAS_TPU_CACHE_PATH", os.path.join(os.path.expanduser("~"), ".cache", "atlas_tpu")
    )
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, f"{kind}-v{_FORMAT_VERSION}-{key}.npz")


def save_geometry(geom, path: str) -> None:
    arrays = {
        k: v
        for k, v in vars(geom).items()
        if isinstance(v, np.ndarray)
    }
    np.savez_compressed(
        path + ".tmp.npz",
        __scalars__=np.array([geom.nnodes, geom.nedges], dtype=np.int64),
        __radius__=np.array([geom.radius]),
        **arrays,
    )
    os.replace(path + ".tmp.npz", path)


def load_geometry(path: str):
    from ..fvm.method import FvmGeometry

    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            scalars = z["__scalars__"]
            radius = float(z["__radius__"][0])
            fields = {k: z[k] for k in z.files if not k.startswith("__")}
        return FvmGeometry(
            nnodes=int(scalars[0]), nedges=int(scalars[1]), radius=radius, **fields
        )
    except Exception:
        return None
