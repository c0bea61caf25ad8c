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


def save_shifts(shifts, path: str) -> None:
    """Persist a StructuredFvm _Shifts product as a raw .npy directory —
    mmap'd on load (zlib on the O1280 tables costs tens of seconds per
    round-trip; reference mmaps its setup caches, trans/Cache.h)."""
    arrays = {"__meta__": np.array(
        [shifts.ny, shifts.nxw, shifts.L], dtype=np.int64)}
    for name in ("S_total_regular", "S_total_pole", "metric_x", "metric_y",
                 "cos_lat", "inv_cos", "mask", "halo_rows", "halo_dst",
                 "halo_src", "col_of_point", "row_of_point"):
        arrays[name] = getattr(shifts, name)
    for kind, d in (("reg", shifts.keys_regular), ("pole", shifts.keys_pole)):
        for (dj, dc), S in d.items():
            arrays[f"key_{kind}_{dj}_{dc}"] = S
    save_packed(path + ".d", arrays)


def load_shifts(path: str):
    from ..fvm.structured import _Shifts

    z = load_packed(path + ".d")
    legacy = None
    if z is None:
        if not os.path.exists(path):  # legacy compressed cache
            return None
        try:
            legacy = np.load(path)
            z = {name: legacy[name] for name in legacy.files}
        except Exception:
            return None
    try:
        meta = z["__meta__"]
        keys_regular, keys_pole, fields = {}, {}, {}
        for name in z:
            if name == "__meta__":
                continue
            if name.startswith("key_"):
                _, kind, dj, dc = name.split("_")
                target = keys_regular if kind == "reg" else keys_pole
                target[(int(dj), int(dc))] = z[name]
            else:
                fields[name] = z[name]
        # canonical (dj, dc)-sorted key order, matching the fresh build
        # (np.unique ascending): dict order decides the stencil ACCUMULATION
        # order in the fused kernels, so a cache hit must replay it exactly
        # or cached vs fresh models differ in the last bits everywhere
        keys_regular = {k: keys_regular[k] for k in sorted(keys_regular)}
        keys_pole = {k: keys_pole[k] for k in sorted(keys_pole)}
        out = _Shifts(
            ny=int(meta[0]), nxw=int(meta[1]), L=int(meta[2]), nlev_axis=0,
            keys_regular=keys_regular, keys_pole=keys_pole, **fields,
        )
        if legacy is not None:
            # upgrade legacy zlib caches to the mmap'd directory format so
            # the decompression cost is paid only once
            try:
                save_shifts(out, path)
            except OSError:
                pass
        return out
    except Exception:
        return None
    finally:
        if legacy is not None:
            legacy.close()


def save_legendre(path: str, P: np.ndarray) -> None:
    """Persist the compact (nlat_half, ncoef) Legendre table (reference:
    LegendreCache binary blobs mmap'd by TransLocal.cc:652-711). Stored as a
    raw .npy (no compression: the table is GBs at T1279 and zlib would cost
    minutes) so load_legendre can memory-map it."""
    npy = path + ".npy"
    np.save(npy + ".tmp.npy", P)  # np.save keeps the name (ends in .npy)
    os.replace(npy + ".tmp.npy", npy)


def load_legendre(path: str):
    npy = path + ".npy"
    if os.path.exists(npy):
        try:
            return np.load(npy, mmap_mode="r")
        except Exception:
            return None
    if not os.path.exists(path):  # legacy compressed cache
        return None
    try:
        with np.load(path) as z:
            P = z["P"]
        try:  # upgrade: pay the zlib decompression only once
            save_legendre(path, P)
        except OSError:
            pass
        return P
    except Exception:
        return None


def save_packed(path: str, arrays: dict) -> None:
    """Persist FINAL packed device tables (f32, device layout) as raw .npy
    files in a directory — mmap'd on load so a cache hit pays only the
    host->device copy, never a rebuild (reference: mmap'd LegendreCache,
    TransLocal.cc:652-711; VERDICT r3 item 8)."""
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    for k, v in arrays.items():
        np.save(os.path.join(tmp, k + ".npy"), np.asarray(v))
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    os.replace(tmp, path)


def load_packed(path: str):
    """dict of mmap'd arrays, or None."""
    if not os.path.isdir(path):
        return None
    try:
        out = {}
        for fn in os.listdir(path):
            if fn.endswith(".npy"):
                out[fn[:-4]] = np.load(os.path.join(path, fn), mmap_mode="r")
        return out if out else None
    except Exception:
        return None
