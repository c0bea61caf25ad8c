"""ASCII point-cloud I/O (reference: atlas output/detail/PointCloudIO.cc).

Format: header "PointCloudIO <npts> <ncols> lon lat <names...>", one line per
point.
"""

from __future__ import annotations

import numpy as np


def write_pointcloud(path: str, lonlat: np.ndarray, fields: dict | None = None):
    lonlat = np.asarray(lonlat).reshape(-1, 2)
    fields = fields or {}
    names = list(fields)
    cols = [lonlat[:, 0], lonlat[:, 1]] + [np.asarray(fields[k]).ravel() for k in names]
    with open(path, "w") as f:
        f.write(f"PointCloudIO {len(lonlat)} {2 + len(names)} lon lat {' '.join(names)}\n")
        for row in zip(*cols):
            f.write(" ".join(f"{v:.10g}" for v in row) + "\n")


def read_pointcloud(path: str):
    with open(path) as f:
        header = f.readline().split()
        assert header[0] == "PointCloudIO"
        npts, ncols = int(header[1]), int(header[2])
        names = header[5:]
        data = np.loadtxt(f, ndmin=2)
    assert data.shape == (npts, ncols)
    lonlat = data[:, :2]
    fields = {name: data[:, 2 + i] for i, name in enumerate(names)}
    return lonlat, fields
