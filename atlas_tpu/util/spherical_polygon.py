"""Convex spherical polygons: areas and intersections, vectorized.

Reference behavior: atlas util/ConvexSphericalPolygon.h — convex polygons of
great-circle arcs on the unit sphere with area and pairwise intersection;
the basis of conservative remapping
(interpolation/method/unstructured/ConservativeSphericalPolygonInterpolation).

Implementation:
 - area: sum of spherical-triangle excesses from the first vertex using the
   van Oosterom-Strackee formula (numerically robust for small triangles);
 - intersection: Sutherland-Hodgman clipping against the clipper's great-
   circle half-spaces, vectorized over M polygon pairs with a fixed vertex
   capacity and validity counts.

All functions operate on batches: verts (M, NV, 3) unit vectors CCW (viewed
from outside), count (M,) valid vertex counts.
"""

from __future__ import annotations

import numpy as np


def triangle_excess(a, b, c):
    """Spherical triangle area (excess), vectorized over leading dims."""
    num = np.einsum("...i,...i->...", a, np.cross(b, c))
    den = (
        1.0
        + np.einsum("...i,...i->...", a, b)
        + np.einsum("...i,...i->...", b, c)
        + np.einsum("...i,...i->...", c, a)
    )
    return 2.0 * np.arctan2(num, den)


def polygon_area(verts: np.ndarray, count: np.ndarray) -> np.ndarray:
    """Areas of (M, NV, 3) polygons with per-polygon vertex counts."""
    M, NV, _ = verts.shape
    area = np.zeros(M)
    if NV < 3:
        return area
    a = verts[:, 0]
    for k in range(1, NV - 1):
        valid = count > k + 1
        if not valid.any():
            break
        t = triangle_excess(a[valid], verts[valid, k], verts[valid, k + 1])
        area[valid] += t
    return area


def polygon_centroid(verts: np.ndarray, count: np.ndarray) -> np.ndarray:
    """Unit centroids of (M, NV, 3) polygons: excess-weighted fan-triangle
    centers, normalized (matches native csp.cc). Zero rows where area <= 0."""
    M, NV, _ = verts.shape
    acc = np.zeros((M, 3))
    area = np.zeros(M)
    a = verts[:, 0]
    for k in range(1, NV - 1):
        valid = count > k + 1
        if not valid.any():
            break
        b = verts[valid, k]
        c = verts[valid, k + 1]
        e = triangle_excess(a[valid], b, c)
        tc = a[valid] + b + c
        tc /= np.maximum(np.linalg.norm(tc, axis=-1, keepdims=True), 1e-300)
        acc[valid] += tc * e[:, None]
        area[valid] += e
    n = np.linalg.norm(acc, axis=-1, keepdims=True)
    out = np.where((area > 0)[:, None], acc / np.maximum(n, 1e-300), 0.0)
    return out


def polygon_first_moment(verts: np.ndarray, count: np.ndarray) -> np.ndarray:
    """Exact first moment M = integral of x dA over each spherical polygon.

    Uses the surface identity  ∫_S r dA = (1/2) ∮ r × dr ; along a great-
    circle arc a->b the line integral is  axis_hat * theta  with
    axis = a × b and theta the arc angle. The exact area average of a linear
    field a.x over the cell is then (a . M) / area — the reference check for
    second-order conservative remapping.
    Returns (M, NV->3) for (M, NV, 3) polygons with per-polygon counts.
    """
    M, NV, _ = verts.shape
    out = np.zeros((M, 3))
    slot = np.arange(NV)
    for k in range(NV):
        valid = count > max(k, 2)  # polygons need >= 3 vertices
        if not valid.any():
            break
        a = verts[:, k]
        nxt = (k + 1) % np.maximum(count, 1)
        b = verts[np.arange(M), nxt]
        cr = np.cross(a, b)
        s = np.linalg.norm(cr, axis=-1)
        theta = np.arctan2(s, np.einsum("mi,mi->m", a, b))
        axis = cr / np.maximum(s, 1e-300)[:, None]
        contrib = 0.5 * axis * theta[:, None]
        out[valid & (slot[k] < count)] += contrib[valid & (slot[k] < count)]
    return out


def clip_by_plane(verts, count, normal, capacity):
    """One Sutherland-Hodgman step: keep the half-space normal . v >= 0.

    verts (M, NV, 3), count (M,), normal (M, 3) -> (M, capacity, 3), count.
    """
    M, NV, _ = verts.shape
    eps = 1e-14
    dist = np.einsum("mvi,mi->mv", verts, normal)
    # mask out invalid slots
    slot = np.arange(NV)[None, :]
    valid = slot < count[:, None]
    inside = (dist >= -eps) & valid

    out = np.zeros((M, capacity, 3))
    out_n = np.zeros(M, dtype=np.int64)

    def emit(points, mask):
        """Append points[mask rows] at out_n positions (vectorized)."""
        rows = np.flatnonzero(mask)
        pos = out_n[rows]
        ok = pos < capacity
        rows = rows[ok]
        pos = pos[ok]
        out[rows, pos] = points[rows]
        out_n[rows] += 1

    for i in range(NV):
        jnxt = None  # next valid index is (i+1) % count per polygon
        nxt = (i + 1) % np.maximum(count, 1)
        cur_valid = valid[:, i]
        vi = verts[:, i]
        vn = verts[np.arange(M), nxt]
        di = dist[:, i]
        dn = dist[np.arange(M), nxt]
        in_i = (di >= -eps) & cur_valid
        in_n = (dn >= -eps) & cur_valid

        # crossing: intersection of the edge arc with the clip great circle
        crossing = cur_valid & (in_i != in_n)
        if crossing.any():
            # intersection direction: line of the two planes
            edge_n = np.cross(vi, vn)
            d = np.cross(edge_n, normal)
            nrm = np.linalg.norm(d, axis=-1, keepdims=True)
            d = d / np.maximum(nrm, 1e-300)
            # choose the antipode lying on the arc: closest to the midpoint
            mid = vi + vn
            sign = np.sign(np.einsum("mi,mi->m", d, mid))[:, None]
            d = d * np.where(sign == 0, 1.0, sign)

        # S-H emission: if current inside, emit current; if edge crosses, emit
        # the intersection.
        emit(vi, in_i)
        if crossing.any():
            emit(d, crossing)

    return out, np.minimum(out_n, capacity)


def intersect_polygons(subject, subj_count, clipper, clip_count, capacity=16):
    """Clip each subject polygon by its clipper polygon (both convex, CCW).

    subject (M, NVs, 3), clipper (M, NVc, 3) -> (M, capacity, 3), counts.
    """
    M, NVc, _ = clipper.shape
    verts, count = subject, subj_count.copy()
    for k in range(NVc):
        nxt = (k + 1) % np.maximum(clip_count, 1)
        a = clipper[:, k]
        b = clipper[np.arange(M), nxt]
        normal = np.cross(a, b)
        n = np.linalg.norm(normal, axis=-1, keepdims=True)
        normal = normal / np.maximum(n, 1e-300)
        # polygons whose clipper has fewer edges: skip (keep as is)
        active = clip_count > np.maximum(k, 1) - 0  # k < clip_count
        active = k < clip_count
        new_verts, new_count = clip_by_plane(verts, count, normal, capacity)
        verts = np.where(active[:, None, None], new_verts, _pad_to(verts, capacity))
        count = np.where(active, new_count, count)
    return verts, count


def _pad_to(verts, capacity):
    M, NV, _ = verts.shape
    if NV == capacity:
        return verts
    out = np.zeros((M, capacity, 3))
    out[:, : min(NV, capacity)] = verts[:, :capacity]
    return out


class ConvexSphericalPolygon:
    """Single-polygon convenience wrapper (reference API parity)."""

    def __init__(self, lonlat_or_xyz: np.ndarray):
        from .geometry import lonlat_to_xyz

        pts = np.asarray(lonlat_or_xyz, dtype=np.float64)
        if pts.shape[-1] == 2:
            pts = lonlat_to_xyz(pts)
        self.vertices = pts / np.linalg.norm(pts, axis=-1, keepdims=True)

    @property
    def size(self):
        return len(self.vertices)

    def area(self) -> float:
        v = self.vertices[None]
        return float(polygon_area(v, np.array([self.size])))

    def intersect(self, other: "ConvexSphericalPolygon"):
        cap = self.size + other.size + 2
        sub = _pad_to(self.vertices[None], cap)
        verts, count = intersect_polygons(
            sub,
            np.array([self.size]),
            other.vertices[None],
            np.array([other.size]),
            capacity=cap,
        )
        n = int(count[0])
        out = ConvexSphericalPolygon.__new__(ConvexSphericalPolygon)
        out.vertices = verts[0, :n]
        return out
