"""Equal-regions (Leopardi) zonal equal-area sphere partitioning.

Reference behavior: atlas grid/detail/partitioner/EqualRegionsPartitioner.cc
(algorithm at :278-360; the zonal EQ partition of Leopardi 2006 cited at .h:21).
The sphere is split into a north cap, S collar bands of equal-area sectors, and
a south cap. Point assignment balances point *counts*: points sorted
north->south are divided into per-region chunks of near-equal count band by
band; within each band points are sorted west->east. This is the default mesh
partitioner.

This implementation is fully vectorized numpy (argsort-based), no per-point
Python loops.
"""

from __future__ import annotations

import numpy as np

from .partitioner import Partitioner, partitioner_factory


def eq_caps(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Regions per zone and zone boundary colatitudes for the EQ partition.

    Returns (n_regions, s_cap): n_regions[0] == n_regions[-1] == 1 (polar
    caps); s_cap is the increasing list of colatitudes bounding each zone.
    """
    if n == 1:
        return np.array([1]), np.array([np.pi])
    area_of_region = 4.0 * np.pi / n
    # colatitude of polar cap with one region's area
    if n == 2:
        c_polar = 0.5 * np.pi
    else:
        c_polar = 2.0 * np.arcsin(np.sqrt(area_of_region / np.pi) * 0.5)
    ideal_angle = np.sqrt(area_of_region)
    n_collars = (
        max(1, int(round((np.pi - 2 * c_polar) / ideal_angle))) if n > 2 else 0
    )
    # ideal (real) number of regions per collar
    a_fitting = (np.pi - 2.0 * c_polar) / n_collars if n_collars else 0.0

    def cap_area(colat):
        return 4.0 * np.pi * np.sin(0.5 * colat) ** 2

    r_regions = np.empty(n_collars + 2)
    r_regions[0] = 1.0
    for c in range(n_collars):
        collar_area = cap_area(c_polar + (c + 1) * a_fitting) - cap_area(c_polar + c * a_fitting)
        r_regions[1 + c] = collar_area / area_of_region
    r_regions[-1] = 1.0
    # round to naturals, propagating the discrepancy
    n_regions = np.empty(n_collars + 2, dtype=np.int64)
    discrepancy = 0.0
    for z in range(n_collars + 2):
        n_regions[z] = int(round(r_regions[z] + discrepancy))
        discrepancy += r_regions[z] - n_regions[z]
    # cap colatitudes enclosing the cumulative region count
    s_cap = np.empty(n_collars + 2)
    s_cap[0] = c_polar
    subtotal = 1
    for c in range(n_collars):
        subtotal += n_regions[1 + c]
        s_cap[c + 1] = 2.0 * np.arcsin(0.5 * np.sqrt(subtotal * area_of_region / np.pi))
    s_cap[-1] = np.pi
    return n_regions, s_cap


@partitioner_factory.register("equal_regions")
class EqualRegionsPartitioner(Partitioner):
    type = "equal_regions"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.sectors, s_cap = eq_caps(self.nb_parts)
        self.band_lat = 0.5 * np.pi - s_cap  # decreasing band lower-boundary latitudes [rad]

    def partition(self, grid) -> np.ndarray:
        lonlat = grid.lonlat()
        n = len(lonlat)
        nb_parts = self.nb_parts
        if nb_parts == 1:
            return np.zeros(n, dtype=np.int32)
        # per-region target counts: chunk_size + 1 for the first `remainder`
        chunk = n // nb_parts
        counts = np.full(nb_parts, chunk, dtype=np.int64)
        counts[: n - chunk * nb_parts] += 1
        region_of_point_end = np.cumsum(counts)

        # sort north->south, ties west->east (atlas compare_NS_WE)
        lon = lonlat[:, 0]
        lat = lonlat[:, 1]
        order_ns = np.lexsort((lon, -lat))

        # band of each region and number of points per band
        band_of_region = np.repeat(np.arange(len(self.sectors)), self.sectors)
        band_counts = np.bincount(band_of_region, weights=counts).astype(np.int64)
        band_ends = np.cumsum(band_counts)
        band_starts = band_ends - band_counts

        part = np.empty(n, dtype=np.int32)
        region0_of_band = np.concatenate([[0], np.cumsum(self.sectors)])[:-1]
        for b in range(len(self.sectors)):
            sl = order_ns[band_starts[b] : band_ends[b]]
            if len(sl) == 0:
                continue
            # within band: sort west->east, ties north->south (compare_WE_NS)
            order_we = sl[np.lexsort((-lat[sl], lon[sl]))]
            # split sequentially into this band's regions by their counts
            r0 = region0_of_band[b]
            nreg = self.sectors[b]
            reg_counts = counts[r0 : r0 + nreg]
            reg_ids = np.repeat(np.arange(r0, r0 + nreg), reg_counts)
            part[order_we] = reg_ids[: len(order_we)].astype(np.int32)
        return part


@partitioner_factory.register("equal_area")
class EqualAreaPartitioner(EqualRegionsPartitioner):
    """Area-based (not count-balanced) assignment using the EQ region boxes.

    Reference: EqualAreaPartitioner.cc:76 — each point goes to the region whose
    (colatitude band, longitude sector) box contains it.
    """

    type = "equal_area"

    def partition(self, grid) -> np.ndarray:
        lonlat = grid.lonlat()
        lat = np.deg2rad(lonlat[:, 1])
        lon = np.deg2rad(lonlat[:, 0]) % (2 * np.pi)
        # band index: first band whose lower boundary lat < point lat
        band = np.searchsorted(-self.band_lat, -lat, side="right")
        band = np.clip(band, 0, len(self.sectors) - 1)
        nsec = self.sectors[band]
        sector = np.minimum(
            (lon * nsec / (2 * np.pi + 1e-8)).astype(np.int64), nsec - 1
        )
        region0 = np.concatenate([[0], np.cumsum(self.sectors)])[:-1]
        return (region0[band] + sector).astype(np.int32)
