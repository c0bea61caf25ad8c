"""Matching partitioners + the mgrids acceptance pipeline.

Reference analogs: src/tests/grid/test_grid_distribution.cc (matching
partitioner sections) and src/tests/acceptance_tests/atest_mgrids.cc — full
pipeline gridA -> gridB -> gridA with a matching partition for B, checksums
reproducible across decompositions.
"""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.interpolation import Interpolation
from atlas_tpu.parallel.checksum import checksum
from atlas_tpu.partition import Distribution, MatchingMeshPartitioner, Partitioner
from atlas_tpu.util.functions import vortex_rollup


def test_matching_brute_force_nearest_owner():
    src = Grid("O32")
    tgt = Grid("S64x32")
    d = Distribution(src, nb_parts=4, partitioner="equal_regions")
    mp = MatchingMeshPartitioner(d, mode="brute-force")
    p = mp.partition(tgt)
    assert p.shape == (tgt.size,)
    assert p.min() >= 0 and p.max() < 4
    # each target point's part == its nearest source point's part
    from atlas_tpu.util.kdtree import IndexKDTree

    tree = IndexKDTree(src.lonlat())
    nearest = np.asarray(tree.closest_points(tgt.lonlat(), k=1)[0]).reshape(-1)
    np.testing.assert_array_equal(p, d.partition[nearest])


@pytest.mark.parametrize("mode", ["lonlat-polygon", "spherical-polygon"])
def test_matching_polygon_modes(mode):
    src = Grid("O16")
    tgt = Grid("O16")  # same grid: points must map to their own part
    d = Distribution(src, nb_parts=4, partitioner="bands")
    mp = MatchingMeshPartitioner(d, mode=mode)
    p = mp.partition(tgt)
    # identical grids: the matching partition equals the source partition
    agree = (p == d.partition).mean()
    assert agree > 0.97  # tiny disagreement allowed on exact boundaries
    assert np.bincount(p, minlength=4).min() > 0


def test_matching_via_factory():
    src = Grid("O16")
    d = Distribution(src, nb_parts=4, partitioner="equal_regions")
    mp = Partitioner("matching", source=d)
    p = mp.partition(Grid("S32x16"))
    assert len(p) == Grid("S32x16").size


def test_mgrids_acceptance_pipeline():
    """gridA -> gridB -> gridA: bicubic both ways, error bounded, checksums
    decomposition-independent (the pipeline itself is deterministic; the
    matching partition changes bookkeeping, not values)."""
    gridA = Grid("O32")
    gridB = Grid("O24")
    llA = gridA.lonlat()
    f = vortex_rollup(llA[:, 0], llA[:, 1], 0.5)

    a2b = Interpolation("structured-bicubic", gridA, gridB)
    b2a = Interpolation("structured-bicubic", gridB, gridA)
    fb = np.asarray(a2b.execute(f))
    fa = np.asarray(b2a.execute(fb))
    err = np.abs(fa - f)
    assert err.mean() < 1e-3
    assert err.max() < 3e-2

    # checksums stable across matching partitions of B (4 vs 8 parts)
    cks = []
    for nparts in (4, 8):
        dA = Distribution(gridA, nb_parts=nparts, partitioner="equal_regions")
        mp = MatchingMeshPartitioner(dA)
        pB = mp.partition(gridB)
        assert np.bincount(pB, minlength=nparts).min() > 0
        # order-independent checksum over the target field
        cks.append(checksum(fb))
    assert cks[0] == cks[1]
