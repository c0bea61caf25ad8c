"""Partitioner tests, mirroring reference src/tests/grid/test_distribution.cc."""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.partition import Partitioner, Distribution
from atlas_tpu.partition.equal_regions import eq_caps


def test_eq_caps_structure():
    n_regions, s_cap = eq_caps(8)
    assert n_regions[0] == 1 and n_regions[-1] == 1
    assert n_regions.sum() == 8
    assert np.all(np.diff(s_cap) > 0)
    assert abs(s_cap[-1] - np.pi) < 1e-14

    n_regions, s_cap = eq_caps(1)
    assert n_regions.tolist() == [1]


@pytest.mark.parametrize("nparts", [1, 2, 4, 7, 8])
def test_equal_regions_balance(nparts):
    g = Grid("O16")
    d = Distribution(g, Partitioner("equal_regions", nb_parts=nparts))
    counts = d.nb_pts()
    assert counts.sum() == g.size
    assert counts.max() - counts.min() <= 1  # count-balanced by construction
    assert len(np.unique(d.partition)) == nparts


def test_equal_regions_zonal_structure():
    # northernmost points belong to partition 0 (north cap), southernmost to last
    g = Grid("O16")
    p = Partitioner("equal_regions", nb_parts=8).partition(g)
    assert p[0] == 0
    assert p[g.size - 1] == 7


def test_equal_area_partitioner():
    g = Grid("O16")
    p = Partitioner("equal_area", nb_parts=6).partition(g)
    assert len(np.unique(p)) == 6
    assert p.min() == 0 and p.max() == 5


def test_bands_partitioner():
    g = Grid("O8")
    d = Distribution(g, Partitioner("bands", nb_parts=4))
    counts = d.nb_pts()
    assert counts.max() - counts.min() <= 1
    # bands are contiguous in grid order
    assert (np.diff(d.partition) >= 0).all()


def test_regular_bands_partitioner():
    g = Grid("F8")
    p = Partitioner("regular_bands", nb_parts=4).partition(g)
    # whole rows per part: partition constant within each row
    i, j = g.ij()
    for row in range(g.ny):
        assert len(np.unique(p[j == row])) == 1


def test_checkerboard_partitioner():
    g = Grid("L32x16")
    p = Partitioner("checkerboard", nb_parts=8).partition(g)
    assert len(np.unique(p)) == 8
    counts = np.bincount(p)
    assert counts.max() <= 2 * counts.min()
    with pytest.raises(ValueError):
        Partitioner("checkerboard", nb_parts=4).partition(Grid("O8"))


def test_cubedsphere_partitioner():
    g = Grid("CS-LFR-4")
    p = Partitioner("cubedsphere", nb_parts=12).partition(g)
    assert len(np.unique(p)) == 12
    # each tile split into exactly 2 parts
    npt = 16
    for t in range(6):
        assert len(np.unique(p[t * npt : (t + 1) * npt])) == 2


def test_serial_partitioner():
    g = Grid("O8")
    p = Partitioner("serial").partition(g)
    assert (p == 0).all()


def test_distribution_global_indices():
    g = Grid("O8")
    d = Distribution(g, Partitioner("equal_regions", nb_parts=3))
    all_idx = np.sort(np.concatenate([d.global_indices(p) for p in range(3)]))
    np.testing.assert_array_equal(all_idx, np.arange(g.size))
