"""Cubed-sphere tile topology tests.

Reference behavior: atlas src/tests/grid/test_cubedsphere.cc (tile
classification, tileCubePeriodicity round-trips) and grid/detail/tiles/
{FV3Tiles,LFRicTiles}.cc layouts.
"""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.grid.cs_tiles import FV3Tiles, LFRicTiles, tiles_factory


@pytest.mark.parametrize("tiles", [FV3Tiles(), LFRicTiles()])
def test_rotations_orthonormal(tiles):
    R = tiles.R
    np.testing.assert_allclose(
        R @ np.transpose(R, (0, 2, 1)), np.broadcast_to(np.eye(3), (6, 3, 3)),
        atol=1e-14)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(6), atol=1e-14)


@pytest.mark.parametrize("tiles", [FV3Tiles(), LFRicTiles()])
def test_tile_centres_are_face_centres(tiles):
    # the 6 tile centres must be the 6 cube face directions, each used once
    c = tiles.centres_xyz
    key = np.round(c).astype(int)
    assert (np.abs(np.linalg.norm(c, axis=1) - 1.0) < 1e-14).all()
    assert len({tuple(k) for k in key}) == 6
    np.testing.assert_allclose(c, key, atol=1e-14)


def test_layouts_differ():
    """FV3 and LFRic place tiles 1..5 at different positions/orientations."""
    f, l = FV3Tiles(), LFRicTiles()
    assert not np.allclose(f.R, l.R)
    assert not np.array_equal(f.xy2ab_offsets, l.xy2ab_offsets)
    # same tile index -> different sphere centre for at least one tile
    assert (np.abs(f.centres_xyz - l.centres_xyz).max(axis=1) > 0.5).any()


@pytest.mark.parametrize("tiles", [FV3Tiles(), LFRicTiles()])
def test_classification_and_ab_roundtrip(tiles):
    rng = np.random.default_rng(0)
    ab = rng.uniform(-44.0, 44.0, size=(200, 2))
    for t in range(6):
        xyz = tiles.ab_to_xyz(ab, t)
        np.testing.assert_allclose(np.linalg.norm(xyz, axis=1), 1.0, atol=1e-14)
        # interior points classify to their own tile
        np.testing.assert_array_equal(tiles.index_from_xyz(xyz), t)
        # and invert exactly
        np.testing.assert_allclose(tiles.xyz_to_ab(xyz, t), ab, atol=1e-10)


@pytest.mark.parametrize("tiles", [FV3Tiles(), LFRicTiles()])
def test_xy_alphabeta_roundtrip(tiles):
    rng = np.random.default_rng(1)
    ab = rng.uniform(-45.0, 45.0, size=(100, 2))
    for t in range(6):
        xy = tiles.alphabeta2xy(ab, np.full(100, t))
        assert (tiles.index_from_xy(xy) >= 0).all()
        np.testing.assert_allclose(
            tiles.xy2alphabeta(xy, np.full(100, t)), ab, atol=1e-12)


@pytest.mark.parametrize("tiles", [FV3Tiles(), LFRicTiles()])
def test_tile_cube_periodicity(tiles):
    """Points continued PAST a tile edge re-canonicalise onto the true
    neighbouring tile at the same sphere position (reference
    test_cubedsphere.cc tileCubePeriodicity round-trip)."""
    rng = np.random.default_rng(2)
    # interior points are unchanged
    ab = rng.uniform(-40.0, 40.0, size=(50, 2))
    for t in range(6):
        xy = tiles.alphabeta2xy(ab, np.full(50, t))
        xy2, t2 = tiles.tile_cube_periodicity(xy, np.full(50, t))
        np.testing.assert_array_equal(t2, t)
        np.testing.assert_allclose(xy2, xy, atol=1e-9)
    # points past the edge (alpha in (45, 90)) land on ANOTHER tile but the
    # same sphere position
    ab_out = np.stack([rng.uniform(50.0, 85.0, 50),
                       rng.uniform(-40.0, 40.0, 50)], axis=1)
    for t in range(6):
        xy = tiles.alphabeta2xy(ab_out, np.full(50, t))
        xyz = tiles.ab_to_xyz(ab_out, t)
        xy2, t2 = tiles.tile_cube_periodicity(xy, np.full(50, t))
        assert (t2 != t).all()
        ab2 = tiles.xy2alphabeta(xy2, t2)
        assert (np.abs(ab2) <= 45.0 + 1e-9).all()
        xyz2 = np.stack([tiles.ab_to_xyz(ab2[i:i + 1], t2[i])[0]
                         for i in range(len(t2))])
        np.testing.assert_allclose(xyz2, xyz, atol=1e-9)


@pytest.mark.parametrize("tiles", [FV3Tiles(), LFRicTiles()])
def test_index_from_lonlat_covers_sphere(tiles):
    rng = np.random.default_rng(3)
    lon = rng.uniform(0.0, 360.0, 500)
    lat = np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, 500)))
    t = tiles.index_from_lonlat(np.stack([lon, lat], axis=1))
    assert ((t >= 0) & (t < 6)).all()
    # every tile owns ~1/6 of the sphere
    counts = np.bincount(t, minlength=6)
    assert counts.min() > 500 / 6 * 0.5


def test_factory_names():
    assert isinstance(tiles_factory.build("fv3"), FV3Tiles)
    assert isinstance(tiles_factory.build("cubedsphere_lfric"), LFRicTiles)


@pytest.mark.parametrize("stagger", ["LFR", "EA", "ED"])
def test_grid_uses_layout(stagger):
    g = Grid(f"CS-{stagger}-4")
    want = LFRicTiles if stagger == "LFR" else FV3Tiles
    assert isinstance(g.tiles, want)
    xyz = g.xyz()
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=1), 1.0, atol=1e-14)
    # every point classifies to its own tile
    t, _, _ = g.tji()
    np.testing.assert_array_equal(g.tiles.index_from_xyz(xyz), t)
    # schematic xy lands in that tile's rectangle
    assert (g.tiles.index_from_xy(g.xy()) == t).all()


def test_lfr_and_ea_positions_differ():
    a = Grid("CS-LFR-4").lonlat()
    b = Grid("CS-EA-4").lonlat()
    assert a.shape == b.shape
    assert not np.allclose(a, b)
