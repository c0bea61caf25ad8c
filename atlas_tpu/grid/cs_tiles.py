"""Cubed-sphere tile topologies: FV3 vs LFRic layouts.

Reference behavior: atlas grid/detail/tiles/Tiles.h:34-75 (API), FV3Tiles.cc
and LFRicTiles.cc (the two concrete layouts). A tiles object defines

  - the schematic xy unfolding of the 6 tiles (xy2abOffsets / ab2xyOffsets):
    which 90x90-degree xy rectangle each tile occupies. FV3 staircases the
    tiles (a-offsets 0,1,1,2,3,3), LFRic lays 4 equatorial tiles in a row with
    the poles above/below tile 0 (a-offsets 0,1,2,3,0,0);
  - per-tile rotations taking the BASE tile frame (gnomonic face centered on
    lon=180, i.e. the -x axis, after the reference's lon-180 shift in
    CubedSphereProjectionBase::xy2lonlat_post) to the tile's true position on
    the sphere. FV3 composes Rz/Rx/Ry quarter turns (FV3Tiles.cc:83-122);
    LFRic uses signed axis permutations (LFRicTiles.cc:81-158). The two
    layouts place tiles at DIFFERENT sphere positions and orientations;
  - point->tile classification (indexFromXY / indexFromLonLat) and the
    periodic extension map tileCubePeriodicity (re-canonicalise an xy point
    continued past a cube edge).

TPU design: everything is a (6,3,3) rotation-matrix tensor and vectorized
einsum/argmax over point ARRAYS — no per-point virtual dispatch. Edge
tie-breaks are deterministic (lowest tile index wins) like the reference's
ordered inequality chains.
"""

from __future__ import annotations

import numpy as np

from ..util.constants import DEG2RAD, RAD2DEG
from ..util.factory import Factory

# base tile frame: face centre direction, d/d(alpha), d/d(beta) at the centre
# (alpha, beta in degrees in [-45, 45] on the gnomonic face)
_BASE_C = np.array([-1.0, 0.0, 0.0])
_BASE_TX = np.array([0.0, -1.0, 0.0])  # east at lon=180
_BASE_TY = np.array([0.0, 0.0, 1.0])


def _rz(deg):
    """Reference rotate3dZ (ProjectionUtilities.h:123): x'=cx+sy, y'=-sx+cy."""
    c, s = np.cos(deg * DEG2RAD), np.sin(deg * DEG2RAD)
    return np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])


def _ry(deg):
    """rotate3dY (ProjectionUtilities.h:112): x'=cx-sz, z'=sx+cz."""
    c, s = np.cos(deg * DEG2RAD), np.sin(deg * DEG2RAD)
    return np.array([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]])


def _rx(deg):
    """rotate3dX (ProjectionUtilities.h:101): y'=cy+sz, z'=-sy+cz."""
    c, s = np.cos(deg * DEG2RAD), np.sin(deg * DEG2RAD)
    return np.array([[1.0, 0.0, 0.0], [0.0, c, s], [0.0, -s, c]])


class CubedSphereTiles:
    """Vectorized tile topology; subclasses fill R (6,3,3), offsets, type."""

    type: str
    R: np.ndarray  # (6, 3, 3): base-frame xyz -> tile t sphere xyz
    xy2ab_offsets: np.ndarray  # (2, 6) in units of 90 degrees
    ab2xy_offsets: np.ndarray  # (2, 6) in degrees

    def __init__(self):
        self.Rinv = np.transpose(self.R, (0, 2, 1))  # orthonormal
        self.centres_xyz = self.R @ _BASE_C  # (6, 3)

    # -- rotations (vectorized over points) --------------------------------
    def rotate(self, t, xyz):
        """Base-frame xyz -> tile-t sphere xyz. t scalar or (n,) array."""
        xyz = np.asarray(xyz, np.float64)
        if np.ndim(t) == 0:
            return xyz @ self.R[int(t)].T
        return np.einsum("nij,nj->ni", self.R[np.asarray(t)], xyz)

    def unrotate(self, t, xyz):
        xyz = np.asarray(xyz, np.float64)
        if np.ndim(t) == 0:
            return xyz @ self.Rinv[int(t)].T
        return np.einsum("nij,nj->ni", self.Rinv[np.asarray(t)], xyz)

    # -- classification -----------------------------------------------------
    def index_from_xyz(self, xyz) -> np.ndarray:
        """Owning tile of unit vectors (n, 3): the tile whose centre direction
        is closest (ties -> lowest tile index, matching the reference's
        deterministic edge ownership chains)."""
        xyz = np.asarray(xyz, np.float64).reshape(-1, 3)
        score = xyz @ self.centres_xyz.T  # (n, 6)
        # np.argmax returns the FIRST maximal index -> lowest tile wins ties
        return np.argmax(np.round(score, 12), axis=1).astype(np.int64)

    def index_from_lonlat(self, lonlat) -> np.ndarray:
        """Tiles.h:58 indexFromLonLat, vectorized."""
        ll = np.asarray(lonlat, np.float64).reshape(-1, 2) * DEG2RAD
        cl = np.cos(ll[:, 1])
        xyz = np.stack([cl * np.cos(ll[:, 0]), cl * np.sin(ll[:, 0]),
                        np.sin(ll[:, 1])], axis=1)
        return self.index_from_xyz(xyz)

    def index_from_xy(self, xy) -> np.ndarray:
        """Tiles.h:56 indexFromXY: which tile's 90x90 xy rectangle holds the
        point. Boundaries go to the lowest matching tile index."""
        xy = np.asarray(xy, np.float64).reshape(-1, 2)
        ax = self.ab2xy_offsets[0]  # lower-left x of each tile rectangle
        ay = self.ab2xy_offsets[1]
        inx = (xy[:, 0:1] >= ax - 1e-12) & (xy[:, 0:1] <= ax + 90.0 + 1e-12)
        iny = (xy[:, 1:2] >= ay - 1e-12) & (xy[:, 1:2] <= ay + 90.0 + 1e-12)
        hit = inx & iny  # (n, 6)
        out = np.argmax(hit, axis=1).astype(np.int64)
        out[~hit.any(axis=1)] = -1
        return out

    # -- xy <-> (t, alphabeta) ----------------------------------------------
    def xy2alphabeta(self, xy, t):
        """xy (n,2) on tile t -> gnomonic face angles (alpha, beta) degrees."""
        xy = np.asarray(xy, np.float64).reshape(-1, 2)
        off = self.ab2xy_offsets[:, np.asarray(t).reshape(-1)]
        return np.stack([xy[:, 0] - off[0] - 45.0, xy[:, 1] - off[1] - 45.0],
                        axis=1)

    def alphabeta2xy(self, ab, t):
        ab = np.asarray(ab, np.float64).reshape(-1, 2)
        off = self.ab2xy_offsets[:, np.asarray(t).reshape(-1)]
        return np.stack([ab[:, 0] + off[0] + 45.0, ab[:, 1] + off[1] + 45.0],
                        axis=1)

    def ab_to_xyz(self, ab, t):
        """(alpha, beta) gnomonic angles on tile t -> sphere xyz."""
        ab = np.asarray(ab, np.float64).reshape(-1, 2)
        ta = np.tan(ab[:, 0] * DEG2RAD)
        tb = np.tan(ab[:, 1] * DEG2RAD)
        base = (_BASE_C[None] + ta[:, None] * _BASE_TX[None]
                + tb[:, None] * _BASE_TY[None])
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        return self.rotate(np.broadcast_to(np.asarray(t), (len(ab),)), base)

    def xyz_to_ab(self, xyz, t):
        """Sphere xyz known to lie on tile t -> (alpha, beta) angles."""
        base = self.unrotate(np.broadcast_to(np.asarray(t), (len(xyz),)),
                             np.asarray(xyz, np.float64).reshape(-1, 3))
        # gnomonic: project onto the x=-1 plane
        a = np.arctan2(-base[:, 1], -base[:, 0]) * RAD2DEG
        b = np.arctan2(base[:, 2], -base[:, 0]) * RAD2DEG
        return np.stack([a, b], axis=1)

    def tile_cube_periodicity(self, xy, t):
        """Tiles.h:72 tileCubePeriodicity, vectorized: an xy point continued
        PAST its tile's edge (alpha/beta outside [-45,45]) is re-expressed as
        the canonical (xy, tile) it actually lands on. Interior points return
        unchanged (reference test_cubedsphere.cc:238-256 round-trip)."""
        xy = np.asarray(xy, np.float64).reshape(-1, 2)
        t = np.broadcast_to(np.asarray(t), (len(xy),))
        ab = self.xy2alphabeta(xy, t)
        s = self.ab_to_xyz(ab, t)
        t_new = self.index_from_xyz(s)
        ab_new = self.xyz_to_ab(s, t_new)
        return self.alphabeta2xy(ab_new, t_new), t_new

    def tile_centre(self, t):
        """Sphere lonlat (degrees) of tile t's centre."""
        c = self.centres_xyz[int(t)]
        lon = np.arctan2(c[1], c[0]) * RAD2DEG % 360.0
        lat = np.arcsin(np.clip(c[2], -1, 1)) * RAD2DEG
        return np.array([lon, lat])

    def tile_jacobian(self, t):
        """d(sphere xyz)/d(alpha, beta) at tile t's centre: the rotated base
        tangent frame (Tiles.h:68)."""
        return np.stack([self.R[int(t)] @ _BASE_TX,
                         self.R[int(t)] @ _BASE_TY], axis=1)

    def frames(self):
        """(6, 3(c/tx/ty), 3) tile frames for dense tile-array generation."""
        return np.stack([self.R @ _BASE_C, self.R @ _BASE_TX,
                         self.R @ _BASE_TY], axis=1)

    def enforce_xy_domain(self, xy):
        """Clamp xy into the union of tile rectangles (Tiles.h:64)."""
        xy = np.asarray(xy, np.float64).reshape(-1, 2).copy()
        xy[:, 0] = np.clip(xy[:, 0], self.ab2xy_offsets[0].min(),
                           self.ab2xy_offsets[0].max() + 90.0)
        xy[:, 1] = np.clip(xy[:, 1], self.ab2xy_offsets[1].min(),
                           self.ab2xy_offsets[1].max() + 90.0)
        return xy

    def __repr__(self):
        return f"CubedSphereTiles({self.type!r})"


class FV3Tiles(CubedSphereTiles):
    """FV3 layout (FV3Tiles.cc): staircase unfolding, tile 2 north, 5 south.

    Rotations (FV3Tiles.cc:83-122): t1 Rz(-90); t2 Rz(-90)Rx(90); t3 Rz(-180);
    t4 Rz(90); t5 Ry(90)Rz(90) — applied base->sphere in that order.
    """

    type = "cubedsphere_fv3"
    xy2ab_offsets = np.array([[0.0, 1, 1, 2, 3, 3], [1.0, 1, 2, 1, 1, 0]])
    ab2xy_offsets = np.array([[0.0, 90, 90, 180, 270, 270],
                              [-45.0, -45, 45, -45, -45, -135]])

    def __init__(self):
        eye = np.eye(3)
        self.R = np.stack([
            eye,
            _rz(-90.0),
            _rx(90.0) @ _rz(-90.0),
            _rz(-180.0),
            _rz(90.0),
            _rz(90.0) @ _ry(90.0),
        ])
        super().__init__()


class LFRicTiles(CubedSphereTiles):
    """LFRic layout (LFRicTiles.cc): 4 equatorial tiles in a row, tile 4
    north above tile 0, tile 5 south below; signed-permutation rotations
    (LFRicTiles.cc:81-158)."""

    type = "cubedsphere_lfric"
    xy2ab_offsets = np.array([[0.0, 1, 2, 3, 0, 0], [1.0, 1, 1, 1, 2, 0]])
    ab2xy_offsets = np.array([[0.0, 90, 180, 270, 0, 0],
                              [-45.0, -45, -45, -45, 45, -135]])

    def __init__(self):
        self.R = np.array([
            np.eye(3),
            # (x,y,z) -> (-y, x, z)
            [[0.0, -1, 0], [1, 0, 0], [0, 0, 1]],
            # (x,y,z) -> (-x, -y, z)
            [[-1.0, 0, 0], [0, -1, 0], [0, 0, 1]],
            # (x,y,z) -> (y, -x, z)
            [[0.0, 1, 0], [-1, 0, 0], [0, 0, 1]],
            # (x,y,z) -> (z, y, -x)
            [[0.0, 0, 1], [0, 1, 0], [-1, 0, 0]],
            # (x,y,z) -> (-z, y, x)
            [[0.0, 0, -1], [0, 1, 0], [1, 0, 0]],
        ])
        super().__init__()


tiles_factory = Factory("CubedSphereTiles")
tiles_factory.register("cubedsphere_fv3", FV3Tiles)
tiles_factory.register("fv3", FV3Tiles)
tiles_factory.register("cubedsphere_lfric", LFRicTiles)
tiles_factory.register("lfric", LFRicTiles)


def tiles_for_stagger(stagger: str) -> CubedSphereTiles:
    """Reference grid-name convention (CubedSphere.cc grid builder): CS-LFR-*
    uses the LFRic tiles; CS-EA-* / CS-ED-* use the FV3 tiles."""
    return LFRicTiles() if stagger.upper() == "LFR" else FV3Tiles()
