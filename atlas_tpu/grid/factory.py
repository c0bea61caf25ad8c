"""Named grid factory with regex name matching.

Reference behavior: atlas grid/detail/grid/GridBuilder.h:44 — grid names are
matched against regexes:
  N<g>      classic Gaussian      (Gaussian.cc:66)   [needs classic pl tables]
  O<g>      octahedral Gaussian   (Gaussian.cc:103)  nx(j) = 20 + 4j
  F<g>      regular Gaussian      (Gaussian.cc:147)  nx = 4N
  L<nx>x<ny>, L<g>         regular lon-lat incl. poles   (LonLat.cc:127)
  S<nx>x<ny>, Slon…, Slat… shifted lon-lat variants      (LonLat.cc:165-251)
  H<n>      HEALPix               (Healpix.cc:35)
  CS-{LFR,EA,ED}-<N> cubed sphere (CubedSphere.cc)
Spec-built grids: {"type": "structured", ...}.
"""

from __future__ import annotations

import re

import numpy as np

from ..util.config import Config
from .gaussian import gaussian_latitudes_npole_spole
from .structured import StructuredGrid
from ..projection import Projection


def _projection_of(config: Config | None) -> Projection:
    if config and "projection" in config:
        return Projection(Config(config["projection"]))
    return Projection()


def _octahedral(N: int, config: Config | None = None) -> StructuredGrid:
    nx = np.empty(2 * N, dtype=np.int64)
    j = np.arange(N)
    start = 20
    if config:
        start = int(config.get("nx[0]", 20))
    nx[:N] = start + 4 * j
    nx[N:] = nx[:N][::-1]
    return StructuredGrid(f"O{N}", nx, gaussian_latitudes_npole_spole(2 * N), projection=_projection_of(config))


def _regular_gaussian(N: int, config: Config | None = None) -> StructuredGrid:
    nx = np.full(2 * N, 4 * N, dtype=np.int64)
    return StructuredGrid(f"F{N}", nx, gaussian_latitudes_npole_spole(2 * N), projection=_projection_of(config))


def _classic_gaussian(N: int, config: Config | None = None) -> StructuredGrid:
    from .classic_gaussian import classic_pl

    nx = classic_pl(N)
    return StructuredGrid(f"N{N}", nx, gaussian_latitudes_npole_spole(2 * N), projection=_projection_of(config))


def _lonlat(nx: int, ny: int, shifted_x: bool, shifted_y: bool, config: Config | None = None) -> StructuredGrid:
    """Regular lon-lat grids; see LonLat.cc:55-100 for the shift conventions."""
    start_x = (0.5 if shifted_x else 0.0) * 360.0 / nx
    if shifted_y:
        dy = 180.0 / ny
        y = np.linspace(90.0 - 0.5 * dy, -90.0 + 0.5 * dy, ny)
    else:
        y = np.linspace(90.0, -90.0, ny)
    name = {
        (False, False): "L",
        (True, False): "Slon",
        (False, True): "Slat",
        (True, True): "S",
    }[(shifted_x, shifted_y)] + f"{nx}x{ny}"
    return StructuredGrid(
        name,
        np.full(len(y), nx, dtype=np.int64),
        y,
        xmin=start_x,
        projection=_projection_of(config),
    )


_NAME_PATTERNS = [
    (re.compile(r"^[Oo]([1-9][0-9]*)$"), lambda m, c: _octahedral(int(m.group(1)), c)),
    (re.compile(r"^[Ff]([1-9][0-9]*)$"), lambda m, c: _regular_gaussian(int(m.group(1)), c)),
    (re.compile(r"^[Nn]([1-9][0-9]*)$"), lambda m, c: _classic_gaussian(int(m.group(1)), c)),
    (
        re.compile(r"^[Ll]([1-9][0-9]*)x([1-9][0-9]*)$"),
        lambda m, c: _lonlat(int(m.group(1)), int(m.group(2)), False, False, c),
    ),
    (
        re.compile(r"^[Ll]([1-9][0-9]*)$"),
        lambda m, c: _lonlat(4 * int(m.group(1)), 2 * int(m.group(1)) + 1, False, False, c),
    ),
    (
        re.compile(r"^[Ss][Ll][Oo][Nn]([1-9][0-9]*)x([1-9][0-9]*)$"),
        lambda m, c: _lonlat(int(m.group(1)), int(m.group(2)), True, False, c),
    ),
    (
        re.compile(r"^[Ss][Ll][Oo][Nn]([1-9][0-9]*)$"),
        lambda m, c: _lonlat(4 * int(m.group(1)), 2 * int(m.group(1)) + 1, True, False, c),
    ),
    (
        re.compile(r"^[Ss][Ll][Aa][Tt]([1-9][0-9]*)x([1-9][0-9]*)$"),
        lambda m, c: _lonlat(int(m.group(1)), int(m.group(2)), False, True, c),
    ),
    (
        re.compile(r"^[Ss][Ll][Aa][Tt]([1-9][0-9]*)$"),
        lambda m, c: _lonlat(4 * int(m.group(1)), 2 * int(m.group(1)), False, True, c),
    ),
    (
        re.compile(r"^[Ss]([1-9][0-9]*)x([1-9][0-9]*)$"),
        lambda m, c: _lonlat(int(m.group(1)), int(m.group(2)), True, True, c),
    ),
    (
        re.compile(r"^[Ss]([1-9][0-9]*)$"),
        lambda m, c: _lonlat(4 * int(m.group(1)), 2 * int(m.group(1)), True, True, c),
    ),
]


def _healpix(m, c):
    from .healpix import HealpixGrid

    return HealpixGrid(int(m.group(1)))


def _cubedsphere(m, c):
    from .cubedsphere import CubedSphereGrid

    return CubedSphereGrid(int(m.group(2)), stagger=m.group(1).upper())


_NAME_PATTERNS += [
    (re.compile(r"^[Hh]([1-9][0-9]*)$"), _healpix),
    (re.compile(r"^CS-(LFR|EA|ED)-([1-9][0-9]*)$", re.IGNORECASE), _cubedsphere),
]


def Grid(name_or_config, config: Config | None = None):
    """Create a grid from a name ("O32", "F80", "L90x45", …) or a spec Config."""
    if isinstance(name_or_config, (dict, Config)) and not isinstance(name_or_config, str):
        return _from_spec(Config(name_or_config))
    name = str(name_or_config)
    cfg = Config(config) if config else None
    for pattern, builder in _NAME_PATTERNS:
        m = pattern.match(name)
        if m:
            return builder(m, cfg)
    raise KeyError(f"Unrecognised grid name {name!r}")


def _from_spec(spec: Config):
    gtype = spec.get_str("type", "structured")
    if gtype == "structured":
        if "name" in spec and "nx" not in spec:
            return Grid(spec["name"])
        nx = np.asarray(spec["nx"], dtype=np.int64)
        if "y" in spec:
            y = np.asarray(spec["y"], dtype=np.float64)
        else:
            from .spacing import Spacing

            y = Spacing.create(spec.get_config("yspace")).values
        if nx.ndim == 0:
            nx = np.full(len(y), int(nx))
        xmin = spec.get("xmin", 0.0)
        return StructuredGrid(
            spec.get_str("name", "structured"),
            nx,
            y,
            xmin=xmin,
            projection=_projection_of(spec),
        )
    if gtype == "regional":
        return _regional(spec)
    if gtype == "regional_variable_resolution":
        return _regional_variable_resolution(spec)
    if gtype == "zonal_band":
        # global in x, limited latitude band (reference Regional.cc:330 +
        # domain/ZonalBandDomain.h)
        nx = spec.get_int("nx")
        ny = spec.get_int("ny")
        north = spec.get_float("north", 90.0)
        south = spec.get_float("south", -90.0)
        y = np.linspace(north, south, ny)
        return StructuredGrid(
            spec.get_str("name", "zonal_band"),
            np.full(ny, nx, dtype=np.int64),
            y,
            xmin=spec.get("xmin", 0.0),
            periodic_x=True,
        )
    if gtype == "healpix":
        from .healpix import HealpixGrid

        return HealpixGrid(spec.get_int("N"))
    if gtype == "cubedsphere":
        from .cubedsphere import CubedSphereGrid

        return CubedSphereGrid(spec.get_int("N"), stagger=spec.get_str("stagger", "LFR"))
    if gtype == "unstructured":
        from .unstructured import UnstructuredGrid

        return UnstructuredGrid(np.asarray(spec["xy"], dtype=np.float64))
    raise KeyError(f"Unknown grid type {gtype!r}")


def _regional_variable_resolution(spec: Config):
    """Regional grid with LAM variable-resolution stretching.

    Reference: grid "regional_variable_resolution" built over
    VariableResolutionProjection (projection/detail/
    VariableResolutionProjection.cc): the grid is uniform (delta_inner
    spacing) in index space over [outer.xmin, outer.xend] x [outer.ymin,
    outer.yend]; the projection stretches coordinates outside the inner box.
    """
    from ..projection.projection import projection_factory

    pspec = dict(spec.get_config("projection") if "projection" in spec else spec)
    ptype = pspec.pop("type", "variable_resolution")
    proj = projection_factory.build(ptype, Config(pspec))
    di = proj.delta_inner
    eps = np.finfo(np.float32).eps
    nx = int((proj.outer_xend - proj.outer_xmin + eps) / di) + 1
    ny = int((proj.outer_yend - proj.outer_ymin + eps) / di) + 1
    y = proj.outer_yend - di * np.arange(ny)  # north -> south rows
    return StructuredGrid(
        spec.get_str("name", "regional_variable_resolution"),
        np.full(ny, nx, dtype=np.int64),
        y,
        xmin=proj.outer_xmin,
        xspan=float((nx - 1) * di),
        periodic_x=False,
        projection=proj,
    )


def _regional(spec: Config):
    """Regional grid: nx x ny box in projection space (Regional.cc:294)."""
    nx = spec.get_int("nx")
    ny = spec.get_int("ny")
    proj = _projection_of(spec)
    if "north" in spec:  # bounding box in projection space
        x = np.linspace(spec.get_float("west"), spec.get_float("east"), nx)
        y = np.linspace(spec.get_float("north"), spec.get_float("south"), ny)
    else:
        xc, yc = spec["centre"] if "centre" in spec else proj.lonlat2xy(
            np.array([spec["centre_lonlat"]])
        )[0]
        dx = spec.get_float("dx")
        dy = spec.get_float("dy", dx)
        x = xc + dx * (np.arange(nx) - (nx - 1) / 2)
        y = yc + dy * ((ny - 1) / 2 - np.arange(ny))
    g = StructuredGrid(
        spec.get_str("name", "regional"),
        np.full(ny, nx, dtype=np.int64),
        y,
        xmin=float(x[0]),
        xspan=float(x[-1] - x[0]),
        periodic_x=False,
        projection=proj,
    )
    return g
