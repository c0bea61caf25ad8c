"""Typed option helpers composable with `|` (reference: atlas option/Options.h:24-125).

Each helper returns a Config fragment, so calls compose exactly like the
reference's `option::levels(10) | option::halo(2)`:

    fs.create_field(name="t", **(levels(10) | halo(2)))
"""

from __future__ import annotations

import numpy as np

from .config import Config


def type(t: str) -> Config:  # noqa: A001 - mirrors atlas option::type
    return Config(type=t)


def name(n: str) -> Config:
    return Config(name=n)


def levels(n: int) -> Config:
    return Config(levels=int(n))


def variables(n: int) -> Config:
    return Config(variables=int(n))


def vector(components: int = 2) -> Config:
    return Config(variables=int(components), vector=True)


def halo(h: int) -> Config:
    return Config(halo=int(h))


def radius(r) -> Config:
    """Earth radius in metres, or the string "Earth"."""
    if isinstance(r, str):
        from .constants import EARTH_RADIUS

        if r.lower() != "earth":
            raise ValueError(f"unknown radius {r!r}")
        r = EARTH_RADIUS
    return Config(radius=float(r))


def datatype(dt) -> Config:
    return Config(datatype=np.dtype(dt).name)


def dtype(dt) -> Config:
    return datatype(dt)


def shape(s) -> Config:
    return Config(shape=list(s))


def alignment(a: int) -> Config:
    return Config(alignment=int(a))


def global_(owner: int = 0) -> Config:
    return Config(**{"global": True, "owner": int(owner)})


def pole_edges(on: bool = True) -> Config:
    return Config(pole_edges=bool(on))


def on_device(on: bool = True) -> Config:
    """Reference parity only: JAX fields are device-resident by default."""
    return Config(on_device=bool(on))
