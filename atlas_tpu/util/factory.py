"""Named self-registering factories, the equivalent of atlas util::Factory.

Reference behavior (util/Factory.h, util/Registry.h): every polymorphic family
(grid types, partitioners, mesh generators, interpolation methods, trans
backends, projections, spacings) is a registry of builders keyed by a string
``type`` found in a Config.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List


class Factory:
    """A registry of named builders for one family of objects."""

    _families: Dict[str, "Factory"] = {}

    def __init__(self, family: str):
        self.family = family
        self._builders: Dict[str, Callable[..., Any]] = {}
        Factory._families[family] = self

    @classmethod
    def family(cls, name: str) -> "Factory":
        if name not in cls._families:
            cls._families[name] = Factory.__new__(Factory)
            cls._families[name].family = name
            cls._families[name]._builders = {}
        return cls._families[name]

    def register(self, name: str, builder: Callable[..., Any] | None = None):
        """Register a builder, usable as a decorator."""

        def do_register(b):
            self._builders[name] = b
            return b

        if builder is None:
            return do_register
        return do_register(builder)

    def has(self, name: str) -> bool:
        return name in self._builders

    def keys(self) -> List[str]:
        return sorted(self._builders)

    def build(self, name: str, *args: Any, **kwargs: Any) -> Any:
        if name not in self._builders:
            raise KeyError(
                f"No {self.family} named {name!r} registered. "
                f"Available: {', '.join(self.keys())}"
            )
        return self._builders[name](*args, **kwargs)
