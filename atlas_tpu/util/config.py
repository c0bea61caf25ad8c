"""Key-value configuration, the equivalent of atlas util::Config.

Reference behavior (util/Config.h:38): JSON/YAML-backed dict with `operator|`
merging; consumed by every named factory. Here it is a thin dict subclass with
attribute-ish helpers and `|` merging (right-hand side wins, like atlas).
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Mapping


class Config(dict):
    """A dict with atlas-style `|` merging and typed getters.

    >>> c = Config(type="structured") | Config(halo=2)
    >>> c.get_int("halo")
    2
    """

    def __init__(self, *args: Any, **kwargs: Any):
        if len(args) == 2 and not kwargs and isinstance(args[0], str):
            # Config("key", value) shorthand, as in atlas
            super().__init__({args[0]: args[1]})
        else:
            super().__init__(*args, **kwargs)

    # -- merging ---------------------------------------------------------
    def __or__(self, other: Mapping[str, Any]) -> "Config":
        merged = Config(self)
        merged.update(other)
        return merged

    def __ror__(self, other: Mapping[str, Any]) -> "Config":
        merged = Config(other)
        merged.update(self)
        return merged

    def set(self, key: str, value: Any) -> "Config":
        self[key] = value
        return self

    # -- typed getters ---------------------------------------------------
    def get_int(self, key: str, default: int | None = None) -> int:
        return int(self._get(key, default))

    def get_float(self, key: str, default: float | None = None) -> float:
        return float(self._get(key, default))

    def get_bool(self, key: str, default: bool | None = None) -> bool:
        return bool(self._get(key, default))

    def get_str(self, key: str, default: str | None = None) -> str:
        return str(self._get(key, default))

    def get_config(self, key: str, default: "Config | None" = None) -> "Config":
        value = self._get(key, default if default is not None else Config())
        return value if isinstance(value, Config) else Config(value)

    def _get(self, key: str, default: Any) -> Any:
        if key in self:
            return self[key]
        if default is None:
            raise KeyError(f"Config has no key {key!r} and no default given")
        return default

    # -- (de)serialization ----------------------------------------------
    def json(self) -> str:
        return json.dumps(self, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        return cls(json.loads(text))

    @classmethod
    def from_file(cls, path: str) -> "Config":
        with open(path) as f:
            text = f.read()
        try:
            return cls.from_json(text)
        except json.JSONDecodeError:
            import yaml  # lazy; PyYAML ships with jax deps

            return cls(yaml.safe_load(text))


class NoConfig(Config):
    pass


def merge(configs: Iterable[Mapping[str, Any]]) -> Config:
    out = Config()
    for c in configs:
        out.update(c)
    return out
