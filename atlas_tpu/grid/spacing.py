"""1-D point spacings (reference: atlas grid/detail/spacing/*).

A Spacing produces an array of coordinates. Types: linear, gaussian, custom,
focus — built from a Config with a "type" key, like the reference's factory.
"""

from __future__ import annotations

import numpy as np

from ..util.config import Config
from ..util.factory import Factory
from .gaussian import gaussian_latitudes_npole_spole

spacing_factory = Factory("spacing")


class Spacing:
    """Immutable array of coordinates with interval metadata."""

    type: str = "none"

    def __init__(self, values: np.ndarray, start: float, end: float):
        self._values = np.asarray(values, dtype=np.float64)
        self.start = float(start)
        self.end = float(end)

    @property
    def values(self) -> np.ndarray:
        return self._values

    def __len__(self) -> int:
        return len(self._values)

    def __getitem__(self, i):
        return self._values[i]

    def __array__(self, dtype=None):
        return self._values.astype(dtype) if dtype else self._values

    @property
    def min(self) -> float:
        return float(self._values.min())

    @property
    def max(self) -> float:
        return float(self._values.max())

    @staticmethod
    def create(config: Config | dict) -> "Spacing":
        config = Config(config)
        return spacing_factory.build(config.get_str("type"), config)


@spacing_factory.register("linear")
class LinearSpacing(Spacing):
    """N evenly spaced points from start to end (endpoint included by default).

    Reference: grid/detail/spacing/LinearSpacing.cc. With endpoint=False the
    interval is divided into N cells and the last point is end - step.
    """

    type = "linear"

    def __init__(self, config=None, *, start=None, end=None, N=None, endpoint=True):
        if config is not None:
            config = Config(config)
            start = config.get_float("start")
            end = config.get_float("end")
            N = config.get_int("N")
            endpoint = config.get_bool("endpoint", True)
        values = np.linspace(start, end, N, endpoint=endpoint)
        super().__init__(values, start, end)
        self.endpoint = endpoint
        n_intervals = N - 1 if endpoint else N
        self.step = (end - start) / n_intervals if n_intervals else 0.0


@spacing_factory.register("gaussian")
class GaussianSpacing(Spacing):
    """N Gaussian latitudes from start to end (±90 ordering only).

    Reference: grid/detail/spacing/GaussianSpacing.cc — N must be even;
    start=90, end=-90 gives npole->spole ordering.
    """

    type = "gaussian"

    def __init__(self, config=None, *, N=None, start=90.0, end=-90.0):
        if config is not None:
            config = Config(config)
            N = config.get_int("N")
            start = config.get_float("start", 90.0)
            end = config.get_float("end", -90.0)
        if N % 2 != 0:
            raise ValueError("Gaussian spacing requires even N")
        lats = gaussian_latitudes_npole_spole(N)
        if start < end:  # south-to-north ordering
            lats = lats[::-1]
        super().__init__(lats, start, end)


@spacing_factory.register("custom")
class CustomSpacing(Spacing):
    type = "custom"

    def __init__(self, config=None, *, values=None):
        if config is not None:
            config = Config(config)
            values = np.asarray(config["values"], dtype=np.float64)
        values = np.asarray(values, dtype=np.float64)
        super().__init__(values, values[0], values[-1])


@spacing_factory.register("focus")
class FocusSpacing(Spacing):
    """Focused spacing: points concentrated around the interval midpoint.

    Reference: grid/detail/spacing/FocusSpacing.cc — x_i = mid +
    (end-start)/pi * atan(tan(pi x2 / 2) / focus_factor) over x2 in [-1, 1];
    focus_factor > 1 concentrates resolution at the midpoint.
    """

    def __init__(self, config=None, *, start=None, end=None, N=None,
                 focus_factor=None):
        if config is not None:
            start = config["start"] if start is None else start
            end = config["end"] if end is None else end
            N = config["N"] if N is None else N
            focus_factor = (config["focus_factor"]
                            if focus_factor is None else focus_factor)
        N = int(N)
        start, end = float(start), float(end)
        ff = float(focus_factor)
        if N == 1:
            vals = np.array([0.5 * (start + end)])
        else:
            x2 = -1.0 + 2.0 * np.arange(N) / (N - 1)
            mid = 0.5 * (start + end)
            vals = mid + (end - start) / np.pi * np.arctan(
                np.tan(0.5 * np.pi * x2) / ff)
            vals[0], vals[-1] = start, end
        super().__init__(vals, start, end)
