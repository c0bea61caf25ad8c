"""Library init/finalise + environment-driven behavior.

Reference behavior: atlas library/Library.cc:132-251 — initialise()/finalise(),
env vars (ATLAS_TRACE, ATLAS_TRACE_BARRIERS, ATLAS_LOG_RANK, ATLAS_CACHE_PATH,
ATLAS_LINALG_*_BACKEND), and Library::information() capability report.

Env vars here:
  ATLAS_TPU_CACHE_PATH      setup-product cache directory (io/cache.py)
  ATLAS_TPU_TRACE_BARRIERS  device-sync barriers around Trace scopes
  ATLAS_TPU_LOG / _DEBUG    logging level (runtime/log.py)
"""

from __future__ import annotations

import os

_initialised = False


def initialise(**config) -> None:
    """Initialise the library (idempotent): jax backend + caches."""
    global _initialised
    if _initialised:
        return
    try:
        import jax

        if config.get("compilation_cache", True):
            cache_dir = os.path.join(
                os.environ.get(
                    "ATLAS_TPU_CACHE_PATH",
                    os.path.join(os.path.expanduser("~"), ".cache", "atlas_tpu"),
                ),
                "jaxcache",
            )
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        if "platform" in config:
            jax.config.update("jax_platforms", config["platform"])
    except ImportError:
        pass
    _initialised = True


def finalise() -> None:
    global _initialised
    _initialised = False


def initialised() -> bool:
    return _initialised


def information() -> str:
    """Capability/version report (reference Library::information())."""
    import atlas_tpu

    lines = [f"atlas_tpu {atlas_tpu.__version__}"]
    try:
        import jax

        lines.append(f"jax {jax.__version__}")
        try:
            lines.append(f"devices: {jax.devices()}")
        except Exception as e:
            lines.append(f"devices: unavailable ({e})")
    except ImportError:
        lines.append("jax: not available")
    import numpy

    lines.append(f"numpy {numpy.__version__}")
    from .native import _get_lib

    lines.append(f"native zipper: {'compiled' if _get_lib() is not None else 'python fallback'}")
    lines.append(
        "cache path: "
        + os.environ.get(
            "ATLAS_TPU_CACHE_PATH", os.path.join(os.path.expanduser("~"), ".cache", "atlas_tpu")
        )
    )
    return "\n".join(lines)


def enable_floating_point_exceptions(enable: bool = True) -> None:
    """Trap invalid/overflow/divide-by-zero.

    Reference behavior: atlas library/FloatingPointExceptions.cc traps
    FE_INVALID etc. with signal-handler stacktraces. The TPU analog: numpy
    raises on host math, and jax_debug_nans re-runs offending jitted
    computations un-jitted to localize the NaN/Inf producer.
    """
    import numpy as np

    if enable:
        np.seterr(invalid="raise", divide="raise", over="raise")
    else:
        np.seterr(all="warn")
    try:
        import jax

        jax.config.update("jax_debug_nans", enable)
    except ImportError:
        pass


_plugins: dict = {}


def load_plugin(name: str):
    """Import a plugin module; its import side effects register new grids /
    partitioners / interpolation methods with the factories.

    Reference behavior: atlas library/Plugin.h + ATLAS_PLUGIN_PATH — external
    libraries add factory builders at load time. Here a plugin is any
    importable module (also searched under $ATLAS_TPU_PLUGIN_PATH).
    """
    import importlib
    import sys

    if name in _plugins:
        return _plugins[name]
    path = os.environ.get("ATLAS_TPU_PLUGIN_PATH")
    if path:
        for p in path.split(os.pathsep):
            if p and p not in sys.path:
                sys.path.insert(0, p)
    mod = importlib.import_module(name)
    _plugins[name] = mod
    return mod


def plugins() -> dict:
    return dict(_plugins)
