"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference test strategy (SURVEY.md section 4): serial math checked
against analytic/golden values; distributed behavior exercised at small "rank"
counts — here virtual CPU devices standing in for TPU chips.

NOTE: the session environment pins JAX_PLATFORMS=axon (one real TPU chip via a
tunnel) and a sitecustomize hook pre-imports jax, so the env var cannot be
overridden from here; jax.config.update("jax_platforms") after import is the
reliable switch. The real chip is reserved for bench.py.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
