"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference test strategy (SURVEY.md section 4): serial math checked
against analytic/golden values; distributed behavior exercised at small "rank"
counts — here virtual CPU devices standing in for TPU chips.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
