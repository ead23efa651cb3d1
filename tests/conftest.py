"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware.

This environment pre-registers a TPU PJRT plugin via sitecustomize before
conftest runs, so plain env vars are too late — reset the backend through
jax.config instead.
"""

import os

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb

    _xb._clear_backends()

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
