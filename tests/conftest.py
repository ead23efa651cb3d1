"""Test configuration.

Default lane: force CPU with 8 virtual devices so multi-chip sharding paths
compile and execute without TPU hardware. (The environment pre-registers a
TPU PJRT plugin via sitecustomize before conftest runs, so plain env vars
are too late — reset the backend through jax.config instead.)

TPU lane (`pytest -m tpu`): keep the environment's real accelerator backend;
tests marked `tpu` validate MXU/bf16 numerics and real-device behavior the
CPU suite can't see (they self-skip when the backend isn't a TPU).
"""

import os


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: exercises the real TPU backend (run with -m tpu)"
    )
    if "tpu" in (config.getoption("-m") or ""):
        return  # keep the real accelerator backend

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb

        _xb._clear_backends()

    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
