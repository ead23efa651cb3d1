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
import re


def _is_tpu_lane(mark_expr: str) -> bool:
    """True only when the -m expression *selects* tpu tests (e.g. "tpu" or
    "tpu and foo"), not when it excludes them ("not tpu") — a substring test
    would route the default suite onto the real accelerator (ADVICE r2)."""
    if not mark_expr:
        return False
    if re.search(r"\bnot\s+tpu\b", mark_expr):
        return False
    return re.search(r"\btpu\b", mark_expr) is not None


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: exercises the real TPU backend (run with -m tpu)"
    )
    config.addinivalue_line(
        "markers", "slow: takes >30s on this 1-core host (deselect with -m 'not slow')"
    )
    if _is_tpu_lane(config.getoption("-m") or ""):
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

    # CPU lanes: the persistent compilation cache is OFF entirely. (De)
    # serializing certain sharded CPU executables segfaults the process on
    # this host — first in put_executable_and_time during the write, then,
    # once a poisoned entry exists, in get_executable_and_time on every
    # read (observed 2026-08-21, killed the slow lane three times). CPU
    # compiles are seconds here; the cache exists for the remote-compiled
    # TPU programs, which the TPU lane keeps (TPU cache keys never collide
    # with CPU ones — the platform is part of the key).
    jax.config.update("jax_enable_compilation_cache", False)

    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
