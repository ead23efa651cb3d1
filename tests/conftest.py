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

    # CPU lanes: disable persistent-cache WRITES (reads stay on). Serializing
    # certain sharded CPU executables for the cache segfaults the process on
    # this host (jax compilation_cache.put_executable_and_time — observed
    # 2026-08-21 killing the slow lane twice, SIGSEGV inside the cache write
    # after the compile succeeded). CPU compiles are seconds here; the cache
    # only pays off for the remote-compiled TPU programs, which the TPU lane
    # keeps.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)

    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
