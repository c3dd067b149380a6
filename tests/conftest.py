"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths (msst_tpu.parallel) are exercised without TPU pods.

Note: in some environments a site hook registers a TPU plugin at interpreter
startup and forces ``jax_platforms``; we override via jax.config (which wins
over the env var) and set the host-device-count XLA flag before the CPU
backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

_TEST_COUNT = 0


@pytest.fixture(autouse=True)
def _periodic_cache_clear():
    """Drop compiled-program caches every ~40 tests.

    With ~120+ live compiled CPU executables in one process, XLA:CPU's
    compiler segfaults deterministically partway through the suite
    (backend_compile_and_load, observed twice at the same test index on
    jaxlib 0.9 — once solo, once under load).  Periodically releasing the
    executables keeps the process well under that threshold; the handful of
    recompiles costs far less than the suite's long tests."""
    global _TEST_COUNT
    _TEST_COUNT += 1
    # round 3 added several very large programs (multisession collectives,
    # 2k-pose CG, incremental-map pipelines): 40 was no longer low enough
    # (segfault reproduced mid-suite in the parallel block)
    if _TEST_COUNT % 25 == 0:
        jax.clear_caches()
    yield
