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
