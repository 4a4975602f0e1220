"""Platform helpers: choose CPU vs TPU explicitly.

This machine routes JAX to a remote TPU through the `axon` PJRT plugin and
its sitecustomize pins JAX_PLATFORMS=axon, so `jax.config.update` (not the
env var) is the reliable switch. Call `force_cpu()` before any jax backend
use to run host-side (tests, golden references); do nothing to run on TPU.
"""

from __future__ import annotations

import os


def force_cpu(virtual_devices: int = 0) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if virtual_devices and "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={virtual_devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def on_tpu() -> bool:
    import jax

    return jax.default_backend() not in ("cpu",)
