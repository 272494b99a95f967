"""JAX environment setup helpers.

This image's sitecustomize imports jax at interpreter startup (to register
the axon TPU backend), so environment variables set later are ignored by
jax's config defaults. These helpers apply the settings through
jax.config.update, which works at any point before backend/compile use.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = os.path.expanduser("~/.cache/jax_comp_cache")


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent compilation cache (compiles here are expensive:
    ~0.65 s/kernel on CPU, minutes per program through the TPU remote-compile
    tunnel)."""
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_CACHE)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)


def force_cpu(n_devices: int | None = None) -> None:
    """Route this process to the CPU backend (optionally with n virtual
    devices). Must run before the first backend use."""
    import jax

    if n_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
    jax.config.update("jax_platforms", "cpu")
