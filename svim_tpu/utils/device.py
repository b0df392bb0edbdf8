"""Device/backend selection helpers.

The array path runs on whatever jax.devices() provides (TPU in production,
CPU in tests).  A persistent compilation cache keeps TPU compile times to the
first run only.
"""

from __future__ import annotations

import logging
import os

_CACHE_INITIALIZED = False


def setup_jax_cache(cache_dir: str = None):
    """Enable the persistent XLA compilation cache (idempotent)."""
    global _CACHE_INITIALIZED
    if _CACHE_INITIALIZED:
        return
    import jax
    cache_dir = cache_dir or os.path.join(os.path.expanduser("~"), ".svim_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _CACHE_INITIALIZED = True
    except Exception as error:  # older jax without the knobs
        logging.debug("could not enable jax compilation cache: %s", error)


def select_backend(device_backend: str = "auto"):
    """Honor --device_backend before jax runs its first computation.

    Note: the axon TPU plugin ignores the JAX_PLATFORMS env var, so the
    platform is pinned through the config API."""
    import jax
    if device_backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    setup_jax_cache()


def describe_devices() -> str:
    import jax
    return ", ".join(str(device) for device in jax.devices())
