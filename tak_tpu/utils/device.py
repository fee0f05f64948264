"""Device/runtime helpers (reference: alpha-tak/src/lib.rs:21-38)."""

from __future__ import annotations

import os
import time


def use_tpu() -> bool:
    """Probe for TPU devices (the `use_cuda()` analog, lib.rs:27-30)."""
    import jax

    try:
        return any(d.platform.startswith("tpu") for d in jax.devices())
    except RuntimeError:
        return False


def force_cpu() -> None:
    """Pin JAX to CPU; call before any computation.

    NB: the env var alone is not reliably honored when a TPU plugin is
    registered — the config update is what actually works.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def setup_performance_defaults() -> None:
    """Persistent compile cache + TPU-native PRNG (measured wins).

    `TAK_COMPILE_CACHE` overrides the cache directory — point it at an
    empty dir to measure true warm-from-cold compile budgets (docs/CI.md)
    without invalidating the production cache."""
    import jax

    cache = (os.environ.get("TAK_COMPILE_CACHE")
             or os.path.expanduser("~/.jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl", "rbg")


def sys_time() -> int:
    """Unix seconds, used to name artifacts (lib.rs:33-38)."""
    return int(time.time())
