"""Process bootstrap: env guards + persistent compilation cache.

The analog of the reference's _bootstrap.py (env-var dance before native
imports, reference src/pipeline/_bootstrap.py:17-31). On TPU the expensive
startup cost is XLA compilation, not OpenMP init — so the critical knob here
is the persistent compilation cache: node restarts and experiment sweeps
reuse compiled programs instead of paying 20-40 s per novel program (and
much more when the remote compile service is loaded).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT_CACHE_DIR = os.environ.get(
    "RAGTPU_COMPILE_CACHE", os.path.expanduser("~/.cache/ragtpu_xla")
)


def bootstrap(cache_dir: str | None = None) -> None:
    """Idempotent. Call before the first jax use in entry points."""
    os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
    cache = cache_dir or _DEFAULT_CACHE_DIR
    try:
        import jax

        # DEVICE_PLATFORM=cpu forces the CPU backend (the JAX_PLATFORMS env
        # var alone does not displace an installed TPU plugin); used by tests
        # and CPU-mode experiments.
        platform = os.environ.get("DEVICE_PLATFORM")
        if platform:
            os.environ.pop("JAX_PLATFORMS", None)
            jax.config.update("jax_platforms", platform)
            if platform == "cpu" and "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
                n = os.environ.get("RAGTPU_CPU_DEVICES")
                if n:
                    os.environ["XLA_FLAGS"] = (
                        os.environ.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n}"
                    ).strip()

        # Segregate the cache by backend: CPU test runs and TPU bench runs
        # previously shared one directory, and concurrent novel compiles
        # from two processes can race a cache entry — a truncated entry
        # SIGABRTs inside XLA executable deserialization on the next read
        # (observed: full-suite abort in get_executable_and_time).
        cache = os.path.join(
            cache, platform or os.environ.get("JAX_PLATFORMS", "default")
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        logger.debug("compilation cache setup failed", exc_info=True)
