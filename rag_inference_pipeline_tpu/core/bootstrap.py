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
        # (observed: full-suite abort in get_executable_and_time). When no
        # platform env var is set (plugin autodetect), key on the PJRT
        # plugin library path instead of a shared 'default' bucket.
        backend_key = (
            platform
            or os.environ.get("JAX_PLATFORMS")
            or os.path.basename(os.environ.get("PJRT_LIBRARY_PATH", ""))
            or "default"
        )
        cache = os.path.join(cache, backend_key)
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _patch_atomic_cache_writes()
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        logger.debug("compilation cache setup failed", exc_info=True)


def _patch_atomic_cache_writes() -> None:
    """Make persistent-cache entry writes atomic (tmp file + os.replace).

    jax's LRUCache.put writes entries with Path.write_bytes — a concurrent
    reader in another process can observe a truncated entry, which SIGABRTs
    deep in XLA executable deserialization. Writing to a pid-unique temp in
    the same directory and renaming closes that window: POSIX rename is
    atomic, so readers see either no entry or a complete one. Keyed-dir
    segregation (above) narrows exposure; this removes it.
    """
    try:
        from jax._src import lru_cache as _lru

        if getattr(_lru.LRUCache.put, "_ragtpu_atomic", False):
            return
        suffix = _lru._CACHE_SUFFIX
        atime_suffix = getattr(_lru, "_ATIME_SUFFIX", None)

        def _atomic_put(self, key: str, val: bytes) -> None:
            if not key:
                raise ValueError("key cannot be empty")
            if self.eviction_enabled and len(val) > self.max_size:
                logger.warning(
                    "cache value for %r (%d bytes) exceeds max cache size",
                    key, len(val),
                )
                return
            cache_path = self.path / f"{key}{suffix}"
            if self.eviction_enabled:
                self.lock.acquire(timeout=self.lock_timeout_secs)
            try:
                if cache_path.exists():
                    return
                self._evict_if_needed(additional_size=len(val))
                tmp = self.path / f".{key}.{os.getpid()}.tmp"
                tmp.write_bytes(val)
                os.replace(tmp, cache_path)
                if self.eviction_enabled and atime_suffix is not None:
                    import time as _time

                    (self.path / f"{key}{atime_suffix}").write_bytes(
                        _time.time_ns().to_bytes(8, "little")
                    )
            finally:
                if self.eviction_enabled:
                    self.lock.release()

        _atomic_put._ragtpu_atomic = True  # type: ignore[attr-defined]
        _lru.LRUCache.put = _atomic_put
    except Exception:  # noqa: BLE001 — fall back to stock writes
        logger.debug("atomic cache-write patch not applied", exc_info=True)
