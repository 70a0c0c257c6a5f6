"""LRU caches with TTL + Prometheus counters, and a compressed variant.

Parity with reference utils/cache.py:20-118 (OrderedDict LRU, TTL, pre-bound
hit/miss/eviction counters; compressed variant stores serialized+compressed
blobs). Compression here is zstd (lz4 not in the image; same role).
"""

from __future__ import annotations

import json
import threading
import time
from collections import OrderedDict
from typing import Any, Optional

import zstandard

from ..telemetry.metrics import CACHE_EVENTS


class LRUCache:
    """Thread-safe LRU with optional TTL and metrics."""

    def __init__(
        self,
        capacity: int,
        *,
        ttl_s: Optional[float] = None,
        name: str = "cache",
        run_id: str = "dev",
        node: str = "0",
    ) -> None:
        if capacity <= 0:
            raise ValueError("capacity must be positive")
        self.capacity = capacity
        self.ttl_s = ttl_s
        self._data: OrderedDict[Any, tuple[float, Any]] = OrderedDict()
        self._lock = threading.Lock()
        self._hits = CACHE_EVENTS.labels(run_id, node, name, "hit")
        self._misses = CACHE_EVENTS.labels(run_id, node, name, "miss")
        self._evictions = CACHE_EVENTS.labels(run_id, node, name, "eviction")

    def get(self, key) -> Optional[Any]:
        with self._lock:
            item = self._data.get(key)
            if item is None:
                self._misses.inc()
                return None
            ts, value = item
            if self.ttl_s is not None and time.monotonic() - ts > self.ttl_s:
                del self._data[key]
                self._misses.inc()
                return None
            self._data.move_to_end(key)
            self._hits.inc()
            return value

    def put(self, key, value) -> None:
        with self._lock:
            if key in self._data:
                self._data.move_to_end(key)
            self._data[key] = (time.monotonic(), value)
            while len(self._data) > self.capacity:
                self._data.popitem(last=False)
                self._evictions.inc()

    def clear(self) -> None:
        with self._lock:
            self._data.clear()

    def __len__(self) -> int:
        with self._lock:
            return len(self._data)

    def __contains__(self, key) -> bool:
        with self._lock:
            return key in self._data


class CompressedLRUCache(LRUCache):
    """LRU storing zstd-compressed JSON blobs (reference cache.py:89-118).

    zstd contexts are not safe for concurrent use across threads, so
    (de)compressors are thread-local.
    """

    def __init__(self, capacity: int, *, level: int = 3, **kwargs) -> None:
        super().__init__(capacity, **kwargs)
        self._level = level
        self._tls = threading.local()

    def _codecs(self):
        if not hasattr(self._tls, "comp"):
            self._tls.comp = zstandard.ZstdCompressor(level=self._level)
            self._tls.decomp = zstandard.ZstdDecompressor()
        return self._tls.comp, self._tls.decomp

    def put(self, key, value) -> None:
        comp, _ = self._codecs()
        super().put(key, comp.compress(json.dumps(value).encode()))

    def get(self, key) -> Optional[Any]:
        blob = super().get(key)
        if blob is None:
            return None
        _, decomp = self._codecs()
        return json.loads(decomp.decompress(blob))
