"""Payload compression for DCN (cross-host) hops.

Reference parity: RPCClient body compression + CompressionMiddleware
decompression (reference rpc_client.py:134-147, middleware.py:82-169),
including magic-number sniffing before decompress (rpc_client.py:199-205)
and ratio telemetry. zstd only (lz4 absent from the image; on-ICI hops never
serialize at all — SURVEY.md section 2.6).
"""

from __future__ import annotations

import base64
import json
from typing import Any, Optional

import zstandard

from ..telemetry.metrics import COMPRESSION_RATIO

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"

# zstd contexts are NOT safe for concurrent use from multiple threads (the C
# context mutates with the GIL released); executor threads and the event
# loop both compress, so contexts are per-thread
_tls = __import__("threading").local()


def _compressor(level: int) -> zstandard.ZstdCompressor:
    cache = getattr(_tls, "compressors", None)
    if cache is None:
        cache = _tls.compressors = {}
    if level not in cache:
        cache[level] = zstandard.ZstdCompressor(level=level)
    return cache[level]


def _get_decompressor() -> zstandard.ZstdDecompressor:
    d = getattr(_tls, "decompressor", None)
    if d is None:
        d = _tls.decompressor = zstandard.ZstdDecompressor()
    return d


def compress(
    data: bytes,
    *,
    level: int = 3,
    min_bytes: int = 512,
    run_id: str = "dev",
    node: str = "0",
    direction: str = "out",
) -> tuple[bytes, bool]:
    """Compress if worthwhile. Returns (payload, was_compressed)."""
    if len(data) < min_bytes:
        return data, False
    out = _compressor(level).compress(data)
    if len(out) >= len(data):
        return data, False
    COMPRESSION_RATIO.labels(run_id, node, direction).observe(
        len(data) / max(1, len(out))
    )
    return out, True


def decompress(data: bytes) -> bytes:
    """Sniff the zstd magic and decompress when present."""
    if data[:4] == ZSTD_MAGIC:
        return _get_decompressor().decompress(data)
    return data


def pack_docs(docs: list[dict], *, level: int = 3) -> str:
    """Documents -> b64(zstd(json)) for the `compressed` payload mode
    (reference retrieval/api.py:517-523)."""
    blob = _compressor(level).compress(json.dumps(docs).encode())
    return base64.b64encode(blob).decode()


def unpack_docs(b64: str) -> list[dict]:
    return json.loads(_get_decompressor().decompress(base64.b64decode(b64)))
