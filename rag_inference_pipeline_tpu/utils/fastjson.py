"""ctypes wrapper for the native JSON codec (native/fastjson.cc) — the
orjson/msgspec role on the /retrieve hot path.

The reference pays orjson + msgspec for its service wire
(src/pipeline/utils/rpc_client.py:122-126, requirements.txt); neither is
installable in this image, and stdlib json + pydantic costs 284 ms per
batch-512 JSON-wire request (PERF_NOTES "Serve-layer ceiling" — the whole
785 QPS cap). The native codec parses the strict reference-parity
retrieve-by-embedding shape straight into a preallocated f32 matrix and
encodes id_only responses from packed arrays.

Fallback contract: `parse_retrieve` returns None for ANYTHING outside the
strict shape (non-empty query, missing embedding, dim mismatch, b64 fields,
malformed JSON, unicode-escaped keys, NaN literals...). The caller then
runs the stdlib+pydantic path, so observable behavior — every 400
included — is identical; the fast path only accelerates requests the slow
path would accept with the same result. Differential-fuzzed against stdlib
in tests/test_fastjson.py.

Builds the shared library on demand via `make -C native` (same pattern as
utils/docstore.py / utils/cpuscan.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import NamedTuple, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libragfastjson.so")

_lib: Optional[ctypes.CDLL] = None
_lock = threading.Lock()

_F32P = ctypes.POINTER(ctypes.c_float)
_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_int64)


def load_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "fastjson.cc")
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(src)
            and os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
        ):
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
        lib.fj_parse_retrieve.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            _F32P, _I32P, ctypes.c_int64, _I64P, _I32P,
        ]
        lib.fj_parse_retrieve.restype = ctypes.c_int
        lib.fj_encode_results.argtypes = [
            _I64P, _F32P, _I64P, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.fj_encode_results.restype = ctypes.c_int64
        _lib = lib
        return lib


class ParsedRetrieve(NamedTuple):
    embeddings: np.ndarray  # [n, dim] f32
    item_k: np.ndarray  # [n] i32, -1 = absent
    rerank: bool
    k: Optional[int]  # top-level default k
    response_format: str  # "json" | "b64"


# itemless b64 requests are ~100 bytes; a JSON-wire request is >= ~8 bytes
# per float. Batches past this cap fall back (the slow path has no cap).
_MAX_ITEMS = 4096


def parse_retrieve(body: bytes, dim: int) -> Optional[ParsedRetrieve]:
    """Parse a /retrieve JSON body on the strict fast path, or None to
    signal the stdlib+pydantic fallback. `body` must be bytes (Python bytes
    are NUL-terminated internally, which the native strtod relies on)."""
    if dim <= 0 or not body or len(body) < 2:
        return None
    # cheap upper bound on items: every item costs >= 2 bytes
    max_items = min(_MAX_ITEMS, max(1, len(body) // (dim * 2)))
    try:
        lib = load_lib()
    except (OSError, subprocess.CalledProcessError):
        return None
    emb = np.empty((max_items, dim), np.float32)
    item_k = np.empty((max_items,), np.int32)
    n_out = ctypes.c_int64(-1)
    top = (ctypes.c_int32 * 3)()
    rc = lib.fj_parse_retrieve(
        body, len(body), dim,
        emb.ctypes.data_as(_F32P), item_k.ctypes.data_as(_I32P),
        max_items, ctypes.byref(n_out), top,
    )
    if rc != 0:
        return None
    n = n_out.value
    return ParsedRetrieve(
        embeddings=emb[:n],
        item_k=item_k[:n],
        rerank=bool(top[0]),
        k=None if top[1] < 0 else int(top[1]),
        response_format="b64" if top[2] == 1 else "json",
    )


def encode_results(results: list[dict]) -> Optional[bytes]:
    """Encode [{'ids': [...], 'scores': [...]}] as the id_only JSON
    response, or None if any result carries more than ids+scores (documents
    / compressed payload modes keep the pydantic path)."""
    offsets = np.empty((len(results) + 1,), np.int64)
    offsets[0] = 0
    for i, r in enumerate(results):
        if not isinstance(r, dict) or any(
            k not in ("ids", "scores") and r[k] is not None for k in r
        ):
            return None
        ids = r.get("ids")
        scores = r.get("scores")
        if ids is None or scores is None or len(ids) != len(scores):
            return None
        offsets[i + 1] = offsets[i] + len(ids)
    total = int(offsets[-1])
    ids_flat = np.empty((total,), np.int64)
    scores_flat = np.empty((total,), np.float32)
    for i, r in enumerate(results):
        ids_flat[offsets[i]:offsets[i + 1]] = r["ids"]
        scores_flat[offsets[i]:offsets[i + 1]] = r["scores"]
    try:
        lib = load_lib()
    except (OSError, subprocess.CalledProcessError):
        return None
    # worst case: id 20 chars + comma, score 16 + comma, brackets/keys ~32
    cap = 64 + len(results) * 40 + total * 40
    out = ctypes.create_string_buffer(cap)
    n = lib.fj_encode_results(
        ids_flat.ctypes.data_as(_I64P), scores_flat.ctypes.data_as(_F32P),
        offsets.ctypes.data_as(_I64P), len(results), out, cap,
    )
    if n < 0:
        return None
    return out.raw[:n]
