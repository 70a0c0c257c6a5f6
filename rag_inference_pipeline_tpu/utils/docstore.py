"""Document store component: id -> {title, content} with batch fetch,
truncation, and caching.

Reference parity (src/pipeline/components/document_store.py): thread-safe
reads, batch id fetch, `truncate_length` semantics, in-RAM clone option,
CompressedLRUCache of doc dicts. Backends:

- `native`: C++ mmap arena + open-addressing hash (native/docstore.cc),
  loaded via ctypes — the first-party native replacement for sqlite's C core.
- `sqlite`: stdlib sqlite3, schema-compatible with the reference's
  documents.db (`documents(id, title, content)`).
- `memory`: dict, for tests.
"""

from __future__ import annotations

import ctypes
import logging
import os
import sqlite3
import subprocess
import threading
from typing import Optional, Sequence

from ..core.config import Settings
from ..utils.cache import CompressedLRUCache

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libragdocstore.so")
_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _load_native_lib() -> ctypes.CDLL:
    """Build (once, via make) and dlopen the native docstore library."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "docstore.cc")
        # rebuild when missing OR older than the source (same staleness
        # rule as utils/cpuscan.py — a binary never outlives its source)
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
        lib.ds_build.restype = ctypes.c_int
        lib.ds_build.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.ds_open.restype = ctypes.c_void_p
        lib.ds_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.ds_close.argtypes = [ctypes.c_void_p]
        lib.ds_count.restype = ctypes.c_int64
        lib.ds_count.argtypes = [ctypes.c_void_p]
        lib.ds_get_batch.restype = ctypes.c_int64
        # out-pointer arrays are declared void* (ABI-identical to char*):
        # indexing a c_char_p array would make ctypes scan for a NUL
        # terminator through the (unterminated) arena — pathologically slow.
        lib.ds_get_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return lib


def build_native_store(
    path: str, docs: Sequence[tuple[int, str, str]]
) -> None:
    """Write a native store file from (id, title, content) rows."""
    lib = _load_native_lib()
    n = len(docs)
    ids = (ctypes.c_int64 * n)(*[d[0] for d in docs])
    t_bytes = [d[1].encode() for d in docs]
    c_bytes = [d[2].encode() for d in docs]
    titles = (ctypes.c_char_p * n)(*t_bytes)
    contents = (ctypes.c_char_p * n)(*c_bytes)
    t_lens = (ctypes.c_int32 * n)(*[len(b) for b in t_bytes])
    c_lens = (ctypes.c_int32 * n)(*[len(b) for b in c_bytes])
    rc = lib.ds_build(path.encode(), ids, titles, t_lens, contents, c_lens, n)
    if rc != 0:
        raise RuntimeError(f"ds_build failed with code {rc} (duplicate id? {rc == -2})")


class _NativeBackend:
    def __init__(self, path: str, populate: bool) -> None:
        self.lib = _load_native_lib()
        self.handle = self.lib.ds_open(path.encode(), 1 if populate else 0)
        if not self.handle:
            raise FileNotFoundError(f"cannot open native doc store at {path}")

    def count(self) -> int:
        return int(self.lib.ds_count(self.handle))

    def get_batch(self, ids: Sequence[int]) -> list[Optional[dict]]:
        n = len(ids)
        c_ids = (ctypes.c_int64 * n)(*ids)
        titles = (ctypes.c_void_p * n)()
        contents = (ctypes.c_void_p * n)()
        t_lens = (ctypes.c_int32 * n)()
        c_lens = (ctypes.c_int32 * n)()
        self.lib.ds_get_batch(
            self.handle, c_ids, n, titles, t_lens, contents, c_lens
        )
        out: list[Optional[dict]] = []
        for i in range(n):
            if t_lens[i] < 0:
                out.append(None)
            else:
                t = ctypes.string_at(titles[i], t_lens[i]).decode()
                c = ctypes.string_at(contents[i], c_lens[i]).decode()
                out.append({"id": int(ids[i]), "title": t, "content": c})
        return out

    def close(self) -> None:
        if self.handle:
            self.lib.ds_close(self.handle)
            self.handle = None


class _SqliteBackend:
    """Thread-local connections (reference document_store.py:132-150)."""

    def __init__(self, path: str, in_memory: bool) -> None:
        self.path = path
        self._local = threading.local()
        self._memory_conn: Optional[sqlite3.Connection] = None
        if in_memory:
            # full-DB clone into shared in-memory sqlite via backup()
            # (reference document_store.py:165-193)
            src = sqlite3.connect(path)
            self._memory_conn = sqlite3.connect(
                "file:ragdocs?mode=memory&cache=shared",
                uri=True,
                check_same_thread=False,
            )
            src.backup(self._memory_conn)
            src.close()

    def _conn(self) -> sqlite3.Connection:
        if self._memory_conn is not None:
            return self._memory_conn
        conn = getattr(self._local, "conn", None)
        if conn is None:
            conn = sqlite3.connect(self.path)
            self._local.conn = conn
        return conn

    def count(self) -> int:
        return self._conn().execute("SELECT COUNT(*) FROM documents").fetchone()[0]

    def get_batch(self, ids: Sequence[int]) -> list[Optional[dict]]:
        conn = self._conn()
        qmarks = ",".join("?" * len(ids))
        rows = conn.execute(
            f"SELECT id, title, content FROM documents WHERE id IN ({qmarks})",
            list(ids),
        ).fetchall()
        by_id = {r[0]: {"id": r[0], "title": r[1], "content": r[2]} for r in rows}
        return [by_id.get(i) for i in ids]

    def close(self) -> None:
        if self._memory_conn is not None:
            self._memory_conn.close()


class _MemoryBackend:
    def __init__(self, docs: dict[int, dict]) -> None:
        self.docs = docs

    def count(self) -> int:
        return len(self.docs)

    def get_batch(self, ids: Sequence[int]) -> list[Optional[dict]]:
        return [self.docs.get(i) for i in ids]

    def close(self) -> None:
        pass


def build_sqlite_store(path: str, docs: Sequence[tuple[int, str, str]]) -> None:
    """Reference-schema corpus writer (create_test_docs.py:16-72)."""
    conn = sqlite3.connect(path)
    conn.execute(
        "CREATE TABLE IF NOT EXISTS documents "
        "(id INTEGER PRIMARY KEY, title TEXT, content TEXT)"
    )
    conn.executemany("INSERT OR REPLACE INTO documents VALUES (?,?,?)", docs)
    conn.commit()
    conn.close()


class DocumentStore:
    """The component the services use (reference DocumentStore semantics)."""

    def __init__(
        self,
        settings: Settings,
        *,
        docs: Optional[dict[int, dict]] = None,
    ) -> None:
        self.settings = settings
        self._docs_override = docs
        self._backend = None
        self.cache = CompressedLRUCache(
            settings.document_cache_capacity,
            ttl_s=settings.document_cache_ttl_s,
            name="document",
            run_id=settings.run_id,
            node=str(settings.node_number),
        )

    @property
    def is_loaded(self) -> bool:
        return self._backend is not None

    def load(self) -> None:
        s = self.settings
        if self._docs_override is not None or s.doc_store_backend == "memory":
            self._backend = _MemoryBackend(self._docs_override or {})
        elif s.doc_store_backend == "native":
            if not s.document_db_path:
                raise ValueError("document_db_path required for native doc store")
            self._backend = _NativeBackend(s.document_db_path, s.doc_store_in_memory)
        elif s.doc_store_backend == "sqlite":
            if not s.document_db_path:
                raise ValueError("document_db_path required for sqlite doc store")
            self._backend = _SqliteBackend(s.document_db_path, s.doc_store_in_memory)
        else:
            raise ValueError(f"unknown doc_store_backend {s.doc_store_backend!r}")
        logger.info(
            "doc store loaded: backend=%s count=%d",
            s.doc_store_backend, self._backend.count(),
        )

    def unload(self) -> None:
        if self._backend is not None:
            self._backend.close()
            self._backend = None
        self.cache.clear()

    def count(self) -> int:
        return self._backend.count() if self._backend else 0

    def fetch_documents_batch(
        self, ids: Sequence[int], *, truncate_length: Optional[int] = None
    ) -> list[dict]:
        """Batch fetch with truncation (reference document_store.py:278-302).

        Missing ids produce stub docs (parity with id_only stubs,
        reference retrieval/api.py:443-449).
        """
        if not self.is_loaded:
            raise RuntimeError("document store not loaded")
        tl = truncate_length or self.settings.truncate_length
        out: list[Optional[dict]] = [None] * len(ids)
        misses, miss_pos = [], []
        for pos, i in enumerate(ids):
            hit = self.cache.get(int(i))
            if hit is not None:
                out[pos] = hit
            else:
                misses.append(int(i))
                miss_pos.append(pos)
        if misses:
            fetched = self._backend.get_batch(misses)
            for pos, doc, i in zip(miss_pos, fetched, misses):
                if doc is None:
                    doc = {"id": i, "title": f"doc_{i}", "content": ""}
                else:
                    self.cache.put(i, doc)
                out[pos] = doc
        return [
            {**d, "content": d["content"][:tl]} for d in out  # type: ignore[index]
        ]

    def fetch_documents(self, ids: Sequence[int]) -> list[dict]:
        return self.fetch_documents_batch(ids)
