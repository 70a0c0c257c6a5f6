"""ctypes wrapper for the native CPU scan library (native/cpuscan.cc) — the
honest FAISS stand-in used by bench.py's vs_baseline ratio and the CPU
baseline experiments. The reference's equivalent hot loop is faiss-cpu's
C++ scan (src/pipeline/components/faiss_store.py:113-158); faiss itself is
not installable in this image (no egress), so this first-party multithreaded
scan plays its role on the bench host.

Builds the shared library on demand via `make -C native` (same pattern as
utils/docstore.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libragcpuscan.so")

_lib: Optional[ctypes.CDLL] = None
_lock = threading.Lock()

_F32P = ctypes.POINTER(ctypes.c_float)
_I8P = ctypes.POINTER(ctypes.c_int8)
_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_int64)
_U16P = ctypes.POINTER(ctypes.c_uint16)


def load_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "cpuscan.cc")
        # rebuild when missing OR older than the source: the build uses
        # -march=native, so a binary must never outlive its source (and
        # native/build/ is gitignored, so a foreign-host binary can't
        # arrive via git either)
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
        lib.cs_scan_f32.argtypes = [
            _F32P, ctypes.c_int, _F32P, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, _F32P, _I32P,
        ]
        lib.cs_scan_i8.argtypes = [
            _I8P, ctypes.c_int, _I8P, ctypes.c_int64, ctypes.c_int, _F32P,
            ctypes.c_int, ctypes.c_int, _F32P, _I32P,
        ]
        lib.cs_scan_ivf_f32.argtypes = [
            _F32P, ctypes.c_int, _F32P, ctypes.c_int, ctypes.c_int, _F32P,
            _I32P, _I64P, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _F32P, _I32P,
        ]
        lib.cs_rescore_i8.argtypes = [
            _F32P, ctypes.c_int, _I8P, ctypes.c_int64, ctypes.c_int,
            ctypes.c_float, _I32P, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _F32P, _I32P,
        ]
        lib.cs_rescore_f16.argtypes = [
            _F32P, ctypes.c_int, _U16P, ctypes.c_int64, ctypes.c_int,
            _I32P, ctypes.c_int, ctypes.c_int, ctypes.c_int, _F32P, _I32P,
        ]
        lib.cs_hw_threads.restype = ctypes.c_int
        lib.cs_madvise_hugepage.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.cs_madvise_hugepage.restype = ctypes.c_int
        _lib = lib
        return lib


def hw_threads() -> int:
    return int(load_lib().cs_hw_threads())


def madvise_hugepage(arr: np.ndarray) -> bool:
    """Back a host refine store with 2 MB pages (MADV_HUGEPAGE +
    synchronous MADV_COLLAPSE on Linux 6.1+). A multi-GB store on 4 KB
    pages pays one TLB walk per random row gather; on 2 MB pages the
    page-ordered rescore sweep (native rescore_topk) reuses each entry
    hundreds of times. Best-effort: returns False where unsupported and
    the store keeps working on 4 KB pages."""
    try:
        lib = load_lib()
    except Exception:  # noqa: BLE001 — never fail an index load for this
        return False
    if arr.nbytes < (1 << 21):
        return False
    return (
        lib.cs_madvise_hugepage(
            arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes
        )
        == 0
    )


def scan_f32(
    queries: np.ndarray, db: np.ndarray, k: int, *, nthreads: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Exact f32 inner-product top-k (IndexFlatIP analog)."""
    q = np.ascontiguousarray(queries, np.float32)
    d_ = np.ascontiguousarray(db, np.float32)
    b, n = q.shape[0], d_.shape[0]
    out_s = np.empty((b, k), np.float32)
    out_i = np.empty((b, k), np.int32)
    load_lib().cs_scan_f32(
        q.ctypes.data_as(_F32P), b, d_.ctypes.data_as(_F32P),
        ctypes.c_int64(n), q.shape[1], k, nthreads,
        out_s.ctypes.data_as(_F32P), out_i.ctypes.data_as(_I32P),
    )
    return out_s, out_i


def scan_i8(
    queries_i8: np.ndarray,
    db_i8: np.ndarray,
    scales: np.ndarray,
    k: int,
    *,
    nthreads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Int8 scan with per-row dequant (SQ8 analog — equal index memory to
    the TPU int8 index). Query int8 quantization is the caller's job."""
    q = np.ascontiguousarray(queries_i8, np.int8)
    d_ = np.ascontiguousarray(db_i8, np.int8)
    sc = np.ascontiguousarray(scales, np.float32)
    b, n = q.shape[0], d_.shape[0]
    out_s = np.empty((b, k), np.float32)
    out_i = np.empty((b, k), np.int32)
    load_lib().cs_scan_i8(
        q.ctypes.data_as(_I8P), b, d_.ctypes.data_as(_I8P),
        ctypes.c_int64(n), q.shape[1], sc.ctypes.data_as(_F32P), k, nthreads,
        out_s.ctypes.data_as(_F32P), out_i.ctypes.data_as(_I32P),
    )
    return out_s, out_i


def scan_ivf_f32(
    queries: np.ndarray,
    centroids: np.ndarray,
    codes: np.ndarray,
    ids: np.ndarray,
    offsets: np.ndarray,
    nprobe: int,
    k: int,
    *,
    nthreads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """IVF-flat probe (IndexIVFFlat analog): codes are list-major [n, d],
    ids [n] global row ids, offsets [nlist+1] int64 list boundaries."""
    q = np.ascontiguousarray(queries, np.float32)
    c = np.ascontiguousarray(centroids, np.float32)
    v = np.ascontiguousarray(codes, np.float32)
    li = np.ascontiguousarray(ids, np.int32)
    off = np.ascontiguousarray(offsets, np.int64)
    b, nlist = q.shape[0], c.shape[0]
    out_s = np.empty((b, k), np.float32)
    out_i = np.empty((b, k), np.int32)
    load_lib().cs_scan_ivf_f32(
        q.ctypes.data_as(_F32P), b, c.ctypes.data_as(_F32P), nlist,
        q.shape[1], v.ctypes.data_as(_F32P), li.ctypes.data_as(_I32P),
        off.ctypes.data_as(_I64P), nprobe, k, nthreads,
        out_s.ctypes.data_as(_F32P), out_i.ctypes.data_as(_I32P),
    )
    return out_s, out_i


def rescore_i8(
    queries: np.ndarray,
    codes: np.ndarray,
    scale: float,
    ids: np.ndarray,
    k: int,
    *,
    nthreads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact shortlist re-score against a host int8 refine store (the
    >=30M refine-from-storage path). queries [B,D] f32; codes [N,D] i8
    C-contiguous; ids [B,S] i32, -1 masked. Returns sorted top-k."""
    q = np.ascontiguousarray(queries, np.float32)
    i = np.ascontiguousarray(ids, np.int32)
    b, s = i.shape
    k = min(k, s)
    out_s = np.empty((b, k), np.float32)
    out_i = np.empty((b, k), np.int32)
    load_lib().cs_rescore_i8(
        q.ctypes.data_as(_F32P), b, codes.ctypes.data_as(_I8P),
        ctypes.c_int64(codes.shape[0]), q.shape[1], ctypes.c_float(scale),
        i.ctypes.data_as(_I32P), s, k, nthreads,
        out_s.ctypes.data_as(_F32P), out_i.ctypes.data_as(_I32P),
    )
    return out_s, out_i


def rescore_f16(
    queries: np.ndarray,
    store_f16: np.ndarray,
    ids: np.ndarray,
    k: int,
    *,
    nthreads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact shortlist re-score against a host f16 refine store
    (index/flat.py rescore_store="host"). store_f16 [N,D] C-contiguous."""
    q = np.ascontiguousarray(queries, np.float32)
    i = np.ascontiguousarray(ids, np.int32)
    assert store_f16.dtype == np.float16
    b, s = i.shape
    k = min(k, s)
    out_s = np.empty((b, k), np.float32)
    out_i = np.empty((b, k), np.int32)
    load_lib().cs_rescore_f16(
        q.ctypes.data_as(_F32P), b,
        store_f16.ctypes.data_as(_U16P),
        ctypes.c_int64(store_f16.shape[0]), q.shape[1],
        i.ctypes.data_as(_I32P), s, k, nthreads,
        out_s.ctypes.data_as(_F32P), out_i.ctypes.data_as(_I32P),
    )
    return out_s, out_i
