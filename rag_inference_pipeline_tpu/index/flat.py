"""Exact flat index, HBM-resident, optionally dp-sharded over the mesh.

The TPU equivalent of faiss IndexFlatIP/L2 (reference builds IndexFlatL2 as
the IVF quantizer, create_test_docs.py:84-90). Search uses the fused Pallas
bin-max kernel on TPU (exact scores, ~0.99 recall as a top-k set) or the
exact XLA scan (oracle / CPU).
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import MeshContext
from ..ops.topk import (
    exact_topk,
    fused_topk,
    fused_topk_int8gs,
    quantize_global_int8,
    sharded_topk,
    sharded_topk_int8gs,
)
from .base import BaseIndex, save_npz, storage_dtype


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=())
def _write_rows(dst: jax.Array, block: jax.Array, start: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice(dst, block, (start, 0))


def _chunked_device_put(
    host: np.ndarray, dtype, rows_per_block: int = 262144, sharding=None
) -> jax.Array:
    """Upload a large host array in row blocks.

    One multi-GB device_put is fragile through the tunneled transport
    (observed FAILED_PRECONDITION at ~4 GB) and pins the whole array at
    once; block writes with buffer donation keep peak device memory at
    full-size + one block and each transfer small. With `sharding`, the
    destination is laid out sharded and each block lands on its shard."""
    n = host.shape[0]
    if n <= rows_per_block and sharding is None:
        return jax.device_put(jnp.asarray(host, dtype))
    if sharding is not None:
        dst = jax.device_put(jnp.zeros(host.shape, dtype), sharding)
        write = jax.jit(
            lambda d, b, s: jax.lax.dynamic_update_slice(d, b, (s, 0)),
            donate_argnums=(0,), out_shardings=sharding,
        )
    else:
        dst = jnp.zeros(host.shape, dtype)
        write = _write_rows
    for s in range(0, n, rows_per_block):
        blk = jnp.asarray(host[s : s + rows_per_block], dtype)
        dst = write(dst, blk, jnp.int32(s))
    return dst


def _host_f16_rescore(
    q: np.ndarray, store_f16: np.ndarray, ids: np.ndarray, k: int
) -> tuple[jax.Array, jax.Array]:
    """Exact host re-rank of a device shortlist against f16 originals.

    q [B, D] f32; store_f16 [N, D]; ids [B, S] i32 (-1 = pad). Cost is
    S*D f32 MACs per query on the host. The native multithreaded kernel
    (native/cpuscan.cc::cs_rescore_f16) avoids numpy's gather + astype
    transients (measured 8.5 ms -> sub-ms at S=4096); numpy fallback for
    hosts without a toolchain."""
    try:
        from ..utils.cpuscan import rescore_f16

        s_n, i_n = rescore_f16(q, np.ascontiguousarray(store_f16), ids, k)
        return jnp.asarray(s_n), jnp.asarray(i_n)
    except Exception:  # noqa: BLE001 — no g++ / build failure
        pass
    cand = store_f16[np.clip(ids, 0, None)].astype(np.float32)  # [B, S, D]
    s = np.einsum("bsd,bd->bs", cand, q)
    s = np.where(ids >= 0, s, -np.inf)
    k = min(k, s.shape[1])
    sel = np.argpartition(-s, k - 1, axis=1)[:, :k]
    ss = np.take_along_axis(s, sel, axis=1)
    order = np.argsort(-ss, axis=1)
    return (
        jnp.asarray(np.take_along_axis(ss, order, axis=1)),
        jnp.asarray(
            np.take_along_axis(
                np.take_along_axis(ids, sel, axis=1), order, axis=1
            )
        ),
    )


class FlatIndex(BaseIndex):
    kind = "flat"

    def __init__(
        self,
        dim: int,
        *,
        metric: str = "ip",
        dtype: str = "bfloat16",
        mesh: Optional[MeshContext] = None,
        use_fused: Optional[bool] = None,
        nbins: int = 512,
        chunk: int = 4096,
        rescore_k: int = 64,  # int8 mode: exact bf16 re-score depth (0 = off)
        rescore_store: str = "device",  # "device" (bf16 HBM) | "host" (f16 RAM)
    ) -> None:
        super().__init__(dim, metric)
        if dtype == "int8" and metric != "ip":
            raise ValueError("int8 storage supports metric='ip' only")
        if rescore_store not in ("device", "host"):
            raise ValueError("rescore_store must be 'device' or 'host'")
        self.rescore_k = rescore_k
        # "host": the exact re-score copy lives in HOST RAM as f16 and the
        # shortlist refines host-side (refine-from-storage). This is the
        # >=10M recall play: at 10M x 768 the device bf16 copy is 15.7 GB
        # (> HBM next to the codes), capping int8 recall at its 0.955
        # quantization bound — the f16 host copy costs 0 HBM and restores
        # the exact ranking. PERF_NOTES ">=30M single-chip regime".
        self.rescore_store = rescore_store
        self.dtype_name = dtype
        self.mesh = mesh
        self.nbins = nbins
        self.chunk = chunk
        if use_fused is None:
            use_fused = jax.default_backend() not in ("cpu",)
        self.use_fused = use_fused
        # int8 scan chunk (rows per grid step); arrays are padded to a
        # multiple of this at build so no per-call pad copy exists. The
        # kernel requires chunk % nbins == 0 — round up so a small `chunk`
        # with a larger `nbins` cannot build an unsearchable index
        self._chunk_i8 = _round_up(min(chunk * 2, 8192), nbins)
        self._db: Optional[jax.Array] = None
        self._db_sq: Optional[jax.Array] = None
        self._db_i8: Optional[jax.Array] = None  # SQ8 storage mode
        self._db_gscale: Optional[jax.Array] = None  # scalar f32
        self._host_rescore: Optional[np.ndarray] = None  # f16 [ntotal, D]

    # -- build ------------------------------------------------------------
    def add(self, vectors: np.ndarray) -> None:
        """Ingest rows (appends). Host -> device transfer happens here."""
        v = np.asarray(vectors)
        if v.ndim != 2 or v.shape[1] != self.dim:
            raise ValueError(f"vectors must be [N, {self.dim}], got {v.shape}")
        if self.dtype_name == "int8":
            # SQ8 mode: GLOBAL-scale int8 codes carry the scan (int32-domain
            # compares in the kernel — no per-row dequant on the hot path);
            # with rescore_k > 0 a bf16 copy is kept for exact re-scoring of
            # the shortlist. Arrays are padded to a search-chunk multiple at
            # BUILD time: an unaligned array forces a jnp.pad copy of the
            # whole corpus inside every jitted search (+2.2 ms/call at 1M —
            # PERF_NOTES.md round-2 kernel findings).
            new = jnp.asarray(v, jnp.float32)
            if self._db_i8 is not None:
                if self._db is not None:
                    # re-add must not degrade the exact-rescore copy: use the
                    # bf16 originals, not dequantized int8
                    prev = self._db[: self.ntotal].astype(jnp.float32)
                elif self._host_rescore is not None:
                    prev = jnp.asarray(
                        self._host_rescore[: self.ntotal], jnp.float32
                    )
                else:
                    prev = (
                        self._db_i8[: self.ntotal].astype(jnp.float32)
                        * self._db_gscale
                    )
                new = jnp.concatenate([prev, new])
            if self.rescore_k > 0 and self.rescore_store == "host":
                # f16 originals stay host-side; nothing extra crosses to HBM
                prev_h = (
                    self._host_rescore[: self.ntotal]
                    if self._host_rescore is not None
                    else None
                )
                host_new = np.asarray(v, np.float16)
                self._host_rescore = (
                    np.concatenate([prev_h, host_new])
                    if prev_h is not None
                    else host_new
                )
                from ..utils.cpuscan import madvise_hugepage

                madvise_hugepage(self._host_rescore)
            n = new.shape[0]
            # quantize BEFORE padding (pad rows would skew the percentile
            # scale on small corpora), then pad codes + rescore copy
            db_i8, gscale = quantize_global_int8(new)
            n_pad = _round_up(n, self._i8_align())
            if n_pad != n:
                db_i8 = jnp.pad(db_i8, ((0, n_pad - n), (0, 0)))
                new = jnp.pad(new, ((0, n_pad - n), (0, 0)))
            self._put_i8(db_i8, gscale, new)
            self.ntotal = n
            self._loaded = True
            return
        dt = storage_dtype(self.dtype_name)
        new = jnp.asarray(v, dt)
        if self._db is None:
            db = new
        else:
            db = jnp.concatenate([self._db[: self.ntotal], new])
        self._set_db(db)

    def _i8_align(self) -> int:
        """Row alignment for the int8 store: a scan-chunk multiple, times dp
        when sharded so every shard's rows are chunk-aligned (an unaligned
        shard pays a whole-shard pad copy inside every jitted search)."""
        dp = self.mesh.dp if self.mesh is not None else 1
        return self._chunk_i8 * max(dp, 1)

    def _put_i8(
        self, db_i8: jax.Array, gscale: jax.Array, rescore_f32: jax.Array
    ) -> None:
        """Place the padded int8 codes (+ bf16 rescore copy) on device —
        dp-row-sharded when a multi-chip mesh is attached (VERDICT round-2
        item #3: the headline index config must honor mesh.dp at the index
        layer, not only inside the fused pipeline)."""
        keep_dev = self.rescore_k > 0 and self.rescore_store == "device"
        if self.mesh is not None and self.mesh.dp > 1:
            self._db_i8 = self.mesh.put(db_i8, self.mesh.rows_dp)
            self._db_gscale = self.mesh.put(gscale)
            if keep_dev:
                self._db = self.mesh.put(
                    rescore_f32.astype(jnp.bfloat16), self.mesh.rows_dp
                )
        else:
            self._db_i8 = jax.device_put(db_i8)
            self._db_gscale = jax.device_put(gscale)
            if keep_dev:
                self._db = jax.device_put(rescore_f32.astype(jnp.bfloat16))

    def _set_db(self, db: jax.Array) -> None:
        n = db.shape[0]
        if self.mesh is not None and self.mesh.dp > 1:
            # pad rows to a dp multiple for even sharding; padding rows are
            # masked out by NEG_INF in the sharded kernels via ntotal
            dp = self.mesh.dp
            n_pad = ((n + dp - 1) // dp) * dp
            if n_pad != n:
                db = jnp.concatenate(
                    [db, jnp.zeros((n_pad - n, self.dim), db.dtype)]
                )
            self._db = self.mesh.put(db, self.mesh.rows_dp)
            self.ntotal = n
        else:
            if self.use_fused and self.metric == "ip":
                # chunk-align at build so the jitted fused search never pays
                # a whole-array jnp.pad copy per call (PERF_NOTES round 2)
                n_pad = _round_up(n, self.chunk)
                if n_pad != n:
                    db = jnp.concatenate(
                        [db, jnp.zeros((n_pad - n, self.dim), db.dtype)]
                    )
            self._db = jax.device_put(db)
            self.ntotal = n
        if self.metric == "l2":
            dbf = self._db.astype(jnp.float32)
            self._db_sq = jnp.sum(dbf * dbf, axis=-1)
        self._loaded = True

    # -- search -----------------------------------------------------------
    def search(self, queries, k: int):
        if not self._loaded:
            raise RuntimeError("flat index not loaded")
        q = self.validate_queries(queries)
        if self.dtype_name == "int8":
            interpret = jax.default_backend() == "cpu"
            if self.rescore_k > 0 and self._host_rescore is not None:
                # refine-from-storage: device int8 shortlist (no on-chip
                # rescore copy exists), host gathers the f16 originals and
                # exactly re-ranks — ids cross the link, the store doesn't
                s_k = min(max(self.rescore_k, k + 32), self.nbins)
                if self.mesh is not None and self.mesh.dp > 1:
                    _, ids = sharded_topk_int8gs(
                        self.mesh, q, self._db_i8, self._db_gscale, s_k,
                        nbins=self.nbins, chunk=self._chunk_i8,
                        ntotal=self.ntotal, interpret=interpret,
                    )
                else:
                    _, ids = fused_topk_int8gs(
                        q, self._db_i8, self._db_gscale, s_k,
                        nbins=self.nbins, chunk=self._chunk_i8,
                        interpret=interpret, ntotal=self.ntotal,
                        mm_bf16=False,
                    )
                t0 = time.perf_counter()
                out = _host_f16_rescore(
                    np.asarray(q, np.float32),
                    self._host_rescore,
                    np.asarray(ids),
                    k,
                )
                # Grafana host-refine row (telemetry/metrics.py)
                from ..core.config import get_settings
                from ..telemetry.metrics import STAGE_DURATION

                _s = get_settings()
                STAGE_DURATION.labels(
                    _s.run_id, str(_s.node_number), "index", "host_refine"
                ).observe(time.perf_counter() - t0)
                return out
            # rescore gate inside the kernel is `rescore_k > k`: keep the
            # exact bf16 re-score ON for any k by deepening the shortlist
            # (silently losing the rescore drops recall 0.998 -> ~0.975)
            r_k = (
                min(max(self.rescore_k, k + 32), self.nbins)
                if self.rescore_k > 0 and self._db is not None
                else 0
            )
            if self.mesh is not None and self.mesh.dp > 1:
                return sharded_topk_int8gs(
                    self.mesh, q, self._db_i8, self._db_gscale, k,
                    rescore_db_sharded=self._db if r_k > 0 else None,
                    rescore_k=r_k,
                    nbins=self.nbins, chunk=self._chunk_i8,
                    ntotal=self.ntotal, interpret=interpret,
                )
            return fused_topk_int8gs(
                q, self._db_i8, self._db_gscale, k,
                nbins=self.nbins, chunk=self._chunk_i8,
                interpret=interpret,
                rescore_db=self._db if r_k > 0 else None,
                rescore_k=r_k,
                ntotal=self.ntotal,
                # native s8xs8->s32 MXU dot: exact int scores with NO
                # accumulator bound, and faster than the bf16 upcast at
                # every measured batch (round-3: +17% at B=256, +27% at
                # B=1024, parity at B=128 — PERF_NOTES "Native int8 MXU
                # dot"); the bf16 path remains available via mm_bf16=True
                mm_bf16=False,
            )
        if self.mesh is not None and self.mesh.dp > 1:
            return sharded_topk(
                self.mesh,
                q,
                self._db,
                k,
                use_fused=(
                    self.use_fused and self.metric == "ip" and k <= self.nbins
                ),
                nbins=self.nbins,
                chunk=self.chunk,
                metric=self.metric,
                ntotal=self.ntotal,  # masks the even-sharding pad rows
            )
        if self.use_fused and self.metric == "ip" and k <= self.nbins:
            return fused_topk(
                q, self._db, k, nbins=self.nbins, chunk=self.chunk,
                ntotal=self.ntotal,
            )
        return exact_topk(
            q, self._db, k, metric=self.metric, db_sq_norms=self._db_sq,
            ntotal=self.ntotal,
        )

    def reconstruct(self, ids) -> jax.Array:
        """Fetch stored vectors by row id (for PQ re-score / debugging)."""
        ids = jnp.asarray(ids)
        if self.dtype_name == "int8" and self._db is None:
            if self._host_rescore is not None:
                return jnp.asarray(
                    self._host_rescore[np.asarray(ids)].astype(np.float32)
                )
            return (
                jnp.take(self._db_i8, ids, axis=0).astype(jnp.float32)
                * self._db_gscale
            )
        return jnp.take(self._db, ids, axis=0)

    # -- persistence --------------------------------------------------------
    def save(self, path: str) -> None:
        if not self._loaded:
            raise RuntimeError("nothing to save")
        if self.dtype_name == "int8":
            extra = {}
            if self._db is not None:  # rescore copy (float16 on disk)
                extra["vectors_rescore"] = np.asarray(
                    self._db[: self.ntotal].astype(jnp.float32), np.float16
                )
            elif self._host_rescore is not None:
                extra["vectors_rescore"] = self._host_rescore[: self.ntotal]
                extra["rescore_store"] = np.bytes_(b"host")
            save_npz(
                path,
                kind=self.kind,
                dim=self.dim,
                metric=self.metric,
                dtype=self.dtype_name,
                rescore_k=self.rescore_k,
                vectors_i8=np.asarray(self._db_i8[: self.ntotal]),
                gscale=np.float32(self._db_gscale),
                **extra,
            )
            return
        save_npz(
            path,
            kind=self.kind,
            dim=self.dim,
            metric=self.metric,
            dtype=self.dtype_name,
            vectors=np.asarray(
                jax.device_get(self._db[: self.ntotal]), dtype=np.float32
            ),
        )

    @classmethod
    def _load(
        cls,
        path: str,
        mesh: Optional[MeshContext] = None,
        *,
        rescore_store: Optional[str] = None,
    ) -> "FlatIndex":
        with np.load(path, allow_pickle=False) as z:
            idx = cls(
                int(z["dim"]),
                metric=str(z["metric"]),
                dtype=str(z["dtype"]),
                mesh=mesh,
            )
            if rescore_store is not None:
                # deployment override: where the rescore copy LANDS is not
                # artifact state (BaseIndex.load docstring)
                idx.rescore_store = rescore_store
            if "vectors_i8" in z and "scales" in z:
                # legacy per-row-scale save: dequantize and re-add through
                # the global-scale build path
                vecs = (
                    z["vectors_i8"].astype(np.float32)
                    * z["scales"][:, None]
                )
                if "vectors_rescore" in z:
                    vecs = z["vectors_rescore"].astype(np.float32)
                idx.rescore_k = int(z["rescore_k"]) if "rescore_k" in z else 0
                idx.add(vecs)
            elif "vectors_i8" in z:
                idx.rescore_k = int(z["rescore_k"]) if "rescore_k" in z else 0
                n = z["vectors_i8"].shape[0]
                n_pad = _round_up(n, idx._i8_align())
                sh = (
                    mesh.rows_dp if mesh is not None and mesh.dp > 1 else None
                )
                codes = np.zeros((n_pad, idx.dim), np.int8)
                codes[:n] = z["vectors_i8"]
                idx._db_i8 = _chunked_device_put(codes, jnp.int8, sharding=sh)
                idx._db_gscale = jax.device_put(
                    jnp.asarray(z["gscale"], jnp.float32)
                )
                want_host = idx.rescore_store == "host" or (
                    "rescore_store" in z and rescore_store is None
                )
                if "vectors_rescore" in z and want_host:
                    # host refine store: the f16 copy never touches HBM —
                    # also the fastest boot path (no multi-GB upload)
                    idx.rescore_store = "host"
                    idx._host_rescore = np.ascontiguousarray(
                        z["vectors_rescore"]
                    )
                    from ..utils.cpuscan import madvise_hugepage

                    madvise_hugepage(idx._host_rescore)
                elif "vectors_rescore" in z:
                    # convert f16 -> bf16 on the HOST (ml_dtypes): asking
                    # the device to convert holds the f16 AND bf16 copies
                    # in HBM at once — +6.9 GB transient at the 4.5M scale,
                    # which OOMs a 16 GB chip next to the int8 codes
                    import ml_dtypes

                    re = np.zeros((n_pad, idx.dim), ml_dtypes.bfloat16)
                    re[:n] = z["vectors_rescore"].astype(ml_dtypes.bfloat16)
                    idx._db = _chunked_device_put(
                        re, jnp.bfloat16, sharding=sh
                    )
                else:
                    idx.rescore_k = 0
                idx.ntotal = n
                idx._loaded = True
            else:
                idx.add(z["vectors"])
        return idx

    def unload(self) -> None:
        self._db = None
        self._db_sq = None
        self._db_i8 = None
        self._db_gscale = None
        self._host_rescore = None
        self._loaded = False
        self.ntotal = 0
