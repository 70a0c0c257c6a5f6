"""IVF-PQ index: residual product quantization over the bucketed IVF layout,
with optional exact re-score of the ADC shortlist against full-precision
vectors (BASELINE.json configs[3]).

Parity target: faiss IndexIVFPQ with precomputed tables
(reference faiss_store.py:96-100).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import MeshContext
from ..ops.pq import (
    Int4ResidualTier,
    IVFPQListing,
    PQFlatTier,
    build_int4_tier,
    build_ivfpq,
    build_pq_tier,
    int4_tier_rescore_topk,
    ivfpq4_search_dedup,
    ivfpq_search,
    pq_tier_rescore_topk,
    shard_ivfpq_listing,
    sharded_ivfpq_search,
)
from ..ops.topk import NEG_INF
from .base import BaseIndex, save_npz


class IVFPQIndex(BaseIndex):
    kind = "ivf_pq"

    def __init__(
        self,
        dim: int,
        nlist: int,
        m: int,
        *,
        nprobe: int = 64,
        cap_factor: float = 2.5,
        rescore_k: int = 0,
        opq: bool = False,
        mesh: Optional[MeshContext] = None,
        ksub: int = 256,
        rescore_kind: str = "exact",
        rescore_pq_m: int = 0,
    ) -> None:
        super().__init__(dim, "ip")  # residual-ADC path is IP-metric
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by pq m {m}")
        if ksub not in (16, 256):
            raise ValueError("ksub must be 16 (PQ4) or 256 (PQ8)")
        if rescore_kind not in (
            "exact", "int4", "pq8", "host_int8", "host_f16"
        ):
            raise ValueError(
                "rescore_kind must be 'exact', 'int4', 'pq8', 'host_int8' "
                "or 'host_f16'"
            )
        if rescore_kind == "pq8":
            import logging

            logging.getLogger(__name__).warning(
                "rescore_kind='pq8' is precision-walled at ~0.46 recall@10 "
                "on tight clusters (2 bits/dim cannot re-rank near-ties — "
                "PERF_NOTES 'Host refine'); use 'int4' for a better "
                "HBM-resident tier (~0.8s recall band), or a host_* store "
                "for near-exact re-ranking"
            )
        elif rescore_kind == "int4":
            import logging

            logging.getLogger(__name__).info(
                "rescore_kind='int4': HBM-resident tier with a MEASURED "
                "recall@10 band of ~0.78 (tight clusters) to ~0.85 "
                "(realistic spread) — the 4-bit wall is geometry-"
                "independent (tests/test_int4_tier.py). For recall "
                ">=0.95 use host_int8/host_f16 (faiss refine-from-"
                "storage shape)"
            )
        # ksub=16 (PQ4) enables the one-hot MXU ADC dedup kernel on TPU —
        # the gather-free scan; double m to keep bits/row equal to PQ8
        self.ksub = ksub
        self.nlist = nlist
        self.m = m
        self.nprobe = nprobe
        self.nprobe_local = 0  # sharded: 0 = auto (2*ceil(nprobe/dp))
        self.cap_factor = cap_factor
        # rescore_k > 0: re-score the top rescore_k ADC candidates before
        # cutting to k. rescore_kind picks the rescore store:
        #   "exact"     — bf16 full vectors in HBM (2 bytes/dim; <=5M)
        #   "int4"      — int4 per-row-scaled residuals in HBM (0.5 byte/
        #                 dim + 6 B/row = 390 B at 768 -> 11.7 GB at 30M):
        #                 zero host-RAM store; measured a shade under the
        #                 host_int8 tier's ranking precision (the 4-bit
        #                 wall — ops/pq.py::Int4ResidualTier docstring)
        #   "pq8"       — flat residual-PQ8 codes in HBM (1 byte/subspace).
        #                 Measured precision wall: re-ranking near-tie
        #                 neighbors needs >=4 bits/dim, so this tier tops
        #                 out ~mid-recall on tight clusters — use for
        #                 recall-tolerant capacity points only
        #                 (ops/pq.py::PQFlatTier).
        #   "host_int8" — int8 codes in HOST RAM (the faiss refine-from-
        #                 storage shape): device produces the ADC
        #                 shortlist, host gathers + exactly re-scores.
        #                 The >=30M single-chip recall-floor play — 23 GB
        #                 at 30M x 768 fits host RAM, never HBM. Ceiling:
        #                 int8 ranking precision (~0.958 measured at 30M).
        #   "host_f16"  — f16 originals in HOST RAM (2 bytes/dim, 46 GB
        #                 at 30M): same shape, near-exact ranking — use
        #                 when host RAM allows 2x the int8 store.
        self.rescore_k = rescore_k
        self.rescore_kind = rescore_kind
        # PQ8 tier subspace count; 0 = 4-dim subspaces (dim / 4) — the
        # measured precision knee; dim/8 halves memory at ~2x the error
        self.rescore_pq_m = rescore_pq_m or dim // 4
        # opq: learn an orthogonal rotation before quantization (ops/pq.py
        # train_opq); IP scores are rotation-invariant so queries just rotate
        self.opq = opq
        self.mesh = mesh
        self._listing: Optional[IVFPQListing] = None
        self._vectors: Optional[jax.Array] = None  # rescore_kind == "exact"
        self._tier: Optional[PQFlatTier] = None  # rescore_kind == "pq8"
        self._int4: Optional[Int4ResidualTier] = None  # rescore_kind == "int4"
        self._host_codes: Optional[np.ndarray] = None  # "host_int8" [N,D] i8
        self._host_scale: float = 0.0
        self._host_f16: Optional[np.ndarray] = None  # "host_f16" [N,D]
        self._rotation: Optional[jax.Array] = None  # [D, D] when opq
        self._sharded = False

    def _maybe_shard(self) -> None:
        """dp-shard the code buckets when a multi-device mesh is attached
        (VERDICT round-2 #4). Re-score stores stay replicated (shortlist
        ids are global) — at the capacity scale this index exists for, use
        rescore_kind="pq8" (1 byte/subspace replicates affordably) rather
        than the bf16 exact copy."""
        if (
            self.mesh is not None
            and self.mesh.dp > 1
            and self.nlist % self.mesh.dp == 0
        ):
            self._listing = shard_ivfpq_listing(self.mesh, self._listing)
            self._sharded = True

    def train_add(
        self,
        vectors: np.ndarray,
        *,
        train_size: int = 131072,
        kmeans_iters: int = 15,
        pq_iters: int = 12,
        seed: int = 0,
    ) -> None:
        v = np.asarray(vectors, np.float32)
        if v.ndim != 2 or v.shape[1] != self.dim:
            raise ValueError(f"vectors must be [N, {self.dim}], got {v.shape}")
        if self.opq:
            from ..ops.pq import train_opq

            sel = np.random.default_rng(seed).choice(
                v.shape[0], size=min(train_size, v.shape[0]), replace=False
            )
            r, _ = train_opq(
                jax.random.key(seed), jnp.asarray(v[sel]), self.m,
                iters=4, pq_iters=pq_iters, ksub=self.ksub,
            )
            self._rotation = r
            v = np.asarray(jnp.asarray(v) @ r)
        self._listing = build_ivfpq(
            jax.random.key(seed),
            v,
            self.nlist,
            self.m,
            train_size=train_size,
            kmeans_iters=kmeans_iters,
            pq_iters=pq_iters,
            cap_factor=self.cap_factor,
            seed=seed,
            ksub=self.ksub,
        )
        if self.rescore_k > 0:
            if self.rescore_kind == "host_f16":
                self._host_f16 = np.ascontiguousarray(v, np.float16)
                from ..utils.cpuscan import madvise_hugepage

                madvise_hugepage(self._host_f16)
            elif self.rescore_kind == "host_int8":
                # host-RAM refine store: THE flat-int8 quantizer (outlier-
                # clipped percentile scale, ops/topk.py) — a reimplemented
                # raw-amax scale would let one outlier row crush resolution
                from ..ops.topk import quantize_global_int8

                codes_dev, scale_dev = quantize_global_int8(jnp.asarray(v))
                self._host_scale = float(np.asarray(scale_dev))
                self._host_codes = np.ascontiguousarray(np.asarray(codes_dev))
                from ..utils.cpuscan import madvise_hugepage

                madvise_hugepage(self._host_codes)
            elif self.rescore_kind == "int4":
                # tier shares the listing's coarse centroids (built before
                # _maybe_shard so they are still replicated here)
                self._int4 = build_int4_tier(v, self._listing.centroids)
            elif self.rescore_kind == "pq8":
                # tier shares the listing's coarse centroids (built before
                # _maybe_shard so they are still replicated here)
                self._tier = build_pq_tier(
                    jax.random.key(seed + 1),
                    v,
                    self._listing.centroids,
                    self.rescore_pq_m,
                    train_size=train_size,
                    pq_iters=pq_iters,
                    seed=seed,
                )
            else:
                self._vectors = jnp.asarray(v, jnp.bfloat16)
        self.ntotal = v.shape[0]
        self._maybe_shard()
        self._loaded = True

    def search(self, queries, k: int):
        if not self._loaded:
            raise RuntimeError("ivf_pq index not loaded")
        q = self.validate_queries(queries)
        if self._rotation is not None:
            q = q.astype(jnp.float32) @ self._rotation
        interpret = jax.default_backend() == "cpu"
        if self._sharded:
            def adc(qq, kk):
                return sharded_ivfpq_search(
                    self.mesh, self._listing, qq, kk,
                    nprobe=self.nprobe, interpret=interpret,
                    nprobe_local=self.nprobe_local,
                )
        elif self.ksub == 16:
            def adc(qq, kk):
                return ivfpq4_search_dedup(
                    self._listing, qq, kk, nprobe=self.nprobe,
                    interpret=interpret,
                )
        else:
            def adc(qq, kk):
                return ivfpq_search(self._listing, qq, kk, nprobe=self.nprobe)
        if self.rescore_k and self._host_f16 is not None:
            from .flat import _host_f16_rescore

            shortlist = max(k, self.rescore_k)
            _, i = adc(q, shortlist)
            return _host_f16_rescore(
                np.asarray(q, np.float32), self._host_f16, np.asarray(i), k
            )
        if self.rescore_k and self._host_codes is not None:
            shortlist = max(k, self.rescore_k)
            _, i = adc(q, shortlist)
            # ids cross to host (KBs); the 23-GB-class refine store never
            # touches HBM — device does coarse+ADC, host does exact
            return _host_int8_rescore(
                np.asarray(q, np.float32),
                self._host_codes,
                self._host_scale,
                np.asarray(i),
                k,
            )
        if self.rescore_k and self._int4 is not None:
            shortlist = max(k, self.rescore_k)
            s, i = adc(q, shortlist)
            return int4_tier_rescore_topk(
                q.astype(jnp.float32), s, i, self._int4, k
            )
        if self.rescore_k and self._tier is not None:
            shortlist = max(k, self.rescore_k)
            s, i = adc(q, shortlist)
            return pq_tier_rescore_topk(q.astype(jnp.float32), s, i, self._tier, k)
        if self.rescore_k and self._vectors is not None:
            shortlist = max(k, self.rescore_k)
            s, i = adc(q, shortlist)
            return _exact_rescore(q, self._vectors, s, i, k)
        return adc(q, k)

    def save(self, path: str) -> None:
        if not self._loaded:
            raise RuntimeError("nothing to save")
        l = self._listing
        extra = {}
        if self._vectors is not None:
            extra["vectors"] = np.asarray(self._vectors, np.float32)
        if self._tier is not None:
            extra["tier_codebooks"] = np.asarray(self._tier.codebooks, np.float32)
            extra["tier_codes"] = np.asarray(self._tier.codes)
            extra["tier_assign"] = np.asarray(self._tier.assign)
        if self._int4 is not None:
            extra["int4_codes"] = np.asarray(self._int4.codes)
            extra["int4_scale"] = np.asarray(self._int4.row_scale)
            extra["int4_assign"] = np.asarray(self._int4.assign)
        if self._host_codes is not None:
            extra["host_codes"] = self._host_codes
            extra["host_scale"] = np.float32(self._host_scale)
        if self._host_f16 is not None:
            extra["host_f16"] = self._host_f16
        if self._rotation is not None:
            extra["rotation"] = np.asarray(self._rotation, np.float32)
        save_npz(
            path,
            kind=self.kind,
            dim=self.dim,
            nlist=self.nlist,
            m=self.m,
            nprobe=self.nprobe,
            ntotal=self.ntotal,
            cap_factor=self.cap_factor,
            rescore_k=self.rescore_k,
            ksub=self.ksub,
            centroids=np.asarray(l.centroids, np.float32),
            codebooks=np.asarray(l.codebooks, np.float32),
            code_buckets=np.asarray(l.code_buckets),
            ids=np.asarray(l.ids),
            list_sizes=np.asarray(l.list_sizes),
            **extra,
        )

    @classmethod
    def _load(cls, path: str, mesh: Optional[MeshContext] = None) -> "IVFPQIndex":
        with np.load(path, allow_pickle=False) as z:
            idx = cls(
                int(z["dim"]),
                int(z["nlist"]),
                int(z["m"]),
                nprobe=int(z["nprobe"]),
                cap_factor=float(z["cap_factor"]),
                rescore_k=int(z["rescore_k"]),
                mesh=mesh,
                ksub=int(z["ksub"]) if "ksub" in z else 256,
            )
            idx._listing = IVFPQListing(
                centroids=jnp.asarray(z["centroids"], jnp.float32),
                codebooks=jnp.asarray(z["codebooks"], jnp.float32),
                code_buckets=jnp.asarray(z["code_buckets"]),
                ids=jnp.asarray(z["ids"]),
                list_sizes=jnp.asarray(z["list_sizes"]),
            )
            if "vectors" in z:
                idx._vectors = jnp.asarray(z["vectors"], jnp.bfloat16)
            if "tier_codes" in z:
                # tier centroids = the listing's (shared coarse k-means),
                # captured here while still unsharded
                idx._tier = PQFlatTier(
                    centroids=jnp.asarray(z["centroids"], jnp.float32),
                    codebooks=jnp.asarray(z["tier_codebooks"], jnp.float32),
                    codes=jnp.asarray(z["tier_codes"]),
                    assign=jnp.asarray(z["tier_assign"]),
                )
                idx.rescore_kind = "pq8"
                idx.rescore_pq_m = int(z["tier_codes"].shape[1])
            if "int4_codes" in z:
                # tier centroids = the listing's (shared coarse k-means),
                # captured here while still unsharded
                idx._int4 = Int4ResidualTier(
                    centroids=jnp.asarray(z["centroids"], jnp.float32),
                    codes=jnp.asarray(z["int4_codes"]),
                    row_scale=jnp.asarray(z["int4_scale"]),
                    assign=jnp.asarray(z["int4_assign"]),
                )
                idx.rescore_kind = "int4"
            if "host_codes" in z:
                idx._host_codes = np.ascontiguousarray(z["host_codes"])
                from ..utils.cpuscan import madvise_hugepage

                madvise_hugepage(idx._host_codes)
                idx._host_scale = float(z["host_scale"])
                idx.rescore_kind = "host_int8"
            if "host_f16" in z:
                idx._host_f16 = np.ascontiguousarray(z["host_f16"])
                from ..utils.cpuscan import madvise_hugepage

                madvise_hugepage(idx._host_f16)
                idx.rescore_kind = "host_f16"
            if "rotation" in z:
                idx._rotation = jnp.asarray(z["rotation"], jnp.float32)
                idx.opq = True
            idx.ntotal = int(z["ntotal"])
            idx._maybe_shard()
            idx._loaded = True
        return idx

    def unload(self) -> None:
        self._listing = None
        self._vectors = None
        self._tier = None
        self._int4 = None
        self._host_codes = None
        self._host_f16 = None
        self._loaded = False
        self.ntotal = 0


def _host_int8_rescore(
    q: np.ndarray, codes: np.ndarray, scale: float, ids: np.ndarray, k: int
) -> tuple[jax.Array, jax.Array]:
    """Exact host-side re-score of a device shortlist (refine-from-storage).

    q [B, D] f32; codes [N, D] i8 (host RAM); ids [B, S] i32, -1 invalid.
    Cost per query: S*D int8->f32 MACs on the host, vs a store that could
    never fit HBM. The native multithreaded kernel
    (native/cpuscan.cc::cs_rescore_i8) avoids numpy's gather + astype
    transients; numpy fallback for hosts without a toolchain.
    """
    try:
        from ..utils.cpuscan import rescore_i8

        s_n, i_n = rescore_i8(q, codes, scale, ids, k)
        return jnp.asarray(s_n), jnp.asarray(i_n)
    except Exception:  # noqa: BLE001 — no g++ / build failure
        pass
    cand = codes[np.clip(ids, 0, None)].astype(np.float32)  # [B, S, D]
    s = np.einsum("bsd,bd->bs", cand, q) * scale
    s = np.where(ids >= 0, s, NEG_INF)
    k = min(k, s.shape[1])
    sel = np.argpartition(-s, k - 1, axis=1)[:, :k]
    ss = np.take_along_axis(s, sel, axis=1)
    order = np.argsort(-ss, axis=1)
    top_s = np.take_along_axis(ss, order, axis=1)
    top_i = np.take_along_axis(
        np.take_along_axis(ids, sel, axis=1), order, axis=1
    )
    return jnp.asarray(top_s), jnp.asarray(top_i)


@jax.jit
def _rescore_kernel(q, vectors, ids):
    cand = jnp.take(vectors, jnp.clip(ids, 0), axis=0)  # [B, S, D]
    s = jnp.einsum(
        "bsd,bd->bs", cand, q.astype(cand.dtype),
        preferred_element_type=jnp.float32,
    )
    return jnp.where(ids >= 0, s, NEG_INF)


def _exact_rescore(q, vectors, adc_scores, ids, k: int):
    s = _rescore_kernel(q, vectors, ids)
    top_s, sel = jax.lax.top_k(s, min(k, s.shape[1]))
    return top_s, jnp.take_along_axis(ids, sel, axis=1)
