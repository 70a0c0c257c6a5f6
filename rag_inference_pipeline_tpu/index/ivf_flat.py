"""IVF-Flat index: on-TPU trained coarse quantizer + bucketed HBM lists.

Parity target: faiss IndexIVFFlat with runtime-settable nprobe
(reference faiss_store.py:84-92). Train/assign run on device
(BASELINE.json configs[2]); list layout is built host-side.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import MeshContext
from ..ops.ivf import (
    IVFListing,
    build_ivf,
    ivf_search,
    ivf_search_dedup,
    ivf_search_pallas,
    shard_ivf_listing,
    sharded_ivf_search,
)
from .base import BaseIndex, save_npz, storage_dtype


class IVFFlatIndex(BaseIndex):
    kind = "ivf_flat"

    def __init__(
        self,
        dim: int,
        nlist: int,
        *,
        metric: str = "ip",
        nprobe: int = 64,
        dtype: str = "bfloat16",
        cap_factor: float = 2.5,
        mesh: Optional[MeshContext] = None,
        exact: bool = False,
        dedup: bool = True,
    ) -> None:
        super().__init__(dim, metric)
        self.nlist = nlist
        self.nprobe = nprobe
        # sharded search only: per-shard scan-slot budget; 0 = auto
        # (2*ceil(nprobe/dp) — measured exact-parity point, see
        # ops/ivf.py::sharded_ivf_search). Raise toward nprobe to bound
        # worst-case shard skew at dp x scan cost.
        self.nprobe_local = 0
        # exact=True routes TPU searches through the XLA gather path, which
        # is exact within probed lists (faiss IndexIVFFlat semantics). The
        # default Pallas streaming scan keeps at most one candidate per
        # in-list position across probed lists — two true neighbors landing
        # at the same position collapse to one (measured recall impact at 1M
        # is nil: recall is nprobe-limited, PERF_NOTES.md "IVF on TPU at 1M")
        self.exact = exact
        # dedup=True (default) uses the batch-deduped cluster-major kernel:
        # each probed bucket is DMA'd once per BATCH and it is exact within
        # probed lists (no positional collapse). Its [n_slots, B, cap] f32
        # score tensor grows with B*nprobe though (~3 GB at B=128 on a
        # 1M/nlist=1024 index), so search() falls back to the streaming
        # scan once the transient exceeds _DEDUP_BYTES_BUDGET (round-2
        # advisor finding: HBM OOM risk at serving batch sizes)
        self.dedup = dedup
        self.dtype_name = dtype
        self.cap_factor = cap_factor
        self.mesh = mesh
        self._listing: Optional[IVFListing] = None
        self._sharded = False

    def _maybe_shard(self) -> None:
        """dp-shard the inverted lists when a multi-device mesh is attached
        (VERDICT round-2 #4: the capacity axis for >=10M corpora — IVF-Flat
        bf16 at 10M x 768 is ~24 GB, ~6 GB/chip at dp=4)."""
        if (
            self.mesh is not None
            and self.mesh.dp > 1
            and self.nlist % self.mesh.dp == 0
        ):
            self._listing = shard_ivf_listing(self.mesh, self._listing)
            self._sharded = True

    def train_add(
        self,
        vectors: np.ndarray,
        *,
        train_size: int = 131072,
        iters: int = 15,
        seed: int = 0,
    ) -> None:
        """k-means train + assign + bucket build in one shot."""
        v = np.asarray(vectors, np.float32)
        if v.ndim != 2 or v.shape[1] != self.dim:
            raise ValueError(f"vectors must be [N, {self.dim}], got {v.shape}")
        self._listing = build_ivf(
            jax.random.key(seed),
            v,
            self.nlist,
            train_size=train_size,
            iters=iters,
            cap_factor=self.cap_factor,
            storage_dtype=storage_dtype(self.dtype_name),
            seed=seed,
        )
        self.ntotal = v.shape[0]
        self._maybe_shard()
        self._loaded = True

    def search(self, queries, k: int):
        if not self._loaded:
            raise RuntimeError("ivf_flat index not loaded")
        q = self.validate_queries(queries)
        if self._sharded:
            return sharded_ivf_search(
                self.mesh, self._listing, q, k,
                nprobe=self.nprobe, metric=self.metric,
                nprobe_local=self.nprobe_local,
            )
        # TPU + IP: batch-deduped cluster-major kernel (default) or the
        # per-query streaming scan; CPU / L2 / exact=True: XLA path (exact
        # within probed lists)
        if (
            not self.exact
            and self.metric == "ip"
            and jax.default_backend() not in ("cpu",)
        ):
            if self.dedup and self._dedup_fits(q.shape[0]):
                return ivf_search_dedup(
                    self._listing, q, k, nprobe=self.nprobe
                )
            return ivf_search_pallas(self._listing, q, k, nprobe=self.nprobe)
        return ivf_search(
            self._listing, q, k, nprobe=self.nprobe, metric=self.metric
        )

    # HBM budget for the dedup kernel's [n_slots, B_pad, cap] f32 score
    # tensor (plus the two [B, n_slots*cap] flat views it reshapes into)
    _DEDUP_BYTES_BUDGET = 1 << 30  # 1 GB

    def _dedup_fits(self, b: int) -> bool:
        """True when the batch-dedup path's score transient fits the budget.
        Large batches saturate the slot union (n_slots -> nlist) and would
        materialize ~the whole padded corpus in f32."""
        nlist, cap, _ = self._listing.buckets.shape
        n_slots = min(nlist, b * self.nprobe)
        b_pad = ((max(b, 8) + 7) // 8) * 8
        return 3 * n_slots * b_pad * cap * 4 <= self._DEDUP_BYTES_BUDGET

    @property
    def imbalance(self) -> float:
        """max/mean list size — diagnostic for k-means balance quality."""
        sizes = np.asarray(self._listing.list_sizes)
        return float(sizes.max() / max(1.0, sizes.mean()))

    def save(self, path: str) -> None:
        if not self._loaded:
            raise RuntimeError("nothing to save")
        l = self._listing
        save_npz(
            path,
            kind=self.kind,
            dim=self.dim,
            metric=self.metric,
            dtype=self.dtype_name,
            nlist=self.nlist,
            nprobe=self.nprobe,
            ntotal=self.ntotal,
            cap_factor=self.cap_factor,
            centroids=np.asarray(l.centroids, np.float32),
            buckets=np.asarray(l.buckets, np.float32),
            ids=np.asarray(l.ids),
            list_sizes=np.asarray(l.list_sizes),
        )

    @classmethod
    def _load(cls, path: str, mesh: Optional[MeshContext] = None) -> "IVFFlatIndex":
        with np.load(path, allow_pickle=False) as z:
            idx = cls(
                int(z["dim"]),
                int(z["nlist"]),
                metric=str(z["metric"]),
                nprobe=int(z["nprobe"]),
                dtype=str(z["dtype"]),
                cap_factor=float(z["cap_factor"]),
                mesh=mesh,
            )
            dt = storage_dtype(idx.dtype_name)
            idx._listing = IVFListing(
                centroids=jnp.asarray(z["centroids"], jnp.float32),
                buckets=jnp.asarray(z["buckets"], dt),
                ids=jnp.asarray(z["ids"]),
                list_sizes=jnp.asarray(z["list_sizes"]),
            )
            idx.ntotal = int(z["ntotal"])
            idx._maybe_shard()
            idx._loaded = True
        return idx

    def unload(self) -> None:
        self._listing = None
        self._loaded = False
        self.ntotal = 0
