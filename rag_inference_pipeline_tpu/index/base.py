"""Index lifecycle: the TPU analog of the reference's FAISSStore component
(reference: src/pipeline/components/faiss_store.py) — load/save/warmup/search
with shape & dtype validation — plus on-device build (which faiss did on CPU,
reference scripts/create_test_docs.py:75-106).

Persistence: a host-side .npz artifact (centroids/codebooks/codes/vectors)
restored into device arrays at load — the checkpoint/resume story of
SURVEY.md section 5.4 for index state.
"""

from __future__ import annotations

import abc
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import MeshContext

logger = logging.getLogger(__name__)

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


def storage_dtype(name: str):
    try:
        return _DTYPES[name]
    except KeyError:
        raise ValueError(f"unsupported index storage dtype {name!r}") from None


class BaseIndex(abc.ABC):
    """Common surface: ntotal, dim, search(), save(), classmethod load()."""

    kind: str = "base"

    def __init__(self, dim: int, metric: str = "ip") -> None:
        if metric not in ("ip", "l2"):
            raise ValueError(f"metric must be ip|l2, got {metric!r}")
        self.dim = dim
        self.metric = metric
        self.ntotal = 0
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded

    def validate_queries(self, q) -> jax.Array:
        """Shape/dim/dtype validation (reference faiss_store.py:113-158)."""
        q = jnp.asarray(q)
        if q.ndim == 1:
            q = q[None, :]
        if q.ndim != 2:
            raise ValueError(f"queries must be [B, dim], got shape {q.shape}")
        if q.shape[1] != self.dim:
            raise ValueError(
                f"query dim {q.shape[1]} != index dim {self.dim}"
            )
        if not jnp.issubdtype(q.dtype, jnp.floating):
            raise ValueError(f"queries must be floating, got {q.dtype}")
        return q

    @abc.abstractmethod
    def search(self, queries, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Returns (scores [B,k] f32, ids [B,k] i32) as device arrays."""

    @abc.abstractmethod
    def save(self, path: str) -> None: ...

    def warmup(self, k: int = 10) -> float:
        """Compile + touch HBM before serving (reference faiss_store.py:103-107)."""
        t0 = time.time()
        q = jnp.zeros((1, self.dim), jnp.float32)
        s, i = self.search(q, k)
        jax.block_until_ready((s, i))
        dt = time.time() - t0
        logger.info("%s index warmup in %.2fs", self.kind, dt)
        return dt

    @staticmethod
    def load(
        path: str,
        mesh: Optional[MeshContext] = None,
        *,
        rescore_store: Optional[str] = None,
    ) -> "BaseIndex":
        """Dispatch on the artifact's declared kind.

        `rescore_store` ("device" | "host") overrides where a flat-int8
        artifact's rescore copy lands — a DEPLOYMENT choice, not artifact
        state: "host" keeps the f16 copy in host RAM (zero HBM, no
        multi-GB boot upload — 6.9 GB at the 4.5M reference scale)."""
        from .flat import FlatIndex
        from .ivf_flat import IVFFlatIndex
        from .ivf_pq import IVFPQIndex

        with np.load(path, allow_pickle=False) as z:
            kind = str(z["kind"])
        impl = {
            "flat": FlatIndex,
            "ivf_flat": IVFFlatIndex,
            "ivf_pq": IVFPQIndex,
        }.get(kind)
        if impl is None:
            raise ValueError(f"unknown index kind {kind!r} in {path}")
        if kind == "flat" and rescore_store is not None:
            return impl._load(path, mesh, rescore_store=rescore_store)
        return impl._load(path, mesh)


def save_npz(path: str, **arrays) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # name the temp file *.npz so np.savez never appends a second extension
    # (its append-if-missing behavior made the rename target ambiguous)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
