"""Service business logic: retrieval and generation executors.

Behavior parity with the reference's service layer:
- RetrievalExecutor (reference services/retrieval/api.py:300-529): per-item
  re-batching through a BatchScheduler; stages embed (use provided
  embeddings or encode) -> search (SHA-256-of-embedding-keyed LRU cache) ->
  doc fetch (payload-mode aware: full / id_only stubs / compressed blob) ->
  optional rerank.
- GenerationService (reference services/generation/service.py:87-460):
  prepare docs (decompress or doc-store fetch for id_only) -> rerank ->
  LLM(top-3) -> sentiment -> toxicity, toxic outputs replaced by the filter
  placeholder; per-stage duration histograms.

TPU difference: stage compute runs as jitted bucket-padded device batches;
whole batches (not single items) flow through each stage.
"""

from __future__ import annotations

import hashlib
import logging
import time
from typing import Any, Optional, Sequence

import numpy as np

from ..core.config import Settings
from ..core.enums import PayloadMode
from ..telemetry.metrics import STAGE_DURATION
from ..telemetry.profiling import SampledStageProfiler
from ..utils.cache import LRUCache
from ..utils.shapes import chunk_spans, pad_rows, pick_bucket
from .compression import pack_docs, unpack_docs
from .schemas import TOXIC_PLACEHOLDER

logger = logging.getLogger(__name__)


class _StageTimer:
    def __init__(self, settings: Settings, service: str) -> None:
        self._labels = (settings.run_id, str(settings.node_number), service)

    def observe(self, stage: str, seconds: float) -> None:
        STAGE_DURATION.labels(*self._labels, stage).observe(seconds)


class RetrievalExecutor:
    """Batch retrieval: embed -> ANN search -> doc fetch [-> rerank]."""

    def __init__(
        self,
        settings: Settings,
        *,
        index,
        embedder=None,
        doc_store=None,
        reranker=None,
    ) -> None:
        self.settings = settings
        self.index = index
        self.embedder = embedder
        self.doc_store = doc_store
        self.reranker = reranker
        self.search_cache = LRUCache(
            settings.search_cache_capacity,
            name="search",
            run_id=settings.run_id,
            node=str(settings.node_number),
        )
        self._timer = _StageTimer(settings, "retrieval")
        self.profiler = SampledStageProfiler(settings, "retrieval")
        # jitted search programs are specialized on (batch, k): quantize both
        # to ladders so a novel request shape never triggers a fresh XLA
        # compile on the hot path (project rule: no dynamic batch into jit)
        self._buckets = tuple(sorted(settings.shape_buckets))
        self._k_ladder = tuple(
            sorted({settings.retrieval_k, 16, 32, 64, 128})
        )

    def ready(self, items: Sequence[dict]) -> Optional[str]:
        """Readiness gating (reference retrieval/api.py:218-239): index must
        be loaded; embedder only needed if any item lacks an embedding."""
        if self.index is None or not self.index.is_loaded:
            return "index not loaded"
        needs_embed = any(i.get("embedding") is None for i in items)
        if needs_embed and (self.embedder is None or not self.embedder.is_loaded):
            return "embedder not loaded and request has no embeddings"
        return None

    def process_batch(self, items: list[dict]) -> list[dict]:
        """items: [{query, embedding?, k?, rerank?}] -> result dicts."""
        why = self.ready(items)
        if why:
            raise RuntimeError(f"retrieval not ready: {why}")
        prof = self.profiler.maybe_start()
        with prof.track("embed"):
            embs = self._get_embeddings(items)
        with prof.track("search"):
            ids, scores = self._search_with_cache(embs, items)
        with prof.track("fetch"):
            results = self._build_results(items, ids, scores)
        prof.finish()
        return results

    def _get_embeddings(self, items: Sequence[dict]) -> np.ndarray:
        """Use provided embeddings else encode (reference :351-374)."""
        t0 = time.monotonic()
        need_idx = [i for i, it in enumerate(items) if it.get("embedding") is None]
        dim = self.settings.index_dim
        out = np.zeros((len(items), dim), np.float32)
        for i, it in enumerate(items):
            if it.get("embedding") is not None:
                emb = np.asarray(it["embedding"], np.float32)
                if emb.shape != (dim,):
                    raise ValueError(
                        f"item {i}: embedding dim {emb.shape} != ({dim},)"
                    )
                out[i] = emb
        if need_idx:
            enc = self.embedder.encode([items[i].get("query", "") for i in need_idx])
            if enc.shape[1] != dim:
                raise ValueError(
                    f"embedder dim {enc.shape[1]} != index dim {dim}"
                )
            for j, i in enumerate(need_idx):
                out[i] = enc[j]
        self._timer.observe("embed", time.monotonic() - t0)
        return out

    def _search_with_cache(
        self, embs: np.ndarray, items: Sequence[dict]
    ) -> tuple[list[list[int]], list[list[float]]]:
        """SHA-256-of-embedding-keyed search cache (reference :376-425)."""
        t0 = time.monotonic()
        k_default = self.settings.retrieval_k
        ids_out: list[Optional[list[int]]] = [None] * len(items)
        scores_out: list[Optional[list[float]]] = [None] * len(items)
        miss_rows, miss_keys = [], []
        for i, it in enumerate(items):
            k = it.get("k") or k_default
            key = (hashlib.sha256(embs[i].tobytes()).hexdigest(), k)
            hit = self.search_cache.get(key)
            if hit is not None:
                ids_out[i], scores_out[i] = hit
            else:
                miss_rows.append(i)
                miss_keys.append(key)
        if miss_rows:
            k_max = max(
                (items[i].get("k") or k_default) for i in miss_rows
            )
            # bucket k so searches reuse a handful of compiled programs;
            # never below k_max, never above ntotal (lax.top_k requires it)
            k_eff = (
                pick_bucket(k_max, self._k_ladder)
                if k_max <= self._k_ladder[-1]
                else k_max
            )
            ntotal = getattr(self.index, "ntotal", 0) or k_eff
            k_eff = max(k_max, min(k_eff, ntotal))
            miss_embs = embs[miss_rows]
            s_parts, idx_parts = [], []
            for lo, hi in chunk_spans(len(miss_rows), self._buckets[-1]):
                n = hi - lo
                bucket = pick_bucket(n, self._buckets)
                qpad = pad_rows(miss_embs[lo:hi], bucket)
                s_b, idx_b = self.index.search(qpad, k_eff)
                s_parts.append(np.asarray(s_b)[:n])
                idx_parts.append(np.asarray(idx_b)[:n])
            s = np.concatenate(s_parts)
            idx = np.concatenate(idx_parts)
            for j, i in enumerate(miss_rows):
                k = items[i].get("k") or k_default
                row_ids = [int(x) for x in idx[j, :k] if x >= 0]
                row_scores = [float(x) for x in s[j, : len(row_ids)]]
                ids_out[i], scores_out[i] = row_ids, row_scores
                self.search_cache.put(miss_keys[j], (row_ids, row_scores))
        self._timer.observe("search", time.monotonic() - t0)
        return ids_out, scores_out  # type: ignore[return-value]

    def _build_results(
        self,
        items: Sequence[dict],
        ids: list[list[int]],
        scores: list[list[float]],
    ) -> list[dict]:
        """Payload-mode-aware response build (reference :427-529)."""
        t0 = time.monotonic()
        mode = self.settings.documents_payload_mode
        results = []
        for i, it in enumerate(items):
            res: dict[str, Any] = {"ids": ids[i], "scores": scores[i]}
            if mode is PayloadMode.ID_ONLY:
                results.append(res)
                continue
            if self.doc_store is not None and self.doc_store.is_loaded:
                docs = self.doc_store.fetch_documents_batch(
                    ids[i], truncate_length=self.settings.truncate_length
                )
            else:  # stub docs (reference :443-449)
                docs = [
                    {"id": d, "title": f"doc_{d}", "content": ""} for d in ids[i]
                ]
            for d, sc in zip(docs, scores[i]):
                d["score"] = sc
            if it.get("rerank") and self.reranker is not None:
                docs = self.reranker.rerank(
                    it.get("query", ""), docs, top_n=len(docs)
                )
            if mode is PayloadMode.COMPRESSED:
                res["compressed_docs"] = pack_docs(
                    docs, level=self.settings.compression_level
                )
            else:
                res["documents"] = docs
            results.append(res)
        self._timer.observe("fetch", time.monotonic() - t0)
        return results


class GenerationService:
    """Batch generation: docs -> rerank -> LLM -> sentiment -> toxicity."""

    def __init__(
        self,
        settings: Settings,
        *,
        llm,
        reranker=None,
        sentiment=None,
        toxicity=None,
        doc_store=None,
    ) -> None:
        self.settings = settings
        self.llm = llm
        self.reranker = reranker
        self.sentiment = sentiment
        self.toxicity = toxicity
        self.doc_store = doc_store
        self._timer = _StageTimer(settings, "generation")
        self.profiler = SampledStageProfiler(settings, "generation")
        # id_only handoff needs a doc store on this node (reference
        # service.py:77-85)
        if (
            settings.documents_payload_mode is PayloadMode.ID_ONLY
            and doc_store is None
        ):
            raise ValueError(
                "documents_payload_mode=id_only requires a doc store on the "
                "generation node"
            )

    def ready(self) -> Optional[str]:
        if self.llm is None or not self.llm.is_loaded:
            return "llm not loaded"
        return None

    def process_batch(self, items: list[dict]) -> list[dict]:
        """items: [{query, documents? | doc_ids? | compressed_docs?}]."""
        why = self.ready()
        if why:
            raise RuntimeError(f"generation not ready: {why}")
        prof = self.profiler.maybe_start()
        queries = [it.get("query", "") for it in items]
        with prof.track("prepare_docs"):
            docs_batch = [self._prepare_documents(it) for it in items]
        with prof.track("rerank"):
            t0 = time.monotonic()
            if self.reranker is not None and self.reranker.is_loaded:
                docs_batch = self.reranker.rerank_batch(
                    queries, docs_batch, top_n=self.settings.rerank_top_n
                )
            else:
                docs_batch = [
                    d[: self.settings.rerank_top_n] for d in docs_batch
                ]
            self._timer.observe("rerank", time.monotonic() - t0)
        with prof.track("llm"):
            t0 = time.monotonic()
            texts = self.llm.generate_batch(queries, docs_batch)
            self._timer.observe("llm", time.monotonic() - t0)
        with prof.track("sentiment"):
            t0 = time.monotonic()
            if self.sentiment is not None and self.sentiment.is_loaded:
                sentiments = self.sentiment.analyze_batch(texts)
            else:
                sentiments = ["neutral"] * len(texts)
            self._timer.observe("sentiment", time.monotonic() - t0)
        with prof.track("toxicity"):
            t0 = time.monotonic()
            if self.toxicity is not None and self.toxicity.is_loaded:
                tox = self.toxicity.check_batch(texts)
            else:
                tox = [(False, 0.0)] * len(texts)
            self._timer.observe("toxicity", time.monotonic() - t0)
        prof.finish()
        out = []
        for text, sent, (is_toxic, _score) in zip(texts, sentiments, tox):
            out.append(
                {
                    "generated_response": TOXIC_PLACEHOLDER if is_toxic else text,
                    "sentiment": sent,
                    "is_toxic": is_toxic,
                }
            )
        return out

    async def process_batch_async(self, items: list[dict]) -> list[dict]:
        """Engine-mode batch path: rerank/classify stay bucketed-batch, the
        LLM stage fans out into the continuous-batching decode engine."""
        import asyncio

        why = self.ready()
        if why:
            raise RuntimeError(f"generation not ready: {why}")
        loop = asyncio.get_running_loop()
        if (
            not hasattr(self.llm, "generate_batch_engine")
            or getattr(self.llm, "engine", None) is None
        ):
            # engine not running (failed start, stub LLM, or engine-less
            # deployment) — serve through the sync batch path instead of
            # failing the request
            return await loop.run_in_executor(None, self.process_batch, items)
        queries = [it.get("query", "") for it in items]
        # doc-store fetch / zstd decompress must not block the event loop
        docs_batch = await loop.run_in_executor(
            None, lambda: [self._prepare_documents(it) for it in items]
        )
        if self.reranker is not None and self.reranker.is_loaded:
            docs_batch = await loop.run_in_executor(
                None,
                lambda: self.reranker.rerank_batch(
                    queries, docs_batch, top_n=self.settings.rerank_top_n
                ),
            )
        else:
            docs_batch = [d[: self.settings.rerank_top_n] for d in docs_batch]
        t0 = time.monotonic()
        texts = await self.llm.generate_batch_engine(queries, docs_batch)
        self._timer.observe("llm", time.monotonic() - t0)
        if self.sentiment is not None and self.sentiment.is_loaded:
            sentiments = await loop.run_in_executor(
                None, self.sentiment.analyze_batch, texts
            )
        else:
            sentiments = ["neutral"] * len(texts)
        if self.toxicity is not None and self.toxicity.is_loaded:
            tox = await loop.run_in_executor(None, self.toxicity.check_batch, texts)
        else:
            tox = [(False, 0.0)] * len(texts)
        return [
            {
                "generated_response": TOXIC_PLACEHOLDER if is_toxic else text,
                "sentiment": sent,
                "is_toxic": is_toxic,
            }
            for text, sent, (is_toxic, _s) in zip(texts, sentiments, tox)
        ]

    def _prepare_documents(self, item: dict) -> list[dict]:
        """Decompress / fetch-by-id handoff (reference service.py:420-460)."""
        if item.get("compressed_docs"):
            return unpack_docs(item["compressed_docs"])
        if item.get("documents") is not None:
            return [dict(d) for d in item["documents"]]
        if item.get("doc_ids") is not None:
            if self.doc_store is None or not self.doc_store.is_loaded:
                raise RuntimeError("doc_ids handoff requires a loaded doc store")
            return self.doc_store.fetch_documents_batch(item["doc_ids"])
        return []
