"""Gateway orchestrator: query cache + batch scheduler + 3-stage chunked
asyncio pipeline (retrieval -> generation -> postproc).

Behavior parity with the reference Orchestrator (reference
services/gateway/orchestrator.py:97-740):
- per-query response cache with normalization and optional fuzzy
  token-sort keys (:170-188);
- queries coalesce in a BatchScheduler (:210);
- each flushed batch splits into `gateway_pipeline_chunks` chunks feeding
  three long-lived asyncio workers connected by queues, so chunk N+1's
  retrieval overlaps chunk N's generation (:262-285, :484-706);
- stage workers run *local* components when this node hosts them, else RPC
  to the retrieval/generation nodes (:500-518, :569-590, :676-687);
- a stage error fails every future in its chunk (:534-539).

On a single-mesh deployment every stage is local and the "RPC" hops
disappear — documents never leave the process (SURVEY.md section 2.6).
"""

from __future__ import annotations

import asyncio
import base64
import logging
import re
from typing import Any, Optional

import numpy as np

from ..core.config import Settings
from ..serve.rpc import RPCClient
from ..telemetry.metrics import ERRORS_TOTAL, REQUEST_LATENCY, REQUESTS_TOTAL
from ..utils.cache import LRUCache
from .batcher import BatchScheduler

logger = logging.getLogger(__name__)

_WS = re.compile(r"\s+")


def normalize_query(q: str) -> str:
    return _WS.sub(" ", q.strip().lower())


def fuzzy_key(q: str) -> str:
    """Token-sort key (reference orchestrator.py:170-188 fuzzy option)."""
    return " ".join(sorted(_WS.split(q.strip().lower())))


class PipelineChunk:
    __slots__ = ("items", "futures", "retrieval", "generation")

    def __init__(self, items: list[dict], futures: list[asyncio.Future]):
        self.items = items
        self.futures = futures
        self.retrieval: Optional[list[dict]] = None
        self.generation: Optional[list[dict]] = None

    def fail(self, exc: Exception) -> None:
        for f in self.futures:
            if not f.done():
                f.set_exception(exc)


class Orchestrator:
    def __init__(
        self,
        settings: Settings,
        *,
        retrieval_executor=None,  # local RetrievalExecutor, if co-located
        generation_service=None,  # local GenerationService, if co-located
        embedder=None,  # local embedder for gateway-side encoding
        fused_executor=None,  # device-resident fused pipeline, if enabled
        rpc: Optional[RPCClient] = None,
    ) -> None:
        self.settings = settings
        self.retrieval_executor = retrieval_executor
        self.generation_service = generation_service
        self.embedder = embedder
        self.fused_executor = fused_executor
        self.rpc = rpc or RPCClient(settings)
        self.query_cache = LRUCache(
            settings.query_cache_capacity,
            ttl_s=settings.query_cache_ttl_s,
            name="query",
            run_id=settings.run_id,
            node=str(settings.node_number),
        )
        self.scheduler = BatchScheduler(
            self._process_batch,
            batch_size=settings.gateway_batch_size,
            timeout_s=settings.gateway_batch_timeout_ms / 1e3,
            adaptive=settings.adaptive_batching,
            min_delay_s=settings.adaptive_min_delay_ms / 1e3,
            # completion-clocked batching fits a SERIAL downstream (the
            # fused single-program path: one device, one stage). The
            # 3-stage orchestrator pipeline wants overlapping batches in
            # flight — its clock is the stage cadence (the adaptive
            # timer), and the busy backstop was measured ADDING 500 ms
            # of batch-wait at conc 50 on the 4.5M orchestrator run
            # (reference_scale_sat50_20260820_135305 segment 2)
            flush_on_ready=(
                settings.batch_flush_on_ready and fused_executor is not None
            ),
            name="gateway",
            run_id=settings.run_id,
            node=str(settings.node_number),
        )
        self._retrieval_q: asyncio.Queue = asyncio.Queue()
        self._generation_q: asyncio.Queue = asyncio.Queue()
        self._postproc_q: asyncio.Queue = asyncio.Queue()
        self._workers: list[asyncio.Task] = []
        self._started = False
        self._m_req = REQUESTS_TOTAL
        self._m_lat = REQUEST_LATENCY.labels(
            settings.run_id, str(settings.node_number), "gateway"
        )

    @property
    def is_loaded(self) -> bool:
        return True

    # -- lifecycle ---------------------------------------------------------
    async def start(self) -> None:
        if self._started:
            return
        self._workers = [
            asyncio.create_task(self._retrieval_worker()),
            asyncio.create_task(self._generation_worker()),
            asyncio.create_task(self._postproc_worker()),
        ]
        self._started = True

    async def stop(self) -> None:
        """Sentinel None through the queues, gather workers, close RPC
        (reference orchestrator.py:138-151)."""
        await self.scheduler.stop()
        if self._started:
            await self._retrieval_q.put(None)
            await asyncio.gather(*self._workers, return_exceptions=True)
            self._workers = []
            self._started = False
        await self.rpc.close()

    # -- entry point -------------------------------------------------------
    async def process_query(self, query: str, request_id: str, k=None) -> dict:
        labels = (self.settings.run_id, str(self.settings.node_number), "gateway")
        key = (
            fuzzy_key(query)
            if self.settings.query_cache_fuzzy
            else normalize_query(query),
            k or self.settings.retrieval_k,  # k changes the answer
        )
        cached = self.query_cache.get(key)
        if cached is not None:
            self._m_req.labels(*labels, "cache_hit").inc()
            return {**cached, "request_id": request_id}
        import time as _t

        t0 = _t.monotonic()
        result = await self.scheduler.enqueue({"query": query, "k": k})
        self._m_lat.observe(_t.monotonic() - t0)
        self._m_req.labels(*labels, "ok").inc()
        self.query_cache.put(key, dict(result))
        return {**result, "request_id": request_id}

    # -- batch pipeline ----------------------------------------------------
    async def _process_batch(self, items: list[dict]) -> list[Any]:
        if self.fused_executor is not None and self.fused_executor.is_loaded:
            # single device program replaces the whole 3-stage pipeline:
            # retrieved docs never reach the host (engine/fused_executor.py)
            return await asyncio.get_running_loop().run_in_executor(
                None, self.fused_executor.process_batch, items
            )
        n_chunks = max(1, min(self.settings.gateway_pipeline_chunks, len(items)))
        size = (len(items) + n_chunks - 1) // n_chunks
        loop = asyncio.get_running_loop()
        chunks: list[PipelineChunk] = []
        futures: list[asyncio.Future] = []
        for s in range(0, len(items), size):
            chunk_items = items[s : s + size]
            chunk_futs = [loop.create_future() for _ in chunk_items]
            futures.extend(chunk_futs)
            chunks.append(PipelineChunk(chunk_items, chunk_futs))
        import time as _t

        t0 = _t.monotonic()
        for c in chunks:
            await self._retrieval_q.put(c)
        # exceptions stay per-item: a failed chunk fails only its own
        # futures (the scheduler maps exception results back per item)
        results = await asyncio.gather(*futures, return_exceptions=True)
        # structured batch-completion event (reference orchestrator.py:303-314)
        logger.info(
            "batch_complete %s",
            __import__("json").dumps(
                {
                    "batch_size": len(items),
                    "chunks": len(chunks),
                    "duration_ms": round((_t.monotonic() - t0) * 1e3, 1),
                }
            ),
        )
        return list(results)

    async def _retrieval_worker(self) -> None:
        while True:
            chunk = await self._retrieval_q.get()
            if chunk is None:
                await self._generation_q.put(None)
                return
            try:
                chunk.retrieval = await self._do_retrieval(chunk.items)
                await self._generation_q.put(chunk)
            except Exception as exc:  # noqa: BLE001
                self._count_error("retrieval", exc)
                chunk.fail(exc)

    async def _generation_worker(self) -> None:
        while True:
            chunk = await self._generation_q.get()
            if chunk is None:
                await self._postproc_q.put(None)
                return
            try:
                chunk.generation = await self._do_generation(
                    chunk.items, chunk.retrieval
                )
                await self._postproc_q.put(chunk)
            except Exception as exc:  # noqa: BLE001
                self._count_error("generation", exc)
                chunk.fail(exc)

    async def _postproc_worker(self) -> None:
        while True:
            chunk = await self._postproc_q.get()
            if chunk is None:
                return
            try:
                for fut, gen in zip(chunk.futures, chunk.generation):
                    if not fut.done():
                        fut.set_result(
                            {
                                "generated_response": gen["generated_response"],
                                "sentiment": gen.get("sentiment", "neutral"),
                                "is_toxic": bool(gen.get("is_toxic", False)),
                            }
                        )
            except Exception as exc:  # noqa: BLE001
                self._count_error("postproc", exc)
                chunk.fail(exc)

    # -- stage impls: local when co-located, RPC otherwise ----------------
    async def _do_retrieval(self, items: list[dict]) -> list[dict]:
        payload_items = [
            {"query": it["query"], "k": it.get("k")} for it in items
        ]
        embs = None
        if self.embedder is not None and self.embedder.is_loaded:
            # gateway-local embedding (reference orchestrator.py:500-509)
            embs = await asyncio.get_running_loop().run_in_executor(
                None, self.embedder.encode, [it["query"] for it in items]
            )
        if self.retrieval_executor is not None:
            if embs is not None:
                for p, e in zip(payload_items, embs):
                    p["embedding"] = np.asarray(e, np.float32)
            return await asyncio.get_running_loop().run_in_executor(
                None, self.retrieval_executor.process_batch, payload_items
            )
        body: dict[str, Any] = {"items": payload_items}
        if embs is not None:
            # binary handoff: the JSON float-list wire costs ~0.55 ms/row
            # in parse+pydantic on the receiving node (PERF_NOTES
            # "Serve-layer ceiling"); this is the internal-RPC analog of
            # the reference's msgspec encode (rpc_client.py:122-126)
            body["embeddings_b64"] = base64.b64encode(
                np.ascontiguousarray(
                    np.asarray(embs, np.float32)
                ).tobytes()
            ).decode()
        resp = await self.rpc.post(
            f"{self.settings.retrieval_url}/retrieve",
            body,
            target="retrieval",
        )
        results = resp["results"]
        if len(results) != len(payload_items):
            # a silent zip-truncation here would leave futures pending forever
            raise RuntimeError(
                f"retrieval peer returned {len(results)} results for "
                f"{len(payload_items)} items"
            )
        return results

    async def _do_generation(
        self, items: list[dict], retrieval: list[dict]
    ) -> list[dict]:
        payload_items = []
        for it, ret in zip(items, retrieval):
            entry: dict[str, Any] = {"query": it["query"]}
            if ret.get("compressed_docs"):
                entry["compressed_docs"] = ret["compressed_docs"]
            elif ret.get("documents") is not None:
                entry["documents"] = ret["documents"]
            else:
                entry["doc_ids"] = ret.get("ids", [])
            payload_items.append(entry)
        if self.generation_service is not None:
            # engine path is duck-typed: a service without the async engine
            # API (or with the engine not running) uses the sync batch path
            if self.settings.use_continuous_batching and hasattr(
                self.generation_service, "process_batch_async"
            ):
                return await self.generation_service.process_batch_async(
                    payload_items
                )
            return await asyncio.get_running_loop().run_in_executor(
                None, self.generation_service.process_batch, payload_items
            )
        resp = await self.rpc.post(
            f"{self.settings.generation_url}/generate",
            {"items": payload_items},
            target="generation",
        )
        results = resp["results"]
        if len(results) != len(payload_items):
            raise RuntimeError(
                f"generation peer returned {len(results)} results for "
                f"{len(payload_items)} items"
            )
        return results

    def _count_error(self, service: str, exc: Exception) -> None:
        ERRORS_TOTAL.labels(
            self.settings.run_id,
            str(self.settings.node_number),
            service,
            type(exc).__name__,
        ).inc()

    def clear_cache(self) -> None:
        self.query_cache.clear()
