"""Opportunistic batch scheduler with adaptive flush delay.

Behavior parity with the reference's shared BatchScheduler
(reference services/gateway/batch_scheduler.py:28-322): enqueue returns an
awaited future; the pending batch flushes on size OR timer; an adaptive
policy scales the flush delay with an EWMA of recent queue depths; flush
reasons (full/timeout/shutdown) are metered; a failed batch fails every
future in it; result-count mismatches are detected.

TPU adaptation (SURVEY.md section 7.4 item 7): the consumer pads batches to
shape buckets, so the policy's job is to pick *when* to cut a batch; the
bucket ladder quantizes *what size* reaches XLA.

Beyond the reference: `flush_on_ready` (default on) adds a fourth flush
reason, "ready" — a completing batch immediately flushes the pending one.
The single downstream device makes completion the natural batch clock at
saturation (continuous batching at batch granularity); the conc-50 sweep
measured 43.5 ms p50 of pure timer wait without it. Idle behavior is
unchanged (no completions -> timer cuts as before).
"""

from __future__ import annotations

import asyncio
import logging
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Awaitable, Callable, Optional, Sequence

from ..telemetry.metrics import BATCH_FLUSH, BATCH_SIZE, BATCH_WAIT, QUEUE_DEPTH

logger = logging.getLogger(__name__)


class AdaptiveBatchPolicy:
    """Load-aware flush delay (reference batch_scheduler.py:28-76).

    EWMA over the last `window` observed queue depths; delay interpolates
    linearly from max_delay (idle) down to min_delay (queue >= batch_size).
    """

    def __init__(
        self,
        batch_size: int,
        max_delay_s: float,
        min_delay_s: float = 0.005,
        window: int = 10,
    ) -> None:
        self.batch_size = batch_size
        self.max_delay_s = max_delay_s
        self.min_delay_s = min(min_delay_s, max_delay_s)
        self._depths: deque[int] = deque(maxlen=window)

    def observe(self, depth: int) -> None:
        self._depths.append(depth)

    @property
    def ewma_depth(self) -> float:
        if not self._depths:
            return 0.0
        ewma = float(self._depths[0])
        for d in list(self._depths)[1:]:
            ewma = 0.7 * ewma + 0.3 * d
        return ewma

    def current_delay(self) -> float:
        load = min(1.0, self.ewma_depth / max(1, self.batch_size))
        return self.max_delay_s - load * (self.max_delay_s - self.min_delay_s)


class FixedBatchPolicy:
    def __init__(self, batch_size: int, delay_s: float) -> None:
        self.batch_size = batch_size
        self._delay = delay_s

    def observe(self, depth: int) -> None:  # noqa: ARG002
        pass

    def current_delay(self) -> float:
        return self._delay


@dataclass
class Batch:
    items: list = field(default_factory=list)
    futures: list = field(default_factory=list)
    created: float = field(default_factory=time.monotonic)


class BatchScheduler:
    """enqueue(item) -> awaited result; process_fn handles a list of items.

    process_fn may be sync (run in executor) or async; it must return one
    result per item, in order.
    """

    def __init__(
        self,
        process_fn: Callable[[list], Awaitable[list] | list],
        *,
        batch_size: int,
        timeout_s: float,
        name: str = "scheduler",
        adaptive: bool = True,
        min_delay_s: float = 0.005,
        flush_on_ready: bool = True,
        run_id: str = "dev",
        node: str = "0",
    ) -> None:
        self.process_fn = process_fn
        self.batch_size = batch_size
        self.name = name
        self.policy = (
            AdaptiveBatchPolicy(batch_size, timeout_s, min_delay_s)
            if adaptive
            else FixedBatchPolicy(batch_size, timeout_s)
        )
        # work-conserving saturation clock (round-4 VERDICT #2): when a
        # batch completes, the stage it fed just freed capacity — flush
        # whatever is pending IMMEDIATELY (reason "ready") instead of
        # letting it sit out the timer. At saturation batches self-clock
        # on completions (the conc-50 sweep measured 43.5 ms p50 of pure
        # timer wait without this); when idle, the size-or-timer behavior
        # is unchanged (no completion events, so the timer still cuts).
        self.flush_on_ready = flush_on_ready
        self._min_delay_s = min(min_delay_s, timeout_s)
        self._backstop_s = timeout_s
        self._inflight = 0
        self._batch = Batch()
        self._lock = asyncio.Lock()
        self._timer: Optional[asyncio.Task] = None
        self._tasks: set[asyncio.Task] = set()
        self._closed = False
        labels = (run_id, node, name)
        self._m_size = BATCH_SIZE.labels(*labels)
        self._m_depth = QUEUE_DEPTH.labels(*labels)
        self._m_wait = BATCH_WAIT.labels(*labels)
        self._m_flush = {
            r: BATCH_FLUSH.labels(run_id, node, name, r)
            for r in ("full", "timeout", "ready", "shutdown")
        }

    async def enqueue(self, item: Any) -> Any:
        loop = asyncio.get_running_loop()
        fut: asyncio.Future = loop.create_future()
        async with self._lock:
            # checked under the lock: an enqueue racing stop() must not
            # start a batch that nothing will ever await
            if self._closed:
                raise RuntimeError(f"scheduler {self.name} is stopped")
            if not self._batch.items:
                # wait is measured from FIRST enqueue, not batch construction
                self._batch.created = time.monotonic()
            self._batch.items.append(item)
            self._batch.futures.append(fut)
            depth = len(self._batch.items)
            self.policy.observe(depth)
            self._m_depth.set(depth)
            if depth >= self.batch_size:
                self._flush_locked("full")
            elif self._timer is None:
                self._timer = asyncio.create_task(self._timer_task())
        return await fut

    async def enqueue_many(self, items: Sequence[Any]) -> list:
        """Enqueue a whole request's items under ONE lock acquisition.

        Per-item enqueue costs two event-loop switches per item on the
        lock; at device-scale request batches (512 items) that's ~10 ms
        of pure scheduling per request (PERF_NOTES "Serve-layer
        ceiling"). Semantics match a loop of enqueue(): full buckets
        flush as they fill, the remainder waits on the timer, results
        and per-item exceptions map 1:1."""
        loop = asyncio.get_running_loop()
        futs: list[asyncio.Future] = [loop.create_future() for _ in items]
        async with self._lock:
            if self._closed:
                raise RuntimeError(f"scheduler {self.name} is stopped")
            for item, fut in zip(items, futs):
                if not self._batch.items:
                    self._batch.created = time.monotonic()
                self._batch.items.append(item)
                self._batch.futures.append(fut)
                if len(self._batch.items) >= self.batch_size:
                    self._flush_locked("full")
            depth = len(self._batch.items)
            self.policy.observe(depth)
            self._m_depth.set(depth)
            if self._batch.items and self._timer is None:
                self._timer = asyncio.create_task(self._timer_task())
        return list(await asyncio.gather(*futs))

    async def _timer_task(self) -> None:
        # work-conserving: with nothing in flight downstream, the timer is
        # only a burst-coalescing window — cut after min_delay instead of
        # the load-interpolated delay (the downstream would otherwise sit
        # idle while a sub-size batch waits out the long timer). With work
        # IN flight, the timer must NOT clock batching at all: completions
        # arrive every device-step (~100-400 ms), so any timer shorter
        # than that preempts the "ready" flush and freezes batches at
        # whatever trickled in (measured: 102/137 timer flushes at mean
        # size 8 under conc 50 with the adaptive delay). A pending item
        # flushed by the timer would only queue behind the in-flight
        # device work anyway, so the long backstop costs no latency; it
        # exists solely so a stalled downstream can't strand items.
        delay = (
            self._min_delay_s
            if self._inflight == 0
            else max(self.policy.current_delay(), 10.0 * self._backstop_s)
        ) if self.flush_on_ready else self.policy.current_delay()
        try:
            await asyncio.sleep(delay)
        except asyncio.CancelledError:
            return
        async with self._lock:
            self._timer = None
            if self._batch.items:
                self._flush_locked("timeout")

    def _flush_locked(self, reason: str) -> None:
        batch, self._batch = self._batch, Batch()
        if self._timer is not None:
            self._timer.cancel()
            self._timer = None
        wait_s = time.monotonic() - batch.created
        self._m_flush[reason].inc()
        self._m_size.observe(len(batch.items))
        self._m_wait.observe(wait_s)
        self._m_depth.set(0)
        # structured line for offline latency-budget analysis
        # (scripts/analyze_latency_budget.py); one line per batch
        logger.info(
            'batch_flush {"name": "%s", "reason": "%s", "size": %d, '
            '"wait_ms": %.1f}',
            self.name, reason, len(batch.items), wait_s * 1e3,
        )
        task = asyncio.create_task(self._run_batch(batch))
        self._tasks.add(task)
        task.add_done_callback(self._tasks.discard)

    async def _run_batch(self, batch: Batch) -> None:
        self._inflight += 1
        try:
            items = list(batch.items)
            if asyncio.iscoroutinefunction(self.process_fn):
                results = await self.process_fn(items)
            else:
                # sync fn: run off the event loop (FAISS-OpenMP analog —
                # reference retrieval/api.py:337-349 uses the default pool)
                results = await asyncio.get_running_loop().run_in_executor(
                    None, self.process_fn, items
                )
                if isinstance(results, Awaitable):
                    results = await results
            if results is None or len(results) != len(batch.items):
                raise RuntimeError(
                    f"{self.name}: process_fn returned "
                    f"{0 if results is None else len(results)} results for "
                    f"{len(batch.items)} items"
                )
            for fut, res in zip(batch.futures, results):
                if fut.done():
                    continue
                # a per-item exception fails only that item (chunk-level
                # failure isolation — the orchestrator returns exceptions
                # for failed chunks alongside successful results)
                if isinstance(res, BaseException):
                    fut.set_exception(res)
                else:
                    fut.set_result(res)
        except Exception as exc:  # noqa: BLE001 — fail the whole batch
            logger.exception("%s: batch of %d failed", self.name, len(batch.items))
            for fut in batch.futures:
                if not fut.done():
                    fut.set_exception(exc)
        finally:
            self._inflight -= 1
            if self.flush_on_ready:
                async with self._lock:
                    if self._batch.items and not self._closed:
                        self._flush_locked("ready")

    async def stop(self) -> None:
        """Flush pending work (reason=shutdown) and wait for in-flight batches
        (reference batch_scheduler.py:151-165)."""
        async with self._lock:
            self._closed = True
            if self._batch.items:
                self._flush_locked("shutdown")
        # single gather: awaiting already-done tasks doesn't yield to the
        # loop, so a `while self._tasks` spin would starve the discard
        # callbacks forever. No new tasks can appear after _closed.
        if self._tasks:
            await asyncio.gather(*list(self._tasks), return_exceptions=True)
            self._tasks.clear()
