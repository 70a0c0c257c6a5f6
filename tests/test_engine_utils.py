"""Batch scheduler, caches, shapes, and document store (all 3 backends)."""

import asyncio
import time

import numpy as np
import pytest

from rag_inference_pipeline_tpu.core import Settings
from rag_inference_pipeline_tpu.engine.batcher import (
    AdaptiveBatchPolicy,
    BatchScheduler,
)
from rag_inference_pipeline_tpu.utils.cache import CompressedLRUCache, LRUCache
from rag_inference_pipeline_tpu.utils.docstore import (
    DocumentStore,
    build_native_store,
    build_sqlite_store,
)
from rag_inference_pipeline_tpu.utils.shapes import pad_rows, pick_bucket


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


class TestBatchScheduler:
    def test_flush_by_size(self):
        async def main():
            seen = []

            async def fn(items):
                seen.append(list(items))
                return [i * 10 for i in items]

            s = BatchScheduler(fn, batch_size=3, timeout_s=5.0, name="t1")
            res = await asyncio.gather(*(s.enqueue(i) for i in (1, 2, 3)))
            assert res == [10, 20, 30]
            assert seen == [[1, 2, 3]]
            await s.stop()

        run(main())

    def test_enqueue_many_semantics(self):
        """One lock acquisition for a whole request: full buckets flush as
        they fill, remainder rides the timer, order and per-item errors
        match a loop of enqueue()."""
        async def main():
            seen = []

            async def fn(items):
                seen.append(list(items))
                return [i * 10 for i in items]

            s = BatchScheduler(fn, batch_size=4, timeout_s=0.01, name="tm",
                               adaptive=False)
            res = await s.enqueue_many(list(range(10)))
            assert res == [i * 10 for i in range(10)]
            # two full buckets + a timer flush of the remainder
            assert [len(b) for b in seen] == [4, 4, 2]
            # per-item exception passthrough
            async def bad(items):
                raise RuntimeError("boom")
            s2 = BatchScheduler(bad, batch_size=8, timeout_s=0.01, name="tm2",
                                adaptive=False)
            with pytest.raises(RuntimeError):
                await s2.enqueue_many([1, 2])
            await s.stop()
            await s2.stop()
            with pytest.raises(RuntimeError):
                await s.enqueue_many([1])

        run(main())

    def test_flush_by_timeout(self):
        async def main():
            async def fn(items):
                return [i + 1 for i in items]

            s = BatchScheduler(
                fn, batch_size=100, timeout_s=0.02, name="t2", adaptive=False
            )
            t0 = time.monotonic()
            out = await s.enqueue(41)
            assert out == 42
            assert time.monotonic() - t0 < 1.0
            await s.stop()

        run(main())

    def test_multi_batch_ordering(self):
        async def main():
            async def fn(items):
                await asyncio.sleep(0.005)
                return [i * 2 for i in items]

            s = BatchScheduler(fn, batch_size=2, timeout_s=0.01, name="t3")
            res = await asyncio.gather(*(s.enqueue(i) for i in range(7)))
            assert res == [0, 2, 4, 6, 8, 10, 12]
            await s.stop()

        run(main())

    def test_error_fails_whole_batch(self):
        async def main():
            async def fn(items):
                raise ValueError("boom")

            s = BatchScheduler(fn, batch_size=2, timeout_s=0.01, name="t4")
            res = await asyncio.gather(
                s.enqueue(1), s.enqueue(2), return_exceptions=True
            )
            assert all(isinstance(r, ValueError) for r in res)
            await s.stop()

        run(main())

    def test_count_mismatch_detected(self):
        async def main():
            async def fn(items):
                return [1]  # wrong count

            s = BatchScheduler(fn, batch_size=2, timeout_s=0.01, name="t5")
            res = await asyncio.gather(
                s.enqueue(1), s.enqueue(2), return_exceptions=True
            )
            assert all(isinstance(r, RuntimeError) for r in res)
            await s.stop()

        run(main())

    def test_sync_fn_in_executor(self):
        async def main():
            def fn(items):
                return [i - 1 for i in items]

            s = BatchScheduler(fn, batch_size=2, timeout_s=0.01, name="t6")
            assert await asyncio.gather(s.enqueue(5), s.enqueue(6)) == [4, 5]
            await s.stop()

        run(main())

    def test_stop_flushes_pending(self):
        async def main():
            async def fn(items):
                return items

            s = BatchScheduler(fn, batch_size=100, timeout_s=30.0, name="t7")
            fut = asyncio.ensure_future(s.enqueue("x"))
            await asyncio.sleep(0.01)
            await s.stop()
            assert await fut == "x"
            with pytest.raises(RuntimeError):
                await s.enqueue("y")

        run(main())

    def test_flush_on_ready_self_clocks(self):
        """Round-5 saturation clock: while a batch is processing, pending
        items do NOT wait out the (long) timer — they flush the moment the
        in-flight batch completes, with reason "ready"."""
        async def main():
            seen = []
            release = asyncio.Event()

            async def fn(items):
                seen.append(list(items))
                if len(seen) == 1:
                    await release.wait()  # hold batch 1 "on device"
                return [i * 10 for i in items]

            # backstop timer far too long to explain any flush in the test
            s = BatchScheduler(fn, batch_size=8, timeout_s=30.0, name="tr")
            first = [asyncio.create_task(s.enqueue(i)) for i in range(1, 9)]
            await asyncio.sleep(0.02)
            assert [len(b) for b in seen] == [8]  # full flush, in flight
            # these arrive while the device is busy; timer alone would
            # strand them for 30 s
            late = [asyncio.create_task(s.enqueue(i)) for i in (91, 92)]
            await asyncio.sleep(0.02)
            assert len(seen) == 1  # still pending
            release.set()  # batch 1 completes -> ready-flush fires
            res = await asyncio.gather(*late)
            assert res == [910, 920]
            assert [len(b) for b in seen] == [8, 2]
            await s.stop()

        run(main())

    def test_idle_downstream_cuts_at_min_delay(self):
        """With nothing in flight, a sub-size batch must flush after the
        tiny coalescing window (min_delay), not the long backstop timer —
        the device would otherwise idle under a waiting batch."""
        async def main():
            seen = []

            async def fn(items):
                seen.append(list(items))
                return items

            s = BatchScheduler(
                fn, batch_size=32, timeout_s=30.0, min_delay_s=0.005,
                name="ti",
            )
            t0 = asyncio.get_running_loop().time()
            await s.enqueue("a")
            took = asyncio.get_running_loop().time() - t0
            assert seen == [["a"]]
            assert took < 1.0, took  # 5 ms window, not the 30 s backstop
            await s.stop()

        run(main())

    def test_flush_on_ready_off_preserves_timer_behavior(self):
        async def main():
            seen = []
            release = asyncio.Event()

            async def fn(items):
                seen.append(list(items))
                if len(seen) == 1:
                    await release.wait()
                return [i * 10 for i in items]

            s = BatchScheduler(fn, batch_size=2, timeout_s=0.05, name="tro",
                               adaptive=False, flush_on_ready=False)
            first = [asyncio.create_task(s.enqueue(i)) for i in (1, 2)]
            await asyncio.sleep(0.01)
            late = asyncio.create_task(s.enqueue(3))
            await asyncio.sleep(0.01)
            release.set()
            await asyncio.gather(*first)
            # with ready-flush off the late item waits for the TIMER, not
            # the completion; both paths eventually serve it
            assert await late == 30
            assert [len(b) for b in seen] == [2, 1]
            await s.stop()

        run(main())

    def test_adaptive_policy_scales_delay(self):
        p = AdaptiveBatchPolicy(batch_size=8, max_delay_s=0.1, min_delay_s=0.01)
        assert p.current_delay() == pytest.approx(0.1)
        for _ in range(10):
            p.observe(8)
        assert p.current_delay() == pytest.approx(0.01, abs=0.005)


class TestCaches:
    def test_lru_eviction_and_ttl(self):
        c = LRUCache(2, ttl_s=0.05, name="t_lru")
        c.put("a", 1)
        c.put("b", 2)
        c.put("c", 3)  # evicts a
        assert c.get("a") is None and c.get("b") == 2
        time.sleep(0.06)
        assert c.get("b") is None  # expired

    def test_lru_move_to_end(self):
        c = LRUCache(2, name="t_lru2")
        c.put("a", 1)
        c.put("b", 2)
        c.get("a")
        c.put("c", 3)  # evicts b (a was refreshed)
        assert c.get("a") == 1 and c.get("b") is None

    def test_compressed_roundtrip(self):
        c = CompressedLRUCache(4, name="t_clru")
        doc = {"id": 1, "content": "x" * 1000}
        c.put(1, doc)
        assert c.get(1) == doc

    def test_invalid_capacity(self):
        with pytest.raises(ValueError):
            LRUCache(0)


class TestShapes:
    def test_pick_bucket(self):
        assert pick_bucket(3, (1, 2, 4, 8)) == 4
        assert pick_bucket(8, (1, 2, 4, 8)) == 8
        assert pick_bucket(9, (1, 2, 4, 8)) == 8  # capped
        with pytest.raises(ValueError):
            pick_bucket(0, (1,))

    def test_pad_rows(self):
        a = np.ones((3, 4))
        p = pad_rows(a, 8)
        assert p.shape == (8, 4) and p[3:].sum() == 0
        with pytest.raises(ValueError):
            pad_rows(np.ones((9, 2)), 8)


DOCS = [(i, f"title {i}", f"content of document {i} " * 10) for i in range(50)]


class TestDocumentStore:
    def _check(self, store):
        store.load()
        assert store.count() == 50
        docs = store.fetch_documents_batch([3, 7, 999], truncate_length=30)
        assert docs[0]["id"] == 3 and docs[0]["title"] == "title 3"
        assert len(docs[0]["content"]) <= 30
        assert docs[2]["content"] == ""  # missing id -> stub
        # cache hit path
        again = store.fetch_documents_batch([3], truncate_length=30)
        assert again[0]["id"] == 3
        store.unload()
        assert not store.is_loaded

    def test_memory_backend(self):
        s = Settings(doc_store_backend="memory")
        store = DocumentStore(s, docs={i: {"id": i, "title": t, "content": c} for i, t, c in DOCS})
        self._check(store)

    def test_sqlite_backend(self, tmp_path):
        db = str(tmp_path / "documents.db")
        build_sqlite_store(db, DOCS)
        s = Settings(doc_store_backend="sqlite", document_db_path=db)
        self._check(DocumentStore(s))

    def test_sqlite_in_memory_clone(self, tmp_path):
        db = str(tmp_path / "documents.db")
        build_sqlite_store(db, DOCS)
        s = Settings(
            doc_store_backend="sqlite", document_db_path=db, doc_store_in_memory=True
        )
        self._check(DocumentStore(s))

    def test_native_backend(self, tmp_path):
        db = str(tmp_path / "docs.ragdoc")
        build_native_store(db, DOCS)
        s = Settings(doc_store_backend="native", document_db_path=db)
        self._check(DocumentStore(s))

    def test_native_duplicate_id_rejected(self, tmp_path):
        with pytest.raises(RuntimeError, match="duplicate"):
            build_native_store(str(tmp_path / "x.ragdoc"), [(1, "a", "b"), (1, "c", "d")])

    def test_native_missing_file(self):
        s = Settings(doc_store_backend="native", document_db_path="/nope/x.ragdoc")
        with pytest.raises(FileNotFoundError):
            DocumentStore(s).load()

    def test_unicode_roundtrip(self, tmp_path):
        db = str(tmp_path / "u.ragdoc")
        build_native_store(db, [(1, "tïtle ☃", "cöntent ☃" * 5)])
        s = Settings(doc_store_backend="native", document_db_path=db)
        store = DocumentStore(s)
        store.load()
        d = store.fetch_documents_batch([1])[0]
        assert d["title"] == "tïtle ☃" and "☃" in d["content"]


class TestExecutors:
    def test_named_pools_and_run(self):
        import asyncio

        from rag_inference_pipeline_tpu.utils.executors import (
            get_executor,
            run_cpu_bound,
            shutdown_all,
        )

        a = get_executor("alpha")
        assert get_executor("alpha") is a

        async def main():
            return await run_cpu_bound("alpha", lambda x: x * 3, 14)

        assert asyncio.new_event_loop().run_until_complete(main()) == 42
        shutdown_all()
        assert get_executor("alpha") is not a  # fresh pool after shutdown
        shutdown_all()


class TestNativeSanitizers:
    def test_make_sanitize_clean(self):
        """ASAN + TSAN runs of the C++ docstore (SURVEY.md section 5.2 —
        sanitizer CI the reference lacks)."""
        import subprocess, os

        native = os.path.join(os.path.dirname(__file__), "..", "native")
        res = subprocess.run(
            ["make", "-C", native, "sanitize"],
            capture_output=True, text=True, timeout=300,
        )
        assert res.returncode == 0, res.stdout + res.stderr
        assert "ASAN + TSAN clean" in res.stdout
