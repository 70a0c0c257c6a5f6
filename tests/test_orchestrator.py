"""Orchestrator unit tests with a mocked RPC boundary — the translation of
the reference's fake-cluster-by-mocking strategy (SURVEY.md section 4 item
6: downstream RPC clients are AsyncMocks)."""

import asyncio
from unittest.mock import AsyncMock

import pytest

from rag_inference_pipeline_tpu.core import Settings
from rag_inference_pipeline_tpu.engine.orchestrator import (
    Orchestrator,
    fuzzy_key,
    normalize_query,
)


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def settings(**over):
    base = dict(
        total_nodes=3,
        gateway_batch_size=4,
        gateway_batch_timeout_ms=10.0,
        gateway_pipeline_chunks=2,
    )
    base.update(over)
    return Settings(**base)


def make_rpc(retrieval_results=None, generation_results=None):
    rpc = AsyncMock()

    async def post(url, payload, target="peer"):
        if "/retrieve" in url:
            return {
                "results": retrieval_results
                or [
                    {"ids": [1, 2], "scores": [0.9, 0.8],
                     "documents": [{"id": 1, "content": "a"}, {"id": 2, "content": "b"}]}
                    for _ in payload["items"]
                ]
            }
        if "/generate" in url:
            return {
                "results": generation_results
                or [
                    {"generated_response": f"answer to {it['query']}",
                     "sentiment": "neutral", "is_toxic": False}
                    for it in payload["items"]
                ]
            }
        raise AssertionError(f"unexpected url {url}")

    rpc.post = post
    rpc.close = AsyncMock()
    return rpc


class TestKeys:
    def test_normalize(self):
        assert normalize_query("  Hello   World ") == "hello world"

    def test_fuzzy_token_sort(self):
        assert fuzzy_key("world hello") == fuzzy_key("Hello   world")


class TestOrchestrator:
    def test_remote_pipeline_via_rpc(self):
        async def main():
            orch = Orchestrator(settings(), rpc=make_rpc())
            await orch.start()
            out = await orch.process_query("what is up", "r1")
            await orch.stop()
            return out

        out = run(main())
        assert out["generated_response"] == "answer to what is up"
        assert out["request_id"] == "r1"

    def test_local_embedding_ships_binary_over_rpc(self):
        """A gateway with a local embedder must hand embeddings to the
        retrieval peer as embeddings_b64 (one base64 f32 block), not
        per-item JSON float lists (~0.55 ms/row parse tax on the peer —
        PERF_NOTES 'Serve-layer ceiling')."""
        import base64

        import numpy as np

        async def main():
            rpc = make_rpc()
            orig = rpc.post
            bodies = []

            async def spy(url, payload, target="peer"):
                if "/retrieve" in url:
                    bodies.append(payload)
                return await orig(url, payload, target)

            rpc.post = spy

            class FakeEmbedder:
                is_loaded = True

                def encode(self, texts):
                    return np.full((len(texts), 8), 0.5, np.float32)

            orch = Orchestrator(
                settings(), rpc=rpc, embedder=FakeEmbedder()
            )
            await orch.start()
            await orch.process_query("binary wire check", "r9")
            await orch.stop()
            return bodies

        bodies = run(main())
        assert bodies, "retrieval RPC not exercised"
        body = bodies[0]
        emb = np.frombuffer(
            base64.b64decode(body["embeddings_b64"]), np.float32
        ).reshape(len(body["items"]), 8)
        assert np.allclose(emb, 0.5)
        assert all("embedding" not in it for it in body["items"])

    def test_query_cache_hit(self):
        async def main():
            calls = {"n": 0}
            rpc = make_rpc()
            orig_post = rpc.post

            async def counting_post(url, payload, target="peer"):
                if "/generate" in url:
                    calls["n"] += 1
                return await orig_post(url, payload, target)

            rpc.post = counting_post
            orch = Orchestrator(settings(), rpc=rpc)
            await orch.start()
            a = await orch.process_query("same question", "r1")
            b = await orch.process_query("  SAME   question ", "r2")
            await orch.stop()
            return a, b, calls["n"]

        a, b, n = run(main())
        assert a["generated_response"] == b["generated_response"]
        assert b["request_id"] == "r2"
        assert n == 1  # second hit served from cache

    def test_batch_coalescing_and_chunking(self):
        async def main():
            batch_sizes = []
            rpc = make_rpc()
            orig = rpc.post

            async def spy(url, payload, target="peer"):
                if "/retrieve" in url:
                    batch_sizes.append(len(payload["items"]))
                return await orig(url, payload, target)

            rpc.post = spy
            orch = Orchestrator(settings(gateway_batch_size=4), rpc=rpc)
            await orch.start()
            outs = await asyncio.gather(
                *(orch.process_query(f"q {i}", f"r{i}") for i in range(4))
            )
            await orch.stop()
            return outs, batch_sizes

        outs, sizes = run(main())
        assert len(outs) == 4
        # batch of 4 split into gateway_pipeline_chunks=2 chunks of 2
        assert sorted(sizes) == [2, 2]

    def test_stage_error_fails_chunk(self):
        async def main():
            rpc = make_rpc()

            async def failing_post(url, payload, target="peer"):
                raise RuntimeError("retrieval exploded")

            rpc.post = failing_post
            orch = Orchestrator(settings(), rpc=rpc)
            await orch.start()
            with pytest.raises(RuntimeError, match="retrieval exploded"):
                await orch.process_query("doomed", "r1")
            await orch.stop()

        run(main())

    def test_local_generation_service_used(self):
        class FakeGen:
            def __init__(self):
                self.calls = []

            def process_batch(self, items):
                self.calls.append(len(items))
                return [
                    {"generated_response": "local!", "sentiment": "positive",
                     "is_toxic": False}
                    for _ in items
                ]

        async def main():
            gen = FakeGen()
            orch = Orchestrator(
                settings(), rpc=make_rpc(), generation_service=gen
            )
            await orch.start()
            out = await orch.process_query("hello", "r1")
            await orch.stop()
            return out, gen.calls

        out, calls = run(main())
        assert out["generated_response"] == "local!"
        assert calls  # local path used, not RPC

    def test_fuzzy_cache_mode(self):
        async def main():
            orch = Orchestrator(
                settings(query_cache_fuzzy=True), rpc=make_rpc()
            )
            await orch.start()
            a = await orch.process_query("world hello", "r1")
            b = await orch.process_query("hello world", "r2")
            await orch.stop()
            return a, b

        a, b = run(main())
        assert a["generated_response"] == b["generated_response"]


class TestChunkIsolation:
    def test_failed_chunk_does_not_fail_healthy_chunks(self):
        """Chunk-level failure isolation end to end through the scheduler."""

        async def main():
            calls = {"n": 0}
            rpc = make_rpc()
            orig = rpc.post

            async def flaky(url, payload, target="peer"):
                if "/retrieve" in url:
                    calls["n"] += 1
                    if calls["n"] == 2:  # second chunk's retrieval dies
                        raise RuntimeError("transient retrieval failure")
                return await orig(url, payload, target)

            rpc.post = flaky
            orch = Orchestrator(
                settings(gateway_batch_size=4, gateway_pipeline_chunks=2),
                rpc=rpc,
            )
            await orch.start()
            results = await asyncio.gather(
                *(orch.process_query(f"iso {i}", f"r{i}") for i in range(4)),
                return_exceptions=True,
            )
            await orch.stop()
            return results

        results = run(main())
        oks = [r for r in results if isinstance(r, dict)]
        fails = [r for r in results if isinstance(r, Exception)]
        assert len(oks) == 2 and len(fails) == 2  # only the bad chunk failed

    def test_peer_count_mismatch_detected(self):
        async def main():
            rpc = make_rpc()

            async def short(url, payload, target="peer"):
                if "/retrieve" in url:
                    return {"results": []}  # wrong count
                raise AssertionError

            rpc.post = short
            orch = Orchestrator(settings(), rpc=rpc)
            await orch.start()
            with pytest.raises(RuntimeError, match="returned 0 results"):
                await orch.process_query("x", "r1")
            await orch.stop()

        run(main())

    def test_cache_key_includes_k(self):
        async def main():
            ks = []
            rpc = make_rpc()
            orig = rpc.post

            async def spy(url, payload, target="peer"):
                if "/retrieve" in url:
                    ks.extend(it.get("k") for it in payload["items"])
                return await orig(url, payload, target)

            rpc.post = spy
            orch = Orchestrator(settings(), rpc=rpc)
            await orch.start()
            await orch.process_query("same q", "r1", k=5)
            await orch.process_query("same q", "r2", k=50)  # must NOT hit cache
            await orch.stop()
            return ks

        assert run(main()) == [5, 50]
