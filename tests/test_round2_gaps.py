"""Round-2 test-depth items (VERDICT #10): compression round-trip over a
live app backed by a dp-SHARDED index; orchestrator RPC-failure fan-out with
mixed local/remote stages; IVF-PQ + OPQ recall regression at 100k scale."""

import asyncio
from unittest.mock import AsyncMock

import jax
import numpy as np
import pytest

from rag_inference_pipeline_tpu.core import Settings, make_mesh
from rag_inference_pipeline_tpu.serve.compression import compress, decompress


class TestShardedIndexCompressionRoundTrip:
    def test_zstd_roundtrip_against_live_sharded_app(self):
        """POST a zstd-compressed /retrieve body to a live aiohttp app whose
        flat index is dp=4-sharded on the fake mesh; response comes back
        compressed and decodes to the same ids the unsharded oracle gives."""
        from aiohttp.test_utils import TestClient, TestServer

        from rag_inference_pipeline_tpu.index import FlatIndex
        from rag_inference_pipeline_tpu.serve.factory import build_registry
        from rag_inference_pipeline_tpu.serve.http import create_app
        from tests.test_serve import (
            make_overrides,
            single_node_profile,
            tiny_settings,
        )

        s = tiny_settings(compression_min_bytes=10, mesh_dp=4, mesh_tp=2)
        rng = np.random.default_rng(0)
        ov = make_overrides(s, rng)
        # swap in a dp-sharded index over the same vectors
        ctx = make_mesh(dp=4, tp=2)
        docs_vecs = np.asarray(
            ov["embedder"].encode(
                [f"document body {i} topic{i % 7}" for i in range(256)]
            )
        )
        sharded = FlatIndex(
            docs_vecs.shape[1], dtype="float32", use_fused=False, mesh=ctx
        )
        sharded.add(docs_vecs)
        ov["index"].index = sharded

        q_vec = docs_vecs[17] + 0.001 * rng.standard_normal(docs_vecs.shape[1])
        payload = {"items": [{"embedding": q_vec.tolist(), "k": 5}]}

        async def main():
            registry = build_registry(s, single_node_profile(), overrides=ov)
            app = create_app(s, single_node_profile(), registry)
            client = TestClient(TestServer(app))
            await client.start_server()
            try:
                import json

                body, was = compress(
                    json.dumps(payload).encode(), min_bytes=10
                )
                assert was
                r = await client.post(
                    "/retrieve",
                    data=body,
                    headers={
                        "Content-Type": "application/json",
                        "X-Ragtpu-Encoding": "zstd",
                        "X-Ragtpu-Accept-Encoding": "zstd",
                    },
                )
                assert r.status == 200, await r.text()
                raw = await r.read()
                if r.headers.get("X-Ragtpu-Encoding") == "zstd":
                    raw = decompress(raw)
                out = json.loads(raw)
                ids = out["results"][0]["ids"]
                oracle = np.argsort(-(q_vec @ docs_vecs.T))[:5]
                assert ids[0] == 17
                assert set(ids) == set(int(i) for i in oracle)
            finally:
                await client.close()

        asyncio.new_event_loop().run_until_complete(main())


class TestOrchestratorMixedLocalRemoteFailure:
    """Gateway runs a LOCAL embedder stage; the REMOTE generation stage
    fails — local work must not mask the remote failure, and retried
    transients must recover (reference rpc_client.py:103-108 retry + the
    chunk-failure fan-out orchestrator.py:534-539)."""

    def _settings(self, **over):
        base = dict(
            total_nodes=3, gateway_batch_size=4,
            gateway_batch_timeout_ms=10.0, gateway_pipeline_chunks=2,
        )
        base.update(over)
        return Settings(**base)

    def test_remote_generation_failure_fans_out_only_its_chunk(self):
        from rag_inference_pipeline_tpu.engine.orchestrator import Orchestrator

        class LocalEmbedder:
            is_loaded = True
            calls = 0

            def encode(self, texts):
                LocalEmbedder.calls += 1
                return np.ones((len(texts), 8), np.float32)

        async def main():
            rpc = AsyncMock()
            gen_calls = {"n": 0}

            async def post(url, payload, target="peer"):
                if "/retrieve" in url:
                    return {"results": [
                        {"ids": [1], "scores": [0.9],
                         "documents": [{"id": 1, "content": "a"}]}
                        for _ in payload["items"]
                    ]}
                if "/generate" in url:
                    gen_calls["n"] += 1
                    if gen_calls["n"] == 1:  # first chunk's generation dies
                        raise RuntimeError("generation node down")
                    return {"results": [
                        {"generated_response": "ok", "sentiment": "neutral",
                         "is_toxic": False}
                        for _ in payload["items"]
                    ]}
                raise AssertionError(url)

            rpc.post = post
            rpc.close = AsyncMock()
            orch = Orchestrator(
                self._settings(), rpc=rpc, embedder=LocalEmbedder()
            )
            await orch.start()
            results = await asyncio.gather(
                *(orch.process_query(f"mix {i}", f"r{i}") for i in range(4)),
                return_exceptions=True,
            )
            await orch.stop()
            return results

        results = asyncio.new_event_loop().run_until_complete(main())
        oks = [r for r in results if isinstance(r, dict)]
        fails = [r for r in results if isinstance(r, Exception)]
        assert len(oks) == 2 and len(fails) == 2
        assert LocalEmbedder.calls >= 1  # local stage genuinely ran
        assert all(r["generated_response"] == "ok" for r in oks)


class TestIVFPQOPQRecallRegression:
    @pytest.mark.slow
    def test_opq_recall_at_100k(self):
        """OPQ + rescore must clear recall@10 >= 0.95 at 100k x 64 on a
        clustered corpus (VERDICT item #10: 'IVF-PQ OPQ recall regression
        test at >=100k scale').

        Measured rescore ladder on this corpus (nprobe invariant 64..256 —
        coarse recall is NOT the limiter; ADC shortlist ranking is):
        rescore_k=64 -> 0.787, rescore_k=256 -> 0.963. True-neighbor score
        gaps are tighter than the PQ distortion here, so the ADC shortlist
        must be ~25x k for the exact re-score to recover the true top-10 —
        the same regime faiss handles with a refine factor."""
        from rag_inference_pipeline_tpu.index import IVFPQIndex
        from rag_inference_pipeline_tpu.ops import exact_topk

        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        n, d, nlist, m, b, k = 100_000, 64, 256, 16, 16, 10
        centers = rng.standard_normal((nlist, d), dtype=np.float32) * 2
        x = centers[rng.integers(0, nlist, n)] + rng.standard_normal(
            (n, d), dtype=np.float32
        )
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        # anisotropic stretch so OPQ's rotation has something to learn
        scale = np.linspace(0.2, 2.0, d).astype(np.float32)
        x = x * scale
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        q = x[rng.integers(0, n, b)] + 0.01 * rng.standard_normal(
            (b, d), dtype=np.float32
        )
        qj = jnp.asarray(q)
        _, oracle = exact_topk(qj, jnp.asarray(x), k, chunk=32768)
        oracle = np.asarray(oracle)

        idx = IVFPQIndex(
            d, nlist, m, nprobe=64, rescore_k=256, opq=True,
        )
        idx.train_add(x, train_size=20000, kmeans_iters=8, pq_iters=8)
        _, ids = idx.search(qj, k)
        ids = np.asarray(ids)
        rec = np.mean(
            [len(set(ids[i]) & set(oracle[i])) / k for i in range(b)]
        )
        assert rec >= 0.95, f"OPQ+rescore recall@10 {rec:.3f} < 0.95 at 100k"


class TestFusedExecutorBadDecode:
    """VERDICT #7 test hole: the fused executor's host-side
    sentiment/toxicity stage must survive a bad decode — out-of-vocab /
    negative token ids and an immediate-eos (empty text) row must still
    yield one well-formed response per item."""

    def test_postproc_survives_garbage_tokens(self):
        from rag_inference_pipeline_tpu.engine.fused_executor import FusedExecutor
        from rag_inference_pipeline_tpu.models.components import (
            EmbedderComponent,
            LLMComponent,
            SentimentComponent,
            ToxicityComponent,
        )
        from tests.test_serve import tiny_settings

        s = tiny_settings(use_fused_pipeline=True)
        emb = EmbedderComponent(s)
        emb.load()
        llm = LLMComponent(s)
        llm.load()
        sent = SentimentComponent(s)
        sent.load()
        tox = ToxicityComponent(s)
        tox.load()

        class _Mesh:
            dp = 1
            tp = 1

        ex = FusedExecutor(
            s, mesh_ctx=_Mesh(), embedder=emb, index=None, llm=llm,
            sentiment=sent, toxicity=tox,
        )
        ex.doc_tokens = np.ones((8, 4), np.int32)  # skip load(); stub store

        eos = llm.tokenizer.eos_id
        vocab = llm.cfg.vocab_size

        class _BadPipe:
            def step(self, emb_ids, emb_mask, lm_ids, lm_mask):
                b = emb_ids.shape[0]
                toks = np.full((b, 4), vocab + 1000, np.int64)  # out of vocab
                toks[0, :] = eos  # empty generation
                if b > 1:
                    toks[1, :] = -7  # negative ids
                from rag_inference_pipeline_tpu.engine.device_pipeline import (
                    RAGStepOutput,
                )
                return RAGStepOutput(
                    tokens=toks,
                    doc_ids=np.zeros((b, 5), np.int32),
                    scores=np.zeros((b, 5), np.float32),
                )

        ex._pipe = _BadPipe()
        out = ex.process_batch(
            [{"query": "alpha"}, {"query": "beta"}, {"query": "gamma"}]
        )
        assert len(out) == 3
        for r in out:
            assert set(r) == {"generated_response", "sentiment", "is_toxic"}
            assert isinstance(r["generated_response"], str)
            assert isinstance(r["is_toxic"], bool)


class TestNativeStoreCorruptFiles:
    """ADVICE round-1 item: ds_open must reject truncated/corrupt store
    files cleanly (NULL handle -> FileNotFoundError in the wrapper), never
    follow out-of-range slot/arena pointers (SIGSEGV)."""

    DOCS = [(i, f"title {i}", f"content body {i}") for i in range(20)]

    def _good_file(self, tmp_path):
        from rag_inference_pipeline_tpu.utils.docstore import build_native_store

        p = str(tmp_path / "good.ragdoc")
        build_native_store(p, self.DOCS)
        return p

    def _expect_rejected(self, path):
        from rag_inference_pipeline_tpu.utils.docstore import _NativeBackend

        with pytest.raises(FileNotFoundError):
            _NativeBackend(path, populate=False)

    def test_truncated_mid_slots(self, tmp_path):
        raw = open(self._good_file(tmp_path), "rb").read()
        p = str(tmp_path / "trunc.ragdoc")
        open(p, "wb").write(raw[: 32 + 16])  # header + half a slot
        self._expect_rejected(p)

    def test_bad_magic(self, tmp_path):
        raw = bytearray(open(self._good_file(tmp_path), "rb").read())
        raw[:8] = b"NOTMAGIC"
        p = str(tmp_path / "magic.ragdoc")
        open(p, "wb").write(bytes(raw))
        self._expect_rejected(p)

    def test_nslots_not_power_of_two(self, tmp_path):
        import struct

        raw = bytearray(open(self._good_file(tmp_path), "rb").read())
        raw[16:24] = struct.pack("<Q", 63)  # nslots: corrupt to non-pow2
        p = str(tmp_path / "nslots.ragdoc")
        open(p, "wb").write(bytes(raw))
        self._expect_rejected(p)

    def test_arena_offset_past_eof(self, tmp_path):
        import struct

        raw = bytearray(open(self._good_file(tmp_path), "rb").read())
        raw[24:32] = struct.pack("<Q", len(raw) + 4096)  # arena beyond file
        p = str(tmp_path / "arena.ragdoc")
        open(p, "wb").write(bytes(raw))
        self._expect_rejected(p)

    def test_oversized_lengths_clamped_not_crash(self, tmp_path):
        """A slot whose title/content length points past the arena must
        come back as a miss (or clean string), never read out of bounds."""
        import struct

        from rag_inference_pipeline_tpu.utils.docstore import _NativeBackend

        raw = bytearray(open(self._good_file(tmp_path), "rb").read())
        # walk slots (header is 32 bytes, slot is 24): corrupt every
        # occupied slot's content_len to a huge value
        nslots = struct.unpack("<Q", raw[16:24])[0]
        for s in range(nslots):
            off = 32 + s * 24
            sid = struct.unpack("<Q", raw[off : off + 8])[0]
            if sid != 0xFFFFFFFFFFFFFFFF:
                raw[off + 20 : off + 24] = struct.pack("<i", 2**30)
        p = str(tmp_path / "len.ragdoc")
        open(p, "wb").write(bytes(raw))
        be = _NativeBackend(p, populate=False)
        out = be.get_batch([d[0] for d in self.DOCS[:5]])
        for r in out:
            assert r is None or len(r["content"]) < 2**20
        be.close()


class TestClearCacheEndpoint:
    """/clear_cache parity: clears local caches and (single-node) returns
    the cleared list; repeated queries after clearing recompute instead of
    serving the cached response (reference gateway/api.py:181-209)."""

    def test_clear_cache_and_recompute(self):
        from tests.test_serve import (
            make_overrides,
            single_node_profile,
            tiny_settings,
        )
        from rag_inference_pipeline_tpu.serve.factory import build_registry
        from rag_inference_pipeline_tpu.serve.http import create_app

        s_outer = tiny_settings()
        rng = np.random.default_rng(1)
        ov = make_overrides(s_outer, rng)

        async def main():
            from aiohttp.test_utils import TestClient, TestServer

            registry = build_registry(
                s_outer, single_node_profile(), overrides=ov
            )
            app = create_app(s_outer, single_node_profile(), registry)
            client = TestClient(TestServer(app))
            await client.start_server()
            try:
                q = {"query": "tell me about topic3", "request_id": "r1"}
                r1 = await client.post("/query", json=q)
                assert r1.status == 200, await r1.text()
                orch = registry.get_optional("orchestrator")
                key = ("tell me about topic3", s_outer.retrieval_k)
                assert orch.query_cache.get(key) is not None  # cached

                rc = await client.post("/clear_cache", json={})
                assert rc.status == 200
                cleared = (await rc.json())["cleared"]
                assert "query" in cleared
                assert orch.query_cache.get(key) is None

                r2 = await client.post(
                    "/query", json={**q, "request_id": "r2"}
                )
                assert r2.status == 200
                out1, out2 = await r1.json(), await r2.json()
                assert (
                    out1["generated_response"] == out2["generated_response"]
                )  # deterministic recompute
            finally:
                await client.close()

        asyncio.new_event_loop().run_until_complete(main())


class TestEngineDefaultOnFallbacks:
    """use_continuous_batching defaults ON since round 2 — services and
    orchestrator must degrade to the sync path when the engine is absent
    (stub LLMs, failed engine start, engine-less deployments)."""

    def test_generation_service_falls_back_without_engine(self):
        from rag_inference_pipeline_tpu.serve.services import GenerationService

        class StubLLM:  # no generate_batch_engine, no engine attr
            is_loaded = True
            random_weights = False

            def generate_batch(self, qs, ds, max_new_tokens=None):
                return [f"sync:{q}" for q in qs]

        s = Settings(use_continuous_batching=True)
        svc = GenerationService(s, llm=StubLLM())
        out = asyncio.new_event_loop().run_until_complete(
            svc.process_batch_async(
                [{"query": "a", "documents": [{"id": 1, "content": "x"}]}]
            )
        )
        assert out[0]["generated_response"] == "sync:a"

    def test_orchestrator_duck_types_engine_path(self):
        from rag_inference_pipeline_tpu.engine.orchestrator import Orchestrator

        class FakeGenNoAsync:  # sync-only service
            def process_batch(self, items):
                return [
                    {"generated_response": "ok", "sentiment": "neutral",
                     "is_toxic": False}
                    for _ in items
                ]

        class FakeRet:
            def process_batch(self, items):
                return [
                    {"ids": [1], "scores": [1.0],
                     "documents": [{"id": 1, "content": "c"}]}
                    for _ in items
                ]

        async def main():
            orch = Orchestrator(
                Settings(
                    use_continuous_batching=True, gateway_batch_timeout_ms=5.0
                ),
                retrieval_executor=FakeRet(),
                generation_service=FakeGenNoAsync(),
            )
            await orch.start()
            out = await orch.process_query("q", "r1")
            await orch.stop()
            return out

        out = asyncio.new_event_loop().run_until_complete(main())
        assert out["generated_response"] == "ok"
