"""In-process integration tests of the HTTP services (SURVEY.md section 4
item 5: FastAPI TestClient pattern -> aiohttp TestClient here): real tiny
models + memory doc store + flat index, full end-to-end /query flow in one
process, plus error taxonomy, payload modes, compression, /health,
/metrics, /clear_cache.
"""

import asyncio
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from rag_inference_pipeline_tpu.core import (
    ComponentRegistry,
    Settings,
    single_node_profile,
)
from rag_inference_pipeline_tpu.index import FlatIndex
from rag_inference_pipeline_tpu.models.components import (
    EmbedderComponent,
    LLMComponent,
    RerankerComponent,
    SentimentComponent,
    ToxicityComponent,
)
from rag_inference_pipeline_tpu.serve.compression import compress, decompress
from rag_inference_pipeline_tpu.serve.factory import build_registry
from rag_inference_pipeline_tpu.serve.http import create_app
from rag_inference_pipeline_tpu.utils.docstore import DocumentStore

N_DOCS = 256
DIM = 64


def tiny_settings(**over) -> Settings:
    base = dict(
        embedding_model="tiny-embed",
        reranker_model="tiny-rerank",
        llm_model="tiny-llm",
        sentiment_model="tiny-sentiment",
        toxicity_model="tiny-toxicity",
        batch_shape_buckets="1,2,4,8",
        prefill_buckets="32,64",
        max_tokens=4,
        truncate_length=64,
        index_dim=DIM,
        index_pq_m=8,
        retrieval_k=5,
        param_dtype="float32",
        doc_store_backend="memory",
        gateway_batch_timeout_ms=10.0,
        retrieval_batch_timeout_ms=5.0,
        generation_batch_timeout_ms=5.0,
    )
    base.update(over)
    return Settings(**base)


class _FakeMesh:
    ctx = None
    is_loaded = True

    def load(self):
        pass

    def unload(self):
        pass


class _IndexWrapper:
    """IndexComponent stand-in holding a prebuilt index."""

    def __init__(self, index):
        self.index = index

    @property
    def is_loaded(self):
        return self.index.is_loaded

    def unload(self):
        self.index.unload()


def make_overrides(settings, rng):
    emb = EmbedderComponent(settings)
    emb.load()
    # corpus embedded with the same embedder so retrieval is semantically
    # consistent end-to-end
    docs = {
        i: {"id": i, "title": f"t{i}", "content": f"document body {i} topic{i % 7}"}
        for i in range(N_DOCS)
    }
    vectors = emb.encode([docs[i]["content"] for i in range(N_DOCS)])
    index = FlatIndex(DIM, dtype="float32", use_fused=False)
    index.add(vectors)
    store = DocumentStore(settings, docs=docs)
    store.load()
    llm = LLMComponent(settings)
    llm.load()
    rr = RerankerComponent(settings)
    rr.load()
    sent = SentimentComponent(settings)
    sent.load()
    tox = ToxicityComponent(settings)
    tox.load()
    return {
        "mesh": _FakeMesh(),
        "embedder": emb,
        "index": _IndexWrapper(index),
        "doc_store": store,
        "reranker": rr,
        "llm": llm,
        "sentiment": sent,
        "toxicity": tox,
    }


def run_app_test(settings, coro_fn, overrides=None):
    async def main():
        rng = np.random.default_rng(0)
        ov = overrides if overrides is not None else make_overrides(settings, rng)
        profile = single_node_profile()
        registry = build_registry(settings, profile, overrides=ov)
        app = create_app(settings, profile, registry)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            await coro_fn(client)
        finally:
            await client.close()

    asyncio.new_event_loop().run_until_complete(main())


class TestEndToEnd:
    def test_query_full_pipeline(self):
        s = tiny_settings()

        async def check(client):
            resp = await client.post(
                "/query", json={"query": "tell me about topic3"}
            )
            assert resp.status == 200, await resp.text()
            body = await resp.json()
            assert set(body) == {
                "request_id", "generated_response", "sentiment", "is_toxic",
            }
            assert isinstance(body["generated_response"], str)
            # cache hit path: same normalized query, new request id
            resp2 = await client.post(
                "/query", json={"query": "  TELL me about topic3 "}
            )
            b2 = await resp2.json()
            assert b2["generated_response"] == body["generated_response"]
            assert b2["request_id"] != body["request_id"]

        run_app_test(s, check)

    def test_query_validation_400(self):
        s = tiny_settings()

        async def check(client):
            resp = await client.post("/query", json={"query": "   "})
            assert resp.status == 400
            body = await resp.json()
            assert body["error_type"] == "validation"
            resp = await client.post("/query", data=b"not json")
            assert resp.status == 400

        run_app_test(s, check)

    def test_retrieve_with_embedding_and_query(self):
        s = tiny_settings()

        async def check(client):
            # query-text path
            resp = await client.post(
                "/retrieve", json={"items": [{"query": "topic2 text"}]}
            )
            assert resp.status == 200, await resp.text()
            body = await resp.json()
            r = body["results"][0]
            assert len(r["ids"]) == 5 and len(r["documents"]) == 5
            # provided-embedding path must match searching that vector
            emb = [0.1] * DIM
            resp = await client.post(
                "/retrieve",
                json={"items": [{"embedding": emb, "k": 3}]},
            )
            body = await resp.json()
            assert len(body["results"][0]["ids"]) == 3

        run_app_test(s, check)

    def test_retrieve_binary_embeddings(self):
        """embeddings_b64 (f32 row-major) must search identically to the
        JSON-float-list path and reject size mismatches."""
        import base64

        s = tiny_settings()

        async def check(client):
            rng = np.random.default_rng(3)
            emb = rng.standard_normal((2, DIM)).astype(np.float32)
            resp = await client.post(
                "/retrieve",
                json={
                    "items": [{"k": 4}, {"k": 4}],
                    "embeddings_b64": base64.b64encode(
                        emb.tobytes()
                    ).decode(),
                },
            )
            assert resp.status == 200, await resp.text()
            b64_ids = [r["ids"] for r in (await resp.json())["results"]]
            resp = await client.post(
                "/retrieve",
                json={"items": [
                    {"embedding": emb[0].tolist(), "k": 4},
                    {"embedding": emb[1].tolist(), "k": 4},
                ]},
            )
            json_ids = [r["ids"] for r in (await resp.json())["results"]]
            assert b64_ids == json_ids
            # wrong byte count -> validation error, not a 500
            resp = await client.post(
                "/retrieve",
                json={
                    "items": [{"k": 4}],
                    "embeddings_b64": base64.b64encode(
                        emb[0, :-1].tobytes()
                    ).decode(),
                },
            )
            assert resp.status == 400

        run_app_test(s, check)

    def test_retrieve_binary_wire_round_trip(self):
        """Itemless binary request (embeddings_b64 + top-level k) +
        response_format=b64 must return the same ids as the JSON wire,
        packed as int32/f32 arrays (the serve-layer fast path —
        PERF_NOTES 'Serve-layer ceiling')."""
        import base64

        s = tiny_settings(documents_payload_mode="id_only")

        async def check(client):
            rng = np.random.default_rng(5)
            emb = rng.standard_normal((3, DIM)).astype(np.float32)
            b64 = base64.b64encode(emb.tobytes()).decode()
            resp = await client.post(
                "/retrieve",
                json={"k": 4, "response_format": "b64",
                      "embeddings_b64": b64},
            )
            assert resp.status == 200, await resp.text()
            body = await resp.json()
            assert body["count"] == 3 and body["k"] == 4
            ids = np.frombuffer(
                base64.b64decode(body["ids_b64"]), np.int32
            ).reshape(3, 4)
            scores = np.frombuffer(
                base64.b64decode(body["scores_b64"]), np.float32
            ).reshape(3, 4)
            assert (ids >= 0).all()
            assert (np.diff(scores, axis=1) <= 1e-6).all()
            # same ids as the json wire
            resp = await client.post(
                "/retrieve",
                json={"items": [{"k": 4}] * 3, "embeddings_b64": b64},
            )
            json_ids = [r["ids"] for r in (await resp.json())["results"]]
            assert ids.tolist() == json_ids
            # neither items nor embeddings -> 400
            resp = await client.post("/retrieve", json={"k": 4})
            assert resp.status == 400
            # bad response_format -> 400
            resp = await client.post(
                "/retrieve",
                json={"k": 4, "embeddings_b64": b64,
                      "response_format": "msgpack"},
            )
            assert resp.status == 400
            # non-multiple byte count on itemless request -> 400
            resp = await client.post(
                "/retrieve",
                json={"k": 4, "embeddings_b64": base64.b64encode(
                    emb.tobytes()[:-4]).decode()},
            )
            assert resp.status == 400

        run_app_test(s, check)

    def test_pack_results_b64_edges(self):
        """Unit edges for the binary response packer: empty batch, ragged
        rows pad with -1/0, document payloads rejected."""
        import base64

        from rag_inference_pipeline_tpu.serve.http import _pack_results_b64

        out = _pack_results_b64([])
        assert out["count"] == 0 and out["k"] == 0 and out["ids_b64"] == ""
        out = _pack_results_b64([
            {"ids": [3], "scores": [0.5]},
            {"ids": [1, 2], "scores": [0.9, 0.8]},
        ])
        ids = np.frombuffer(
            base64.b64decode(out["ids_b64"]), np.int32
        ).reshape(2, 2)
        assert ids.tolist() == [[3, -1], [1, 2]]
        with pytest.raises(ValueError):
            _pack_results_b64(
                [{"ids": [1], "scores": [0.1], "documents": []}]
            )

    def test_retrieve_b64_response_rejected_with_documents(self):
        """response_format=b64 only packs id_only results; with a full
        document payload mode it must 400, not drop the docs."""
        import base64

        s = tiny_settings()  # payload mode: full

        async def check(client):
            rng = np.random.default_rng(6)
            emb = rng.standard_normal((1, DIM)).astype(np.float32)
            resp = await client.post(
                "/retrieve",
                json={"k": 3, "response_format": "b64",
                      "embeddings_b64": base64.b64encode(
                          emb.tobytes()).decode()},
            )
            assert resp.status == 400

        run_app_test(s, check)

    def test_generate_direct(self):
        s = tiny_settings()

        async def check(client):
            resp = await client.post(
                "/generate",
                json={
                    "items": [
                        {
                            "query": "what is this",
                            "documents": [
                                {"id": 1, "content": "some context"}
                            ],
                        }
                    ]
                },
            )
            assert resp.status == 200, await resp.text()
            body = await resp.json()
            r = body["results"][0]
            assert {"generated_response", "sentiment", "is_toxic"} <= set(r)

        run_app_test(s, check)

    def test_health_and_metrics(self):
        s = tiny_settings()

        async def check(client):
            resp = await client.get("/health")
            assert resp.status == 200
            body = await resp.json()
            assert body["status"] == "ok" and body["role"] == "gateway"
            assert body["components"]["llm"] is True
            assert "llm" in body["random_weights"]  # offline mode flagged
            resp = await client.get("/metrics")
            text = await resp.text()
            assert "pipeline_requests_total" in text

        run_app_test(s, check)

    def test_clear_cache(self):
        s = tiny_settings()

        async def check(client):
            await client.post("/query", json={"query": "warm the cache"})
            resp = await client.post("/clear_cache", json={})
            assert resp.status == 200
            body = await resp.json()
            assert "query" in body["cleared"] and "search" in body["cleared"]

        run_app_test(s, check)

    def test_id_only_payload_mode(self):
        s = tiny_settings(documents_payload_mode="id_only")

        async def check(client):
            resp = await client.post(
                "/retrieve", json={"items": [{"query": "topic1"}]}
            )
            body = await resp.json()
            r = body["results"][0]
            assert "documents" not in r and len(r["ids"]) == 5
            # full /query still works: generation fetches by id locally
            resp = await client.post("/query", json={"query": "about topic1"})
            assert resp.status == 200, await resp.text()

        run_app_test(s, check)

    def test_compressed_payload_mode(self):
        s = tiny_settings(documents_payload_mode="compressed")

        async def check(client):
            resp = await client.post(
                "/retrieve", json={"items": [{"query": "topic5"}]}
            )
            body = await resp.json()
            r = body["results"][0]
            assert r.get("compressed_docs")
            resp = await client.post("/query", json={"query": "about topic5"})
            assert resp.status == 200, await resp.text()

        run_app_test(s, check)

    def test_zstd_request_response_compression(self):
        s = tiny_settings(compression_min_bytes=10)

        async def check(client):
            payload = json.dumps(
                {"items": [{"query": "compressed topic2 request " * 20}]}
            ).encode()
            body, was = compress(payload, min_bytes=10)
            assert was
            resp = await client.post(
                "/retrieve",
                data=body,
                headers={
                    "X-Ragtpu-Encoding": "zstd",
                    "X-Ragtpu-Accept-Encoding": "zstd",
                    "Content-Type": "application/json",
                },
            )
            assert resp.status == 200, await resp.text()
            # aiohttp does not auto-decode zstd; decompress manually
            raw = await resp.read()
            out = json.loads(decompress(raw))
            assert out["results"][0]["ids"]

        run_app_test(s, check)

    def test_readiness_503(self):
        s = tiny_settings()

        class _EmptyIndex:
            index = None
            is_loaded = False

            def unload(self):
                pass

        async def check(client):
            resp = await client.post(
                "/retrieve", json={"items": [{"query": "x"}]}
            )
            assert resp.status == 503
            body = await resp.json()
            assert body["error_type"] == "unavailable"

        ov = make_overrides(s, np.random.default_rng(0))
        ov["index"] = _EmptyIndex()
        run_app_test(s, check, overrides=ov)


class TestContinuousBatching:
    def test_query_with_decode_engine(self):
        s = tiny_settings(
            use_continuous_batching=True,
            decode_max_concurrency=4,
            kv_cache_max_len=96,
            decode_segment_steps=4,
        )

        async def check(client):
            import asyncio as aio

            resps = await aio.gather(
                *(
                    client.post("/query", json={"query": f"question {i} topic{i}"})
                    for i in range(5)
                )
            )
            for r in resps:
                assert r.status == 200, await r.text()
                body = await r.json()
                assert isinstance(body["generated_response"], str)

        run_app_test(s, check)


class TestProfileEndpoints:
    def test_trace_start_stop(self):
        s = tiny_settings()

        async def check(client):
            r1 = await client.post("/profile/start")
            assert r1.status == 200
            body = await r1.json()
            assert body["status"] == "tracing"
            r_dup = await client.post("/profile/start")
            assert r_dup.status == 409  # double start rejected
            r2 = await client.post("/profile/stop")
            assert r2.status == 200
            r3 = await client.post("/profile/stop")
            assert r3.status in (200, 409)

        run_app_test(s, check)


class TestFusedPipeline:
    def test_query_through_fused_device_path(self, tmp_path):
        # doc token store in decoder token space (hash tokenizer)
        import numpy as np

        from rag_inference_pipeline_tpu.models.tokenizer import HashTokenizer

        tk = HashTokenizer(vocab_size=512, eos_id=2)
        tok_ids = np.stack(
            [tk.encode(f"document body {i} topic{i % 7}", 8)[0] for i in range(N_DOCS)]
        ).astype(np.int32)
        tok_path = str(tmp_path / "doc_tokens.npy")
        np.save(tok_path, tok_ids)

        s = tiny_settings(
            use_fused_pipeline=True,
            doc_tokens_path=tok_path,
            mesh_dp=1,
            mesh_tp=1,
            max_tokens=3,
        )

        async def check(client):
            resp = await client.post(
                "/query", json={"query": "fused question about topic2"}
            )
            assert resp.status == 200, await resp.text()
            body = await resp.json()
            assert {"generated_response", "sentiment", "is_toxic"} <= set(body)
            # health shows the fused executor loaded
            h = await (await client.get("/health")).json()
            assert h["components"].get("fused_executor") is True

        run_app_test(s, check)


class TestCorsGzip:
    """CORS + standard-gzip middleware (reference runtime_factory.py:146-158)."""

    def test_cors_headers_and_preflight(self):
        s = tiny_settings()

        async def check(client):
            resp = await client.get("/health")
            # no Origin header -> wildcard
            assert resp.headers["Access-Control-Allow-Origin"] == "*"
            assert resp.headers["Access-Control-Allow-Credentials"] == "true"
            # credentialed clients need the origin ECHOED (spec forbids
            # '*' with credentials) + Vary: Origin
            resp = await client.get(
                "/health", headers={"Origin": "http://app.example"}
            )
            assert (
                resp.headers["Access-Control-Allow-Origin"]
                == "http://app.example"
            )
            assert "Origin" in resp.headers.get("Vary", "")
            # genuine preflight -> 204 with CORS headers
            pre = await client.options(
                "/query",
                headers={
                    "Origin": "http://app.example",
                    "Access-Control-Request-Method": "POST",
                },
            )
            assert pre.status == 204
            assert pre.headers["Access-Control-Allow-Methods"] == "*"
            # plain OPTIONS (no preflight headers) is NOT hijacked
            plain = await client.options("/query")
            assert plain.status in (404, 405)

        run_app_test(s, check)

    def test_gzip_round_trip(self):
        import gzip as _gzip
        import json as _json

        s = tiny_settings()

        async def check(client):
            # gzip request body decompressed transparently
            body = _gzip.compress(
                _json.dumps({"query": "topic1 " * 200}).encode()
            )
            resp = await client.post(
                "/query", data=body,
                headers={"Content-Encoding": "gzip",
                         "Content-Type": "application/json"},
            )
            assert resp.status == 200, await resp.text()
            # large response gzip-encoded when the client accepts it
            # (aiohttp's TestClient auto-decodes, so check the header)
            resp2 = await client.post(
                "/retrieve",
                json={"items": [{"query": f"topic{i}"} for i in range(8)]},
                headers={"Accept-Encoding": "gzip"},
            )
            assert resp2.status == 200
            body2 = await resp2.json()
            assert len(body2["results"]) == 8

        run_app_test(s, check)
