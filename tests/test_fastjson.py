"""Native JSON codec (native/fastjson.cc via utils/fastjson.py) — the
orjson/msgspec role on the /retrieve hot path.

The contract under test: the fast path either (a) produces EXACTLY what the
stdlib json + pydantic path produces, or (b) returns None and the slow path
runs — never a third behavior. Differential checks cover the strict shape,
every documented fallback trigger, and random fuzz against json.loads.
"""

import json
import math

import numpy as np
import pytest

from rag_inference_pipeline_tpu.utils import fastjson

DIM = 8


def _req(n=3, dim=DIM, rng=None, **top):
    rng = rng or np.random.default_rng(0)
    items = [
        {"query": "", "embedding": rng.standard_normal(dim).tolist()}
        for _ in range(n)
    ]
    return {"items": items, **top}


def _body(obj) -> bytes:
    return json.dumps(obj).encode()


class TestParseFastPath:
    def test_parses_reference_parity_request(self, rng):
        obj = _req(rng=rng, rerank=True, k=7)
        out = fastjson.parse_retrieve(_body(obj), DIM)
        assert out is not None
        assert out.rerank is True and out.k == 7
        assert out.response_format == "json"
        want = np.asarray(
            [it["embedding"] for it in obj["items"]], np.float32
        )
        np.testing.assert_array_equal(out.embeddings, want)
        assert (out.item_k == -1).all()

    def test_per_item_k_and_defaults(self, rng):
        obj = _req(n=2, rng=rng)
        obj["items"][1]["k"] = 3
        out = fastjson.parse_retrieve(_body(obj), DIM)
        assert out is not None
        assert out.rerank is False and out.k is None
        assert list(out.item_k) == [-1, 3]

    def test_response_format_b64(self, rng):
        out = fastjson.parse_retrieve(
            _body(_req(rng=rng, response_format="b64")), DIM
        )
        assert out is not None and out.response_format == "b64"

    def test_null_k_and_whitespace(self, rng):
        obj = _req(n=1, rng=rng, k=None)
        obj["items"][0]["k"] = None
        body = json.dumps(obj, indent=3).encode()  # heavy whitespace
        out = fastjson.parse_retrieve(body, DIM)
        assert out is not None and out.k is None and out.item_k[0] == -1

    def test_unknown_keys_skipped_like_pydantic(self, rng):
        obj = _req(n=1, rng=rng)
        obj["extra"] = {"nested": [1, "two", None, {"deep": True}]}
        obj["items"][0]["note"] = "hi \\u00e9"
        out = fastjson.parse_retrieve(_body(obj), DIM)
        assert out is not None

    def test_number_forms_match_stdlib(self):
        emb = "[1, -2.5, 3e2, 0.125, -0, 4E-3, 60e+1, 0]"
        body = ('{"items":[{"embedding":' + emb + "}]}").encode()
        out = fastjson.parse_retrieve(body, DIM)
        want = np.asarray(json.loads(emb), np.float32)
        np.testing.assert_array_equal(out.embeddings[0], want)


class TestParseFallsBack:
    @pytest.mark.parametrize(
        "mutate",
        [
            lambda o: o["items"][0].pop("embedding"),  # missing embedding
            lambda o: o["items"][0].update(query="hello"),  # text query
            lambda o: o["items"][0].update(embedding=[1.0]),  # dim mismatch
            lambda o: o["items"][0].update(embedding=[]),  # empty
            lambda o: o.update(embeddings_b64="AAAA"),  # binary wire
            lambda o: o.update(response_format="xml"),  # invalid enum
            lambda o: o.update(items=[]),  # empty batch
            lambda o: o.pop("items"),  # schema-invalid
            lambda o: o.update(k=-2),  # negative k: let pydantic decide
            lambda o: o["items"][0].update(
                embedding=[float("nan")] * DIM
            ),  # NaN literal (stdlib accepts, fast path declines)
        ],
    )
    def test_fallback_cases(self, mutate, rng):
        obj = _req(n=2, rng=rng)
        mutate(obj)
        body = json.dumps(obj).encode()
        assert fastjson.parse_retrieve(body, DIM) is None
        json.loads(body)  # and the body IS stdlib-parseable

    @pytest.mark.parametrize(
        "body",
        [
            b"",
            b"{",
            b"[]",
            b'{"items":[{"embedding":[1,2,3,4,5,6,7,8]}]} trailing',
            b'{"items":[{"embedding":[1,2,3,4,5,6,7,8,]}]}',  # trailing comma
            b'{"items":[{"embedding":[1 2]}]}',
            b'{"items": [{"embedding": [0x1f]}]}',  # hex: json rejects too
            b'{"items": [{"embedding": [1e]}]}',
            b'{"items" [{"embedding": [1]}]}',  # missing colon
            '{"itemsé": 1}'.encode(),  # non-ascii key: conservative
        ],
    )
    def test_malformed_or_exotic_returns_none(self, body):
        assert fastjson.parse_retrieve(body, DIM) is None

    def test_duplicate_top_level_k_keeps_last_like_stdlib(self, rng):
        obj = _req(n=1, rng=rng)
        body = json.dumps(obj)[:-1] + ', "k": 2, "k": 9}'
        out = fastjson.parse_retrieve(body.encode(), DIM)
        assert out is not None and out.k == 9

    def test_fuzz_differential_vs_stdlib(self, rng):
        """Random mutations: whenever the fast path accepts, its output must
        match what stdlib parsing would build."""
        for trial in range(200):
            n = int(rng.integers(1, 5))
            obj = _req(n=n, rng=rng)
            if rng.random() < 0.3:
                obj["rerank"] = bool(rng.random() < 0.5)
            if rng.random() < 0.3:
                obj["k"] = int(rng.integers(0, 50))
            if rng.random() < 0.3:
                obj["items"][0]["k"] = int(rng.integers(0, 9))
            body = json.dumps(obj).encode()
            if rng.random() < 0.3:
                # random byte corruption — must never crash, and if it still
                # parses it must agree with stdlib
                pos = int(rng.integers(0, len(body)))
                body = body[:pos] + bytes([int(rng.integers(32, 127))]) + body[pos + 1:]
            out = fastjson.parse_retrieve(body, DIM)
            try:
                ref = json.loads(body)
            except json.JSONDecodeError:
                assert out is None
                continue
            if out is None:
                continue  # conservative fallback is always allowed
            assert isinstance(ref, dict)
            ref_items = ref["items"]
            assert out.embeddings.shape[0] == len(ref_items)
            for i, it in enumerate(ref_items):
                np.testing.assert_array_equal(
                    out.embeddings[i], np.asarray(it["embedding"], np.float32)
                )
                want_k = it.get("k")
                got_k = int(out.item_k[i])
                assert (want_k is None and got_k == -1) or want_k == got_k
            assert out.rerank == bool(ref.get("rerank", False))
            ref_k = ref.get("k")
            assert (ref_k is None and out.k is None) or ref_k == out.k


class TestEncode:
    def test_round_trip_matches_pydantic_shape(self, rng):
        results = [
            {
                "ids": [int(x) for x in rng.integers(0, 10**7, 5)],
                "scores": [float(np.float32(x)) for x in rng.standard_normal(5)],
            }
            for _ in range(4)
        ]
        enc = fastjson.encode_results(results)
        assert enc is not None
        got = json.loads(enc)
        from rag_inference_pipeline_tpu.serve.schemas import RetrieveResponse

        want = RetrieveResponse(results=results).model_dump(exclude_none=True)
        assert list(got.keys()) == ["results"]
        for g, w in zip(got["results"], want["results"]):
            assert g["ids"] == w["ids"]
            # %.9g is f32-round-trip exact; pydantic prints the double — equal
            # at the f32 precision the data actually carries
            np.testing.assert_array_equal(
                np.asarray(g["scores"], np.float32),
                np.asarray(w["scores"], np.float32),
            )

    def test_ragged_and_empty_rows(self):
        results = [
            {"ids": [1, 2, 3], "scores": [0.5, 0.25, 0.125]},
            {"ids": [], "scores": []},
            {"ids": [9], "scores": [1.0]},
        ]
        got = json.loads(fastjson.encode_results(results))
        assert got["results"][1] == {"ids": [], "scores": []}
        assert got["results"][2]["ids"] == [9]

    def test_declines_document_payloads(self):
        assert (
            fastjson.encode_results(
                [{"ids": [1], "scores": [1.0], "documents": [{"id": 1}]}]
            )
            is None
        )
        # exclude_none shape: documents key present but None is fine
        assert (
            fastjson.encode_results(
                [{"ids": [1], "scores": [1.0], "documents": None}]
            )
            is not None
        )

    def test_big_ids_survive(self):
        results = [{"ids": [2**52], "scores": [1.0]}]
        got = json.loads(fastjson.encode_results(results))
        assert got["results"][0]["ids"] == [2**52]


class TestServeIntegration:
    def test_retrieve_fast_and_slow_paths_agree(self, rng):
        """Drive the live app twice — fast_json on/off — same response."""
        from tests.test_serve import (
            DIM as SERVE_DIM,
            make_overrides,
            run_app_test,
            tiny_settings,
        )

        emb_payload = {
            "items": [
                {
                    "query": "",
                    "embedding": rng.standard_normal(SERVE_DIM).tolist(),
                }
                for _ in range(3)
            ],
            "k": 2,
        }
        out = {}

        for flag in (True, False):
            s = tiny_settings(fast_json=flag, documents_payload_mode="id_only")

            async def check(client):
                resp = await client.post("/retrieve", json=emb_payload)
                assert resp.status == 200
                out[flag] = await resp.json()

            run_app_test(s, check, overrides=make_overrides(s, rng))

        fast, slow = out[True], out[False]
        assert len(fast["results"]) == len(slow["results"]) == 3
        for f, sl in zip(fast["results"], slow["results"]):
            assert f["ids"] == sl["ids"]
            np.testing.assert_array_equal(
                np.asarray(f["scores"], np.float32),
                np.asarray(sl["scores"], np.float32),
            )

    def test_malformed_still_400_with_fast_json(self, rng):
        from tests.test_serve import make_overrides, run_app_test, tiny_settings

        s = tiny_settings(fast_json=True)

        async def check(client):
            resp = await client.post(
                "/retrieve", data=b'{"items": [{"embedding": [1,2,]}]}',
                headers={"Content-Type": "application/json"},
            )
            assert resp.status == 400

        run_app_test(s, check, overrides=make_overrides(s, rng))
