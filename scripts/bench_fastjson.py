#!/usr/bin/env python
"""Host microbench: native JSON codec vs stdlib json + pydantic on the
/retrieve JSON-parity wire (PERF_NOTES "Serve-layer ceiling": the stdlib
path costs 284 ms parse + 40 ms encode per batch-512 request = the entire
785 QPS JSON-wire cap).

Pure host, no TPU. Writes artifacts/round3/fastjson_bench.json.
"""

from __future__ import annotations

try:  # repo-root import without pip install; scripts/ is sys.path[0]
    # only when run as a script — harmless to skip when imported as a
    # module by tests (the package is importable there already)
    import _pathfix  # noqa: F401
except ImportError:
    pass

import json
import time

import numpy as np


def main() -> None:
    from rag_inference_pipeline_tpu.serve.schemas import (
        RetrieveRequest,
        RetrieveResponse,
    )
    from rag_inference_pipeline_tpu.utils import fastjson

    rng = np.random.default_rng(0)
    out: dict = {}
    for b, dim, reps in ((128, 768, 10), (512, 768, 5)):
        emb = rng.standard_normal((b, dim)).astype(np.float32)
        body = json.dumps(
            {
                "items": [
                    {"query": "", "embedding": emb[i].tolist()}
                    for i in range(b)
                ],
                "k": 10,
            }
        ).encode()

        t0 = time.perf_counter()
        for _ in range(reps):
            req = RetrieveRequest.model_validate(json.loads(body))
        slow_parse = (time.perf_counter() - t0) / reps * 1e3
        t0 = time.perf_counter()
        for _ in range(reps):
            fj = fastjson.parse_retrieve(body, dim)
        fast_parse = (time.perf_counter() - t0) / reps * 1e3
        assert fj is not None
        np.testing.assert_allclose(
            fj.embeddings[0], np.asarray(req.items[0].embedding, np.float32)
        )

        results = [
            {
                "ids": [int(x) for x in rng.integers(0, 10**7, 10)],
                "scores": [float(x) for x in rng.standard_normal(10)],
            }
            for _ in range(b)
        ]
        t0 = time.perf_counter()
        for _ in range(reps):
            slow_bytes = json.dumps(
                RetrieveResponse(results=results).model_dump(
                    exclude_none=True
                )
            ).encode()
        slow_enc = (time.perf_counter() - t0) / reps * 1e3
        t0 = time.perf_counter()
        for _ in range(reps):
            fast_bytes = fastjson.encode_results(results)
        fast_enc = (time.perf_counter() - t0) / reps * 1e3
        assert json.loads(fast_bytes)["results"][0]["ids"] == json.loads(
            slow_bytes
        )["results"][0]["ids"]

        row = {
            "parse_ms_stdlib_pydantic": round(slow_parse, 2),
            "parse_ms_native": round(fast_parse, 2),
            "parse_speedup": round(slow_parse / fast_parse, 1),
            "encode_ms_pydantic_json": round(slow_enc, 2),
            "encode_ms_native": round(fast_enc, 2),
            "encode_speedup": round(slow_enc / fast_enc, 1),
            "body_mb": round(len(body) / 1e6, 2),
        }
        out[f"b{b}_d{dim}"] = row
        print(f"B={b} d={dim}:", json.dumps(row, indent=2))

    import os

    os.makedirs("artifacts/round3", exist_ok=True)
    with open("artifacts/round3/fastjson_bench.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts/round3/fastjson_bench.json")


if __name__ == "__main__":
    main()
