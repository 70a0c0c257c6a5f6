#!/usr/bin/env python
"""Serve-layer ceiling on retrieval-only /retrieve (round-2 VERDICT #7).

Device search runs at 25-40k QPS in-program; full-stack serving is
generation-bound — but the serve-layer tax on the flagship retrieval kernel
was never measured. This drives the `retrieval_faiss_only` parity profile
(reference configs/retrieval_faiss_only.yaml + retrieval/api.py:300-349)
over real HTTP with embeddings supplied in the request:

- payload mode id_only (no doc bodies on the wire) isolates the serve tax:
  json parse -> pydantic -> scheduler -> device search -> json encode.
- two wire formats per batch size: JSON float lists (reference parity) vs
  `embeddings_b64` (binary f32, the msgspec-analog fast path) — the delta
  attributes the host bottleneck directly.

Boots its own server subprocess (ragtpu runtime) against a generated 1M
int8 index artifact (cached in artifacts/retr_http/), sweeps
B x {json, b64} x concurrency, writes artifacts/round3/retrieve_http.json.
"""

from __future__ import annotations

try:  # repo-root import without pip install; scripts/ is sys.path[0]
    # only when run as a script — harmless to skip when imported as a
    # module by tests (the package is importable there already)
    import _pathfix  # noqa: F401
except ImportError:
    pass

import argparse
import asyncio
import base64
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_index(args) -> str:
    """Build (once) and cache the int8 flat index artifact.

    Runs in a SUBPROCESS when called without --build-inner: the tunneled
    TPU accepts one JAX client at a time, so a parent that initialized
    JAX for the build would starve the server subprocess it spawns next
    (observed: server dies silently at backend init)."""
    os.makedirs(args.workdir, exist_ok=True)
    path = os.path.join(args.workdir, f"flat_i8_{args.n}.npz")
    if os.path.exists(path):
        return path
    if not args.build_inner:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--build-inner",
             "--n", str(args.n), "--d", str(args.d),
             "--workdir", args.workdir]
            + (["--smoke"] if args.smoke else []),
            check=True, cwd=REPO,
        )
        return path
    from rag_inference_pipeline_tpu.core.bootstrap import bootstrap

    bootstrap()
    from rag_inference_pipeline_tpu.index import FlatIndex

    rng = np.random.default_rng(0)
    idx = FlatIndex(args.d, dtype="int8", rescore_k=64)
    blk = 250_000
    for s in range(0, args.n, blk):
        v = rng.standard_normal((min(blk, args.n - s), args.d)).astype(
            np.float32
        )
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        idx.add(v)
        print(f"  index add {s + blk}/{args.n}", flush=True)
    idx.save(path)
    return path


async def drive(url, payloads, concurrency, timeout=600):
    import aiohttp

    lat = []
    t0 = time.perf_counter()
    conn = aiohttp.TCPConnector(limit=concurrency)
    async with aiohttp.ClientSession(connector=conn) as sess:
        sem = asyncio.Semaphore(concurrency)

        async def one(body):
            # bodies arrive PRE-ENCODED: client-side json.dumps of an 8 MB
            # batch-512 body costs ~100 ms of GIL inside this event loop and
            # would mask the server-side cost being measured
            async with sem:
                q0 = time.perf_counter()
                async with sess.post(
                    url + "/retrieve", data=body,
                    headers={"Content-Type": "application/json"},
                    timeout=aiohttp.ClientTimeout(total=timeout),
                ) as r:
                    assert r.status == 200, (r.status, (await r.text())[:200])
                    await r.read()
                lat.append(time.perf_counter() - q0)

        await asyncio.gather(*(one(b) for b in payloads))
    wall = time.perf_counter() - t0
    lat.sort()
    return wall, lat[len(lat) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batches", default="32,128,512")
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--port", type=int, default=8123)
    ap.add_argument("--workdir", default="artifacts/retr_http")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--build-inner", action="store_true",
                    help="internal: build the index artifact and exit")
    ap.add_argument("--server-log", default="/tmp/retr_http_server.log")
    ap.add_argument("--out", default="artifacts/round3/retrieve_http.json")
    args = ap.parse_args()
    if args.smoke:
        args.n, args.batches, args.requests = 20_000, "8,32", 6

    index_path = build_index(args)
    if args.build_inner:
        return

    env = os.environ.copy()
    env.update({
        "PIPELINE_ROLE_PROFILE": "retrieval_faiss_only",
        "INDEX_PATH": index_path,
        "INDEX_DIM": str(args.d),
        "INDEX_KIND": "flat",
        "INDEX_DTYPE": "int8",
        "DOCUMENTS_PAYLOAD_MODE": "id_only",
        "BASE_PORT": str(args.port),
        "RETRIEVAL_BATCH_SIZE": "512",
        "RETRIEVAL_BATCH_TIMEOUT_MS": "2",
        "BATCH_SHAPE_BUCKETS": "8,32,128,512",
        "WARMUP_BUCKETS": "1",
    })
    server = subprocess.Popen(
        [sys.executable, "-m", "rag_inference_pipeline_tpu.serve.runtime"],
        env=env, cwd=REPO,
        stdout=open(args.server_log, "w"), stderr=subprocess.STDOUT,
    )
    url = f"http://127.0.0.1:{args.port}"
    try:
        import urllib.request

        deadline = time.time() + 1800
        while time.time() < deadline:
            if server.poll() is not None:
                raise RuntimeError(
                    f"server exited rc={server.returncode}; "
                    f"see {args.server_log}"
                )
            try:
                with urllib.request.urlopen(url + "/health", timeout=5) as r:
                    if r.status == 200:
                        break
            except Exception:  # noqa: BLE001
                time.sleep(2.0)
        else:
            raise RuntimeError("server never became healthy")
        print("server healthy", flush=True)

        rng = np.random.default_rng(1)
        results = []
        for b in (int(x) for x in args.batches.split(",")):
            embs = [
                rng.standard_normal((b, args.d)).astype(np.float32)
                for _ in range(args.requests)
            ]
            for mode in ("json", "b64", "bin"):
                if mode == "json":
                    payloads = [{
                        "items": [
                            {"embedding": e[i].tolist(), "k": args.k}
                            for i in range(b)
                        ],
                    } for e in embs]
                elif mode == "b64":
                    payloads = [{
                        "items": [{"k": args.k}] * b,
                        "embeddings_b64": base64.b64encode(
                            e.tobytes()
                        ).decode(),
                    } for e in embs]
                else:  # bin: itemless binary request + binary response
                    payloads = [{
                        "k": args.k,
                        "response_format": "b64",
                        "embeddings_b64": base64.b64encode(
                            e.tobytes()
                        ).decode(),
                    } for e in embs]
                bodies = [json.dumps(p).encode() for p in payloads]
                # warm the bucket program + connection
                asyncio.run(drive(url, bodies[:2], 1))
                wall, p50 = asyncio.run(
                    drive(url, bodies, args.concurrency)
                )
                qps = args.requests * b / wall
                print(
                    f"B={b:4d} {mode:4s} conc={args.concurrency}: "
                    f"{qps:8.0f} QPS  p50 {p50 * 1e3:6.1f} ms  "
                    f"({args.requests} reqs in {wall:.2f}s)", flush=True,
                )
                results.append({
                    "batch": b, "mode": mode,
                    "concurrency": args.concurrency,
                    "qps": round(qps, 1), "p50_ms": round(p50 * 1e3, 1),
                })
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump({
                "n": args.n, "d": args.d, "k": args.k,
                "payload_mode": "id_only", "results": results,
            }, fh, indent=2)
        print(f"wrote {args.out}", flush=True)
    finally:
        server.send_signal(signal.SIGTERM)
        try:
            server.wait(timeout=30)
        except subprocess.TimeoutExpired:
            server.kill()


if __name__ == "__main__":
    main()
