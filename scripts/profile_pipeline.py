#!/usr/bin/env python
"""Load generator (reference scripts/profile_pipeline.py): N requests through
a concurrency pool, presets saturation(200 req / 50 conc) and
latency(50 / 1), query randomization to bust caches, per-request JSONL and a
summary CSV with p50/p95/p99 and req/min.
"""

from __future__ import annotations

import argparse
import concurrent.futures
import csv
import json
import os
import random
import statistics
import time
import urllib.request

TOPICS = [
    "climate", "medicine", "finance", "space", "history", "sports",
    "music", "cooking", "travel", "physics", "biology", "law",
]

PRESETS = {
    "saturation": {"requests": 200, "concurrency": 50},
    "latency": {"requests": 50, "concurrency": 1},
}


def make_query(i: int, randomize: bool) -> str:
    base = f"What do the documents say about {TOPICS[i % len(TOPICS)]}?"
    if randomize:
        # cache-buster (reference profile_pipeline.py:160-163)
        base += f" (variant {random.randint(0, 10**9)})"
    return base


def send(url: str, query: str, timeout: float) -> dict:
    body = json.dumps({"query": query}).encode()
    req = urllib.request.Request(
        f"{url}/query", data=body, headers={"Content-Type": "application/json"}
    )
    t0 = time.monotonic()
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            json.loads(resp.read())
        return {"ok": True, "latency_s": time.monotonic() - t0}
    except Exception as exc:  # noqa: BLE001
        return {
            "ok": False,
            "latency_s": time.monotonic() - t0,
            "error": str(exc)[:200],
        }


def percentile(sorted_vals, p):
    if not sorted_vals:
        return 0.0
    idx = min(len(sorted_vals) - 1, int(round(p / 100 * (len(sorted_vals) - 1))))
    return sorted_vals[idx]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--preset", choices=list(PRESETS), default=None)
    p.add_argument("--requests", type=int, default=50)
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--timeout", type=float, default=120.0)
    p.add_argument("--randomize-queries", action="store_true")
    p.add_argument("--out-dir", default="artifacts/profile")
    p.add_argument("--run-id", default=None)
    args = p.parse_args()
    if args.preset:
        args.requests = PRESETS[args.preset]["requests"]
        args.concurrency = PRESETS[args.preset]["concurrency"]

    os.makedirs(args.out_dir, exist_ok=True)
    run_id = args.run_id or time.strftime("%Y%m%d_%H%M%S")
    jsonl_path = os.path.join(args.out_dir, f"requests_{run_id}.jsonl")

    t_start = time.monotonic()
    rows = []
    with concurrent.futures.ThreadPoolExecutor(args.concurrency) as pool:
        futs = [
            pool.submit(
                send, args.url, make_query(i, args.randomize_queries), args.timeout
            )
            for i in range(args.requests)
        ]
        for i, f in enumerate(futs):
            r = f.result()
            r["i"] = i
            rows.append(r)
    wall_s = time.monotonic() - t_start

    with open(jsonl_path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    oks = sorted(r["latency_s"] for r in rows if r["ok"])
    n_ok = len(oks)
    summary = {
        "run_id": run_id,
        "requests": args.requests,
        "concurrency": args.concurrency,
        "ok": n_ok,
        "errors": args.requests - n_ok,
        "wall_s": round(wall_s, 2),
        "req_per_min": round(n_ok / wall_s * 60, 2) if wall_s else 0,
        "p50_ms": round(percentile(oks, 50) * 1e3, 1),
        "p95_ms": round(percentile(oks, 95) * 1e3, 1),
        "p99_ms": round(percentile(oks, 99) * 1e3, 1),
        "mean_ms": round(statistics.mean(oks) * 1e3, 1) if oks else 0,
    }
    csv_path = os.path.join(args.out_dir, "summary.csv")
    write_header = not os.path.exists(csv_path)
    with open(csv_path, "a", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(summary))
        if write_header:
            w.writeheader()
        w.writerow(summary)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
