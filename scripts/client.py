#!/usr/bin/env python
"""Demo client (reference scripts/client.py:104-198): N requests at fixed
intervals from worker threads, then a latency summary."""

from __future__ import annotations

import argparse
import json
import statistics
import threading
import time
import urllib.request

DEFAULT_QUERIES = [
    "What does the climate analysis report say?",
    "Summarize the medicine study results.",
    "What are the key finance data points?",
    "Tell me about the space survey findings.",
    "What does the history overview cover?",
    "Give me the sports report summary.",
]


def send_query(url: str, query: str, timeout: float) -> dict:
    body = json.dumps({"query": query}).encode()
    req = urllib.request.Request(
        f"{url}/query", data=body, headers={"Content-Type": "application/json"}
    )
    t0 = time.monotonic()
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        out = json.loads(resp.read())
    out["_latency_s"] = time.monotonic() - t0
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--requests", type=int, default=6)
    p.add_argument("--interval", type=float, default=10.0)
    p.add_argument("--timeout", type=float, default=120.0)
    args = p.parse_args()

    results: list[dict] = []
    lock = threading.Lock()

    def worker(i: int) -> None:
        q = DEFAULT_QUERIES[i % len(DEFAULT_QUERIES)]
        try:
            r = send_query(args.url, q, args.timeout)
            with lock:
                results.append(r)
            print(
                f"[{i}] {r['_latency_s'] * 1e3:.0f} ms "
                f"sentiment={r['sentiment']} toxic={r['is_toxic']}\n"
                f"    {r['generated_response'][:100]!r}"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"[{i}] FAILED: {exc}")

    threads = []
    for i in range(args.requests):
        t = threading.Thread(target=worker, args=(i,))
        t.start()
        threads.append(t)
        if i < args.requests - 1:
            time.sleep(args.interval)
    for t in threads:
        t.join()

    if results:
        lats = sorted(r["_latency_s"] for r in results)
        print(
            f"\n{len(results)}/{args.requests} ok | "
            f"p50 {statistics.median(lats) * 1e3:.0f} ms | "
            f"min {lats[0] * 1e3:.0f} | max {lats[-1] * 1e3:.0f} ms"
        )


if __name__ == "__main__":
    main()
