#!/usr/bin/env python
"""Metrics capture (reference scripts/capture_metrics.py:39-119: Prometheus
range-API -> CSV). Two modes:
- --nodes: scrape each node's /metrics directly (no Prometheus needed);
- --prometheus: PromQL range queries against a Prometheus server.
"""

from __future__ import annotations

import argparse
import csv
import json
import time
import urllib.parse
import urllib.request

KEY_PREFIXES = (
    "pipeline_requests_total",
    "pipeline_request_latency_seconds",
    "pipeline_stage_duration_seconds",
    "pipeline_batch_size",
    "pipeline_batch_flush_total",
    "pipeline_cache_events_total",
    "pipeline_memory_rss_bytes",
    "pipeline_device_memory_bytes",
    "pipeline_errors_total",
)


def scrape_node(url: str) -> list[dict]:
    rows = []
    with urllib.request.urlopen(f"{url}/metrics", timeout=10) as resp:
        for line in resp.read().decode().splitlines():
            if line.startswith("#") or not line.strip():
                continue
            if not line.startswith(KEY_PREFIXES):
                continue
            try:
                name_labels, value = line.rsplit(" ", 1)
                rows.append(
                    {
                        "node_url": url,
                        "metric": name_labels,
                        "value": float(value),
                        "ts": time.time(),
                    }
                )
            except ValueError:
                continue
    return rows


def prometheus_range(base: str, query: str, start: float, end: float, step: str):
    qs = urllib.parse.urlencode(
        {"query": query, "start": start, "end": end, "step": step}
    )
    with urllib.request.urlopen(
        f"{base}/api/v1/query_range?{qs}", timeout=30
    ) as resp:
        return json.loads(resp.read())


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", help="comma-separated node base URLs")
    p.add_argument("--prometheus", help="Prometheus base URL")
    p.add_argument("--minutes", type=float, default=10.0)
    p.add_argument("--out", default="metrics.csv")
    args = p.parse_args()

    rows: list[dict] = []
    if args.nodes:
        for url in args.nodes.split(","):
            try:
                rows.extend(scrape_node(url.strip()))
            except Exception as exc:  # noqa: BLE001
                print(f"scrape {url} failed: {exc}")
    if args.prometheus:
        end = time.time()
        start = end - args.minutes * 60
        for q in (
            "pipeline_memory_rss_bytes",
            "rate(pipeline_requests_total[1m])",
            "histogram_quantile(0.95, rate(pipeline_request_latency_seconds_bucket[1m]))",
        ):
            data = prometheus_range(args.prometheus, q, start, end, "5s")
            for series in data.get("data", {}).get("result", []):
                for ts, v in series.get("values", []):
                    rows.append(
                        {
                            "node_url": args.prometheus,
                            "metric": q + json.dumps(series.get("metric", {})),
                            "value": float(v),
                            "ts": float(ts),
                        }
                    )
    if rows:
        with open(args.out, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=["node_url", "metric", "value", "ts"])
            w.writeheader()
            w.writerows(rows)
    print(f"{len(rows)} metric rows -> {args.out}")


if __name__ == "__main__":
    main()
