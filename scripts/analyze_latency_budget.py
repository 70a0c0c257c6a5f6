#!/usr/bin/env python
"""Serving latency budget from node logs (round-3 VERDICT #2).

Parses the structured lines the serving stack emits —
  `batch_flush {...}`      (engine/batcher.py: first-enqueue->flush wait)
  `profile_summary {...}`  (telemetry/profiling.py: per-stage durations)
  `batch_complete {...}`   (engine/orchestrator.py: pipeline duration)
— and prints a per-stage p50/p95 markdown table: where each millisecond of
serving p50 goes (batch-wait, embed, search, fetch, rerank, llm, postproc).

Reference analog: the stage-duration histograms of
/root/reference/src/pipeline/services/generation/service.py:199-418.

Usage: python scripts/analyze_latency_budget.py <node.log> [more.logs...]
"""

from __future__ import annotations

import json
import re
import sys
from collections import defaultdict


def pct(values: list[float], p: float) -> float:
    if not values:
        return float("nan")
    v = sorted(values)
    idx = min(len(v) - 1, max(0, int(round(p / 100 * (len(v) - 1)))))
    return v[idx]


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--segments"]
    split_segments = "--segments" in sys.argv[1:]
    if not argv:
        sys.exit(__doc__)
    pat = re.compile(
        r"^(?:(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}),(\d+) )?.*?"
        r"(batch_flush|profile_summary|batch_complete) (\{.*\})"
    )
    events: list[tuple[float, str, dict]] = []
    for path in argv:
        with open(path, errors="replace") as fh:
            for line in fh:
                m = pat.search(line)
                if not m:
                    continue
                kind, payload = m.group(3), m.group(4)
                try:
                    d = json.loads(payload)
                except json.JSONDecodeError:
                    continue
                if m.group(1):
                    import datetime

                    ts = datetime.datetime.strptime(
                        m.group(1), "%Y-%m-%d %H:%M:%S"
                    ).timestamp() + int(m.group(2)) / 1e3
                else:
                    ts = 0.0
                events.append((ts, kind, d))

    # --segments: a multi-workload run (run_experiment `workloads:` sweep)
    # leaves >3 s idle gaps between points — split on them and print one
    # budget table per segment so per-concurrency stage costs stay visible
    if split_segments and events:
        segs: list[list] = [[events[0]]]
        for prev, cur in zip(events, events[1:]):
            if cur[0] - prev[0] > 3.0 and prev[0] > 0:
                segs.append([])
            segs[-1].append(cur)
    else:
        segs = [events]

    for si, seg in enumerate(segs):
        if split_segments:
            print(f"\n# Segment {si + 1}/{len(segs)} "
                  f"({len(seg)} events)\n")
        _print_budget(seg)


def _print_budget(events: list) -> None:
    waits: dict[str, list[float]] = defaultdict(list)
    sizes: dict[str, list[float]] = defaultdict(list)
    stages: dict[tuple[str, str], list[float]] = defaultdict(list)
    totals: dict[str, list[float]] = defaultdict(list)
    batch_durs: list[float] = []
    for _ts, kind, d in events:
        if kind == "batch_flush":
            waits[d["name"]].append(float(d["wait_ms"]))
            sizes[d["name"]].append(float(d["size"]))
        elif kind == "profile_summary":
            svc = d.get("service", "?")
            totals[svc].append(float(d.get("total_ms", 0.0)))
            for st in d.get("stages", []):
                stages[(svc, st["stage"])].append(float(st["duration_ms"]))
        elif kind == "batch_complete":
            batch_durs.append(float(d["duration_ms"]))

    print("## Serving latency budget\n")
    print("| component | n | p50 ms | p95 ms | mean ms |")
    print("|---|---|---|---|---|")

    def row(label: str, vals: list[float]) -> None:
        if not vals:
            return
        print(
            f"| {label} | {len(vals)} | {pct(vals, 50):.1f} "
            f"| {pct(vals, 95):.1f} | {sum(vals) / len(vals):.1f} |"
        )

    for name in sorted(waits):
        row(
            f"batch-wait [{name}] (mean size "
            f"{sum(sizes[name]) / len(sizes[name]):.1f})",
            waits[name],
        )
    for (svc, stage) in sorted(stages):
        row(f"{svc}:{stage}", stages[(svc, stage)])
    for svc in sorted(totals):
        row(f"{svc}:TOTAL", totals[svc])
    row("orchestrator batch_complete", batch_durs)

    if batch_durs and waits:
        gw = waits.get("gateway", [])
        if gw:
            print(
                f"\nper-request p50 ≈ batch-wait p50 ({pct(gw, 50):.0f} ms) "
                f"+ pipeline p50 ({pct(batch_durs, 50):.0f} ms)"
            )


if __name__ == "__main__":
    main()
