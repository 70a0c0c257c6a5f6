#!/usr/bin/env python
"""Experiment aggregation + plots (reference scripts/analyze_experiments.py:
145-227: consolidated_results.csv + throughput-vs-p95 / throughput-bar /
latency plots from run dirs)."""

from __future__ import annotations

import argparse
import csv
import glob
import os


def load_runs(root: str) -> list[dict]:
    rows = []
    for summary in glob.glob(os.path.join(root, "*", "summary.csv")):
        run_dir = os.path.basename(os.path.dirname(summary))
        with open(summary) as fh:
            for row in csv.DictReader(fh):
                row["experiment"] = run_dir
                rows.append(row)
    return rows


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="artifacts/experiments")
    p.add_argument("--out", default="artifacts/analysis")
    args = p.parse_args()
    rows = load_runs(args.root)
    if not rows:
        print(f"no runs under {args.root}")
        return
    os.makedirs(args.out, exist_ok=True)

    out_csv = os.path.join(args.out, "consolidated_results.csv")
    with open(out_csv, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"{len(rows)} runs -> {out_csv}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping plots")
        return

    names = [r["experiment"] for r in rows]
    thr = [float(r["req_per_min"]) for r in rows]
    p95 = [float(r["p95_ms"]) for r in rows]
    p50 = [float(r["p50_ms"]) for r in rows]

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.scatter(thr, p95)
    for n, x, y in zip(names, thr, p95):
        ax.annotate(n, (x, y), fontsize=7)
    ax.set_xlabel("throughput (req/min)")
    ax.set_ylabel("p95 latency (ms)")
    ax.set_title("throughput vs p95")
    fig.savefig(os.path.join(args.out, "throughput_vs_p95.png"), dpi=120)

    fig, ax = plt.subplots(figsize=(9, 5))
    ax.bar(range(len(names)), thr)
    ax.set_xticks(range(len(names)), names, rotation=45, ha="right", fontsize=7)
    ax.set_ylabel("req/min")
    ax.set_title("throughput by experiment")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "throughput_bar.png"), dpi=120)

    fig, ax = plt.subplots(figsize=(9, 5))
    x = range(len(names))
    ax.bar([i - 0.2 for i in x], p50, width=0.4, label="p50")
    ax.bar([i + 0.2 for i in x], p95, width=0.4, label="p95")
    ax.set_xticks(list(x), names, rotation=45, ha="right", fontsize=7)
    ax.set_ylabel("latency (ms)")
    ax.legend()
    ax.set_title("latency by experiment")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "latency_compare.png"), dpi=120)
    print(f"plots -> {args.out}")


if __name__ == "__main__":
    main()
