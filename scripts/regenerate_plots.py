#!/usr/bin/env python
"""Regenerate serving-results plots from committed experiment artifacts.

Analog of the reference's plots regeneration over its tier-2 CSVs
(/root/reference/scripts/regenerate_tier2_plots.py:1-200): consolidate every
`artifacts/experiments/*/summary.csv` into one table and render

  - throughput vs p95 latency (scatter, one point per run)
  - throughput by configuration (sorted bars)
  - p50 vs p95 latency by configuration (grouped bars)

into `artifacts/analysis/`. Pure matplotlib — no display required (Agg).

Usage:
  python scripts/regenerate_plots.py [--experiments-dir artifacts/experiments]
                                     [--out-dir artifacts/analysis]
"""

from __future__ import annotations

import argparse
import glob
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import pandas as pd  # noqa: E402


def consolidate(experiments_dir: str) -> pd.DataFrame:
    frames = []
    for path in sorted(glob.glob(os.path.join(experiments_dir, "*", "summary.csv"))):
        run_dir = os.path.basename(os.path.dirname(path))
        try:
            df = pd.read_csv(path)
        except Exception as exc:  # malformed/partial runs stay visible
            print(f"skipping {path}: {exc}")
            continue
        # run dirs are "<manifest>_<YYYYmmdd_HHMMSS>"
        df["experiment"] = run_dir.rsplit("_", 2)[0]
        df["run_dir"] = run_dir
        frames.append(df)
    if not frames:
        raise SystemExit(f"no summary.csv found under {experiments_dir}")
    out = pd.concat(frames, ignore_index=True)
    # keep the LATEST run per experiment for the bar charts; the scatter
    # shows every run
    out = out.sort_values("run_dir")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiments-dir", default="artifacts/experiments")
    ap.add_argument("--out-dir", default="artifacts/analysis")
    args = ap.parse_args()

    df = consolidate(args.experiments_dir)
    os.makedirs(args.out_dir, exist_ok=True)
    csv_path = os.path.join(args.out_dir, "consolidated_results.csv")
    df.to_csv(csv_path, index=False)
    print(f"consolidated {len(df)} runs -> {csv_path}")

    latest = df.groupby("experiment", as_index=False).last()
    latest = latest.sort_values("req_per_min", ascending=False)

    # --- scatter: throughput vs p95, every run ---
    fig, ax = plt.subplots(figsize=(10, 7))
    for exp, grp in df.groupby("experiment"):
        ax.scatter(grp["req_per_min"], grp["p95_ms"], s=70, label=exp, alpha=0.8)
    ax.set_xlabel("throughput (req/min)")
    ax.set_ylabel("p95 latency (ms)")
    ax.set_title("Throughput vs p95 latency (all committed runs)")
    ax.grid(alpha=0.3)
    ax.legend(fontsize=7, loc="center left", bbox_to_anchor=(1.01, 0.5))
    fig.tight_layout()
    p = os.path.join(args.out_dir, "throughput_vs_latency.png")
    fig.savefig(p, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"saved {p}")

    # --- bars: throughput by configuration (latest run each) ---
    fig, ax = plt.subplots(figsize=(12, 6))
    bars = ax.bar(latest["experiment"], latest["req_per_min"])
    ax.bar_label(bars, fmt="%.0f", fontsize=7, padding=2)
    ax.set_ylabel("throughput (req/min)")
    ax.set_title("Throughput by configuration (latest run per experiment)")
    plt.setp(ax.get_xticklabels(), rotation=45, ha="right", fontsize=8)
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    p = os.path.join(args.out_dir, "throughput_bar.png")
    fig.savefig(p, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"saved {p}")

    # --- concurrency curves: sweep runs (multi-row summary.csv) ---
    # the reference's committed results are exactly this shape: one curve
    # per config across concurrencies (tier3 consolidated_results.csv up
    # to conc 128). One figure: throughput vs conc + p50/p95 vs conc; the
    # reference's best-ever p50 (856 ms) drawn as the bar to beat.
    sweeps = df[df.groupby("run_dir")["run_dir"].transform("size") > 1]
    if len(sweeps):
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(13, 5.5))
        for rd, grp in sweeps.groupby("run_dir"):
            grp = grp.sort_values("concurrency")
            ax1.plot(grp["concurrency"], grp["req_per_min"], "o-", label=rd)
            ax2.plot(grp["concurrency"], grp["p50_ms"], "o-", label=f"{rd} p50")
            ax2.plot(grp["concurrency"], grp["p95_ms"], "s--", alpha=0.5,
                     label=f"{rd} p95")
        ax1.set_xlabel("concurrency")
        ax1.set_ylabel("throughput (req/min)")
        ax1.set_title("Throughput vs concurrency (sweep runs)")
        ax1.grid(alpha=0.3)
        ax1.legend(fontsize=6)
        ax2.axhline(856, color="red", ls=":", lw=1.5,
                    label="reference best-ever p50 (856 ms)")
        ax2.set_xlabel("concurrency")
        ax2.set_ylabel("latency (ms)")
        ax2.set_title("Latency vs concurrency")
        ax2.grid(alpha=0.3)
        ax2.legend(fontsize=6)
        fig.tight_layout()
        p = os.path.join(args.out_dir, "concurrency_curves.png")
        fig.savefig(p, dpi=150, bbox_inches="tight")
        plt.close(fig)
        print(f"saved {p}")

    # --- grouped bars: p50 vs p95 ---
    fig, ax = plt.subplots(figsize=(12, 6))
    x = range(len(latest))
    w = 0.38
    b1 = ax.bar([i - w / 2 for i in x], latest["p50_ms"], w, label="p50")
    b2 = ax.bar([i + w / 2 for i in x], latest["p95_ms"], w, label="p95")
    ax.bar_label(b1, fmt="%.0f", fontsize=6, padding=1)
    ax.bar_label(b2, fmt="%.0f", fontsize=6, padding=1)
    ax.set_xticks(list(x))
    ax.set_xticklabels(latest["experiment"], rotation=45, ha="right", fontsize=8)
    ax.set_ylabel("latency (ms)")
    ax.set_title("Latency by configuration (p50 vs p95, latest run)")
    ax.legend()
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    p = os.path.join(args.out_dir, "latency_p50_p95.png")
    fig.savefig(p, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"saved {p}")


if __name__ == "__main__":
    main()
