#!/usr/bin/env python
"""Round-2 kernel sweep: per-row-scale int8 binmax vs the global-scale
variant (int32-domain compares, last-step-only masking) on real TPU at
1M x 768. Protocol per PERF_NOTES.md "Measurement reliability": one
process, varied inputs, pipelined submission + one sync, cross-checked
with per-iteration full-fetch minus RTT.

Usage: python scripts/bench_kernel_sweep2.py [--n 1000000] [--b 128]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.pop("JAX_PLATFORMS", None)

import jax
import jax.numpy as jnp
import numpy as np

from rag_inference_pipeline_tpu.ops.topk import (
    exact_topk,
    fused_topk_int8,
    fused_topk_int8gs,
    quantize_global_int8,
)


def measure_rtt(dev_arr) -> float:
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(dev_arr[:1, :1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def recall_at_k(ids, oracle_ids, k=10):
    hits = 0
    for row, orow in zip(ids, oracle_ids):
        hits += len(set(int(x) for x in row[:k]) & set(int(x) for x in orow[:k]))
    return hits / (len(ids) * k)


def bench_variant(name, fn, q_batches, rounds, rtt):
    out0 = fn(q_batches[0])
    jax.block_until_ready(out0)
    t0 = time.perf_counter()
    outs = []
    for _ in range(rounds):
        for q in q_batches:
            outs.append(fn(q))
    jax.block_until_ready(outs[-1])
    dt = time.perf_counter() - t0
    ms_pipelined = dt / (rounds * len(q_batches)) * 1e3
    t0 = time.perf_counter()
    for q in q_batches:
        s, i = fn(q)
        np.asarray(s)
        np.asarray(i)
    ms_fetch = ((time.perf_counter() - t0) / len(q_batches) - rtt) * 1e3
    print(
        f"{name:46s} pipelined {ms_pipelined:8.3f} ms/batch | "
        f"fetch-RTT {ms_fetch:8.3f} ms/batch", flush=True,
    )
    return ms_pipelined, ms_fetch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batches", type=int, default=16)
    args = ap.parse_args()

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    print(f"building {args.n}x{args.d} corpus on host...", flush=True)
    db = rng.standard_normal((args.n, args.d), dtype=np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    maxabs = np.maximum(np.abs(db).max(axis=1), 1e-9)
    scales = (maxabs / 127.0).astype(np.float32)
    db_i8 = np.clip(np.round(db / scales[:, None]), -127, 127).astype(np.int8)

    queries = rng.standard_normal((args.batches, args.b, args.d), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=2, keepdims=True)

    d_db_bf16 = jax.device_put(jnp.asarray(db, jnp.bfloat16))
    d_db_i8 = jax.device_put(jnp.asarray(db_i8))
    d_scales = jax.device_put(jnp.asarray(scales))
    d_db_gs, gscale = quantize_global_int8(jnp.asarray(db))
    d_db_gs, gscale = jax.device_put(d_db_gs), jax.device_put(gscale)
    q_batches = [jax.device_put(jnp.asarray(q)) for q in queries]
    del db_i8, db
    rtt = measure_rtt(d_db_bf16)
    print(f"tunnel RTT ~ {rtt*1e3:.1f} ms", flush=True)

    oracle = exact_topk(q_batches[0], d_db_bf16, args.k)
    oracle_ids = np.asarray(oracle[1])

    variants = []
    # baseline: round-1 best per-row kernel
    variants.append((
        "int8/row nbins=1024 chunk=4096 rescore64",
        lambda q: fused_topk_int8(
            q, d_db_i8, d_scales, args.k, nbins=1024, chunk=4096,
            rescore_db=d_db_bf16, rescore_k=64,
        ),
    ))
    for nbins, chunk in [(1024, 4096), (1024, 8192), (512, 8192),
                         (2048, 8192), (512, 4096)]:
        variants.append((
            f"int8/gs nbins={nbins} chunk={chunk} rescore64",
            lambda q, nb=nbins, ch=chunk: fused_topk_int8gs(
                q, d_db_gs, gscale, args.k, nbins=nb, chunk=ch,
                rescore_db=d_db_bf16, rescore_k=64,
            ),
        ))

    for name, fn in variants:
        try:
            ms = bench_variant(name, fn, q_batches, args.rounds, rtt)
            ids = np.asarray(fn(q_batches[0])[1])
            r = recall_at_k(ids, oracle_ids, args.k)
            print(f"{'':46s} recall@{args.k} = {r:.4f}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

    stream_gb = args.n * args.d / 1e9
    print(f"\nint8 stream = {stream_gb:.2f} GB; v5e HBM ~ 819 GB/s -> "
          f"SoL {stream_gb/819*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
