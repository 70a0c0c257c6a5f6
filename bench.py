#!/usr/bin/env python
"""Headline benchmark: retrieval QPS/chip at recall@10 >= 0.95 on 1M x 768d
(BASELINE.json north-star config[0]).

Protocol (PERF_NOTES.md lessons):
- pipelined submission (per-call host sync pays ~55 ms axon tunnel RTT);
- inputs varied every iteration (identical calls get deduped upstream);
- recall measured against the on-device exact oracle;
- CPU baseline measured live with numpy (BLAS matmul + argpartition) on a
  row subsample and scaled linearly to the full corpus — FAISS isn't in the
  image, and numpy BLAS flat scan is the same O(ND) work IndexFlatIP does.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true", help="tiny shapes, fast")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--nbins", type=int, default=1024)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument(
        "--kernel", choices=["int8", "bf16"], default="int8",
        help="int8 = SQ8 scan (half the HBM traffic; default)",
    )
    args = p.parse_args()

    from rag_inference_pipeline_tpu.core.bootstrap import bootstrap

    bootstrap()

    import jax
    import jax.numpy as jnp

    from rag_inference_pipeline_tpu.ops import (
        exact_topk,
        fused_topk,
        fused_topk_int8,
        quantize_rows_int8,
    )

    n, d, k = (65536, 256, 10) if args.smoke else (1_000_000, 768, 10)
    b = args.batch
    key = jax.random.key(0)
    kd, kq, kp = jax.random.split(key, 3)

    # corpus generated on device (clustered enough for ANN realism is not
    # required for *flat* scan timing; recall is measured vs exact anyway)
    db = jax.random.normal(kd, (n, d), jnp.bfloat16)
    q_base_rows = jax.random.randint(kq, (b,), 0, n)
    q_base = db[q_base_rows].astype(jnp.float32)
    noise = 0.05 * jax.random.normal(kp, (b, d), jnp.float32)
    q0 = (q_base + noise).astype(jnp.bfloat16)
    jax.block_until_ready((db, q0))

    # VMEM budget: DB block (chunk x d, double-buffered) + [B, chunk] scores
    # + [B, nbins] accumulators must fit 16 MB; int8 blocks are half size
    interpret = jax.default_backend() == "cpu"  # Pallas on CPU = interpret
    if args.kernel == "int8":
        chunk = 4096
        db_i8, db_scales = quantize_rows_int8(db.astype(jnp.float32))
        jax.block_until_ready((db_i8, db_scales))

        # exact bf16 re-score of the top-64 int8 candidates: recovers the
        # quantization recall gap (0.975 -> 0.993 measured) for free
        def search(q):
            return fused_topk_int8(
                q.astype(jnp.float32), db_i8, db_scales, k,
                nbins=args.nbins, chunk=chunk, interpret=interpret,
                rescore_db=db, rescore_k=64,
            )
    else:
        chunk = 2048

        def search(q):
            return fused_topk(
                q, db, k, nbins=args.nbins, chunk=chunk, interpret=interpret
            )

    # recall vs on-device exact (full-precision) oracle
    es, ei = exact_topk(q0, db, k, chunk=131072)
    fs, fi = search(q0)
    jax.block_until_ready((ei, fi))
    ei_np, fi_np = np.asarray(ei), np.asarray(fi)
    recall = float(
        np.mean([len(set(fi_np[i]) & set(ei_np[i])) / k for i in range(b)])
    )

    # timing: pipelined, varied queries
    qs = [
        (q_base + 0.05 * jax.random.normal(jax.random.key(100 + i), (b, d)))
        .astype(jnp.bfloat16)
        for i in range(8)
    ]
    jax.block_until_ready(qs)
    search(qs[0])  # warm
    t0 = time.time()
    outs = [search(qs[i % 8]) for i in range(args.iters)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / args.iters
    tpu_qps = b / dt

    # CPU baseline: numpy BLAS flat scan + argpartition, subsampled + scaled
    sub = min(n, 131072)
    db_cpu = np.asarray(db[:sub], dtype=np.float32)
    q_cpu = np.asarray(q0, dtype=np.float32)
    t0 = time.time()
    cpu_iters = 1 if not args.smoke else 2
    for _ in range(cpu_iters):
        s = q_cpu @ db_cpu.T
        np.argpartition(-s, k, axis=1)[:, :k]
    cpu_dt = (time.time() - t0) / cpu_iters * (n / sub)
    cpu_qps = b / cpu_dt

    result = {
        "metric": (
            f"flat retrieval QPS/chip @ recall@10={recall:.3f} "
            f"on {n}x{d} ({args.kernel} scan), batch {b}"
        ),
        "value": round(tpu_qps, 1),
        "unit": "QPS",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
        "detail": {
            "recall_at_10": recall,
            "batch": b,
            "ms_per_batch": round(dt * 1e3, 3),
            "cpu_numpy_qps": round(cpu_qps, 1),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))
    if recall < 0.95 and not args.smoke:
        print(
            f"WARNING: recall {recall:.3f} < 0.95 target — raise --nbins",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
