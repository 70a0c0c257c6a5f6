#!/usr/bin/env python
"""Headline benchmark: retrieval QPS/chip at recall@10 >= 0.95 on 1M x 768d
(BASELINE.json north-star config[0]).

Protocol (PERF_NOTES.md lessons):
- pipelined submission (per-call host sync pays ~55 ms axon tunnel RTT);
- inputs varied every iteration (identical calls get deduped upstream);
- recall measured against the on-device exact oracle;
- CPU baseline measured live with the first-party native scan
  (native/cpuscan.cc, multithreaded C++ with AVX auto-vectorization — the
  faiss stand-in; faiss-cpu isn't installable, no egress) on a row
  subsample, scaled linearly to the full corpus. The int8 variant is used
  for the ratio: equal index memory and comparable recall to the TPU int8
  index. NOTE: this container exposes 1 CPU core; the reference's target
  host is a 16-core Xeon Gold 6242 (BASELINE.md documents the caveat and
  the 16-core projection printed in "detail").

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
    p.add_argument(
        "--n", type=int, default=0,
        help="corpus rows (default 1M; 4500000 = reference scale)",
    )
    # default 1024: cost/batch is fixed-term + stream + MXU on this rig;
    # QPS scales with batch through the DMA-bound regime and the native
    # int8 MXU dot keeps scaling past it (measured 26.6k/50.4k/99.1k at
    # 128/256/1024, recall >= 0.996 — PERF_NOTES round-3 ladder); the
    # metric string self-describes the batch size
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--nbins", type=int, default=1024)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument(
        "--kernel", choices=["int8", "bf16"], default="int8",
        help="int8 = SQ8 scan (half the HBM traffic; default)",
    )
    p.add_argument(
        "--mm", choices=["int8", "bf16"], default="int8",
        help="int8-scan matmul path: native s8xs8->s32 MXU dot (default; "
        "exact, no accumulator bound, fastest at every measured batch) vs "
        "the bf16 upcast (PERF_NOTES 'Native int8 MXU dot')",
    )
    args = p.parse_args()

    from rag_inference_pipeline_tpu.core.bootstrap import bootstrap

    bootstrap()

    import jax
    import jax.numpy as jnp

    from rag_inference_pipeline_tpu.ops import (
        exact_topk,
        fused_topk,
        fused_topk_int8gs,
        quantize_global_int8,
    )

    n, d, k = (65536, 256, 10) if args.smoke else (1_000_000, 768, 10)
    if args.n:
        n = args.n
    b = args.batch
    key = jax.random.key(0)
    kd, kq, kp = jax.random.split(key, 3)

    # generate the corpus PRE-PADDED to the scan-chunk multiple and mask pad
    # rows via ntotal= everywhere: a post-hoc jnp.pad would hold two full
    # copies alive (17+ GB transient at the 4.5M reference scale -> HBM OOM)
    # VMEM budget: db block (chunk x d int8, multi-buffered) + [B, nbins]
    # i32 accumulators x2 + [B, chunk-sub] scores must fit 16 MB; at
    # batch >= 256 the accumulators grow, so halve the chunk
    chunk = 8192 if args.nbins <= 1024 and not args.smoke else 4096
    if args.batch >= 256:
        chunk = 4096
    n_pad = ((n + chunk - 1) // chunk) * chunk if args.kernel == "int8" else n

    # corpus generated on device (clustered enough for ANN realism is not
    # required for *flat* scan timing; recall is measured vs exact anyway)
    db = jax.random.normal(kd, (n_pad, d), jnp.bfloat16)
    q_base_rows = jax.random.randint(kq, (b,), 0, n)
    q_base = db[q_base_rows].astype(jnp.float32)
    noise = 0.05 * jax.random.normal(kp, (b, d), jnp.float32)
    q0 = (q_base + noise).astype(jnp.bfloat16)
    jax.block_until_ready((db, q0))

    # VMEM budget: DB block (chunk x d, double-buffered) + [B, chunk] scores
    # + [B, nbins] accumulators must fit 16 MB; int8 blocks are half size
    interpret = jax.default_backend() == "cpu"  # Pallas on CPU = interpret
    if args.kernel == "int8":
        # quantize in row blocks: a whole-array f32 upcast is 13.8 GB at
        # the 4.5M scale (scale comes from the first block — same corpus
        # distribution, so the clip percentile matches)
        blk = 1 << 20
        _, db_scale = quantize_global_int8(
            db[: min(blk, n_pad)].astype(jnp.float32)
        )
        qfn = jax.jit(
            lambda x, s: jnp.clip(
                jnp.round(x.astype(jnp.float32) / s), -127, 127
            ).astype(jnp.int8)
        )
        db_i8 = jnp.concatenate(
            [qfn(db[i : i + blk], db_scale) for i in range(0, n_pad, blk)]
        )
        jax.block_until_ready((db_i8, db_scale))

        # global-scale int8 scan (native s8xs8->s32 MXU dot by default —
        # exact int scores, fastest at every measured batch; PERF_NOTES
        # "Native int8 MXU dot") + exact bf16 re-score of the top-64
        # candidates: recovers the quantization recall gap
        def search(q):
            return fused_topk_int8gs(
                q.astype(jnp.float32), db_i8, db_scale, k,
                nbins=args.nbins, chunk=chunk, interpret=interpret,
                rescore_db=db, rescore_k=64, ntotal=n,
                mm_bf16=args.mm == "bf16",
            )
    else:
        chunk = 2048

        def search(q):
            return fused_topk(
                q, db, k, nbins=args.nbins, chunk=chunk, interpret=interpret
            )

    # recall vs on-device exact (full-precision) oracle (pad rows masked).
    # oracle chunk must DIVIDE the stored row count: exact_topk jnp.pads
    # the db to a chunk multiple otherwise — a second full-corpus copy
    # that OOMs HBM at the 4.5M scale (17.3 GB transient)
    oracle_chunk = next(
        c for c in (131072, 65536, 32768, 16384, 8192, db.shape[0])
        if db.shape[0] % c == 0
    )
    es, ei = exact_topk(q0, db, k, chunk=oracle_chunk, ntotal=n)
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

    # loop-in-program protocol: run 8 searches inside ONE jitted lax.scan
    # and fetch a tiny reduction — a single dispatch, so neither per-call
    # tunnel overhead nor block_until_ready lies can touch it. This is the
    # pure device throughput; `ms_per_batch` above additionally carries
    # ~1-1.5 ms/call of host+tunnel dispatch.
    if args.kernel == "int8":
        qs_stacked = jnp.stack(qs)  # [8, B, D]

        @jax.jit
        def _scan_searches(qstk, dbq, dbs, dbr):
            def body(_, q):
                s, i = fused_topk_int8gs(
                    q.astype(jnp.float32), dbq, dbs, k,
                    nbins=args.nbins, chunk=chunk, interpret=interpret,
                    rescore_db=dbr, rescore_k=64, ntotal=n,
                    mm_bf16=args.mm == "bf16",
                )
                return None, (s.sum(), i.max())
            _, outs = jax.lax.scan(body, None, qstk)
            return outs

        # inputs varied per rep — identical repeated calls are deduped
        # somewhere in the axon stack (PERF_NOTES protocol rule)
        variants = [
            (qs_stacked * (1.0 + 1e-3 * r)).astype(jnp.bfloat16)
            for r in range(4)
        ]
        jax.block_until_ready(variants)
        np.asarray(_scan_searches(variants[-1], db_i8, db_scale, db)[0])
        t0 = time.time()
        reps = 3
        for r in range(reps):
            out_ip = _scan_searches(variants[r], db_i8, db_scale, db)
            np.asarray(out_ip[0])
        dt_inprog = (time.time() - t0) / (reps * len(qs))
    else:
        dt_inprog = float("nan")

    # cross-check protocol (PERF_NOTES "Measurement reliability"):
    # block_until_ready through the axon tunnel does not guarantee
    # execution, so also time per-iteration FULL FETCHES (np.asarray of the
    # ids forces real execution + transfer) and subtract the measured RTT.
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(qs[0][:1, :1])
        ts.append(time.time() - t0)
    rtt = sorted(ts)[len(ts) // 2]
    t0 = time.time()
    xiters = max(4, args.iters // 4)
    for i in range(xiters):
        _, ids_x = search(qs[i % 8])
        np.asarray(ids_x)
    dt_fetch = (time.time() - t0) / xiters - rtt
    # dt_fetch is an upper bound (serialized, includes dispatch); dt must
    # not exceed it — if it does, the pipelined number was under-measured

    # CPU baseline: first-party native multithreaded int8 scan (the faiss
    # SQ8 stand-in — equal index memory, comparable recall), subsampled and
    # scaled linearly to the full corpus (the scan is O(N) per batch).
    from rag_inference_pipeline_tpu.utils import cpuscan

    sub = min(n, 131072)
    db_cpu = np.asarray(db[:sub], dtype=np.float32)
    q_cpu = np.asarray(q0, dtype=np.float32)
    maxabs = np.maximum(np.abs(db_cpu).max(axis=1), 1e-9)
    cpu_scales = (maxabs / 127.0).astype(np.float32)
    db_cpu_i8 = np.clip(
        np.round(db_cpu / cpu_scales[:, None]), -127, 127
    ).astype(np.int8)
    qmax = np.maximum(np.abs(q_cpu).max(axis=1), 1e-9)
    q_cpu_i8 = np.clip(
        np.round(q_cpu / (qmax[:, None] / 127.0)), -127, 127
    ).astype(np.int8)
    nthreads = cpuscan.hw_threads()
    cpuscan.scan_i8(q_cpu_i8[:1], db_cpu_i8[:1024], cpu_scales[:1024], k)
    t0 = time.time()
    cpu_iters = 2
    for _ in range(cpu_iters):
        cpuscan.scan_i8(q_cpu_i8, db_cpu_i8, cpu_scales, k)
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
            # single-dispatch lax.scan over 8 searches: pure device time,
            # immune to tunnel dispatch overhead and phantom completions
            "ms_per_batch_inprogram": round(dt_inprog * 1e3, 3),
            "ms_per_batch_fetch_crosscheck": round(dt_fetch * 1e3, 3),
            "tunnel_rtt_ms": round(rtt * 1e3, 1),
            "cpu_scan_qps": round(cpu_qps, 2),
            "cpu_scan": "native int8 (cpuscan.cc), equal index memory",
            "cpu_threads": nthreads,
            # this container exposes 1 core; reference target host is a
            # 16-core Xeon Gold 6242 — linear-scaling projection for honesty
            "cpu_qps_projected_16core": round(cpu_qps * 16 / nthreads, 1),
            "vs_16core_projection": round(tpu_qps / (cpu_qps * 16 / nthreads), 1),
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
