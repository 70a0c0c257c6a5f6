#!/usr/bin/env python
"""Latency-serving benchmark: batch-dedup IVF vs flat int8 scan at B<=4.

VERDICT round-1 item #4 done-criterion: IVF(-PQ) with batch-deduped probed
buckets must beat the flat int8 scan at small batch (the latency regime),
or produce a measured writeup of where its regime starts. The dedup kernel
streams each probed bucket ONCE per batch (~0.15 GB at B=4/nprobe=64/1M)
vs the flat scan's full-corpus 0.77 GB — reference semantics:
faiss IndexIVFFlat nprobe scan (faiss_store.py:84-92,152).

Protocol per PERF_NOTES.md: pipelined submission, varied inputs, plus a
per-call fetch-minus-RTT cross-check.
"""

from __future__ import annotations

try:  # repo-root import without pip install; scripts/ is sys.path[0]
    # only when run as a script — harmless to skip when imported as a
    # module by tests (the package is importable there already)
    import _pathfix  # noqa: F401
except ImportError:
    pass

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--nprobe", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument(
        "--pq", action="store_true",
        help="also bench IVF-PQ (PQ4 one-hot MXU ADC dedup kernel + exact "
        "rescore-256) at the same batch ladder",
    )
    args = ap.parse_args()

    from rag_inference_pipeline_tpu.core.bootstrap import bootstrap

    bootstrap()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rag_inference_pipeline_tpu.ops import (
        exact_topk,
        fused_topk_int8gs,
        quantize_global_int8,
    )
    from rag_inference_pipeline_tpu.ops.ivf import build_ivf_listing, ivf_search_dedup
    from rag_inference_pipeline_tpu.ops.kmeans import assign_clusters, kmeans

    n, d = args.n, args.d
    rng = np.random.default_rng(0)
    interp = jax.default_backend() == "cpu"
    print(f"backend: {jax.default_backend()}  corpus {n}x{d}", flush=True)

    # clustered corpus (recall realism) built on device
    nclust_true = 2048
    centers = rng.standard_normal((nclust_true, d)).astype(np.float32)
    x = centers[rng.integers(0, nclust_true, n)] + 0.3 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    # IVF build
    t0 = time.time()
    cent, _ = kmeans(
        jax.random.key(0), jnp.asarray(x[:131072]), args.nlist, iters=10
    )
    assign = np.asarray(assign_clusters(jnp.asarray(x), cent))
    listing = build_ivf_listing(
        x, np.asarray(cent), assign, storage_dtype=jnp.bfloat16
    )
    jax.block_until_ready(listing.buckets)
    print(f"ivf build: {time.time() - t0:.1f}s  cap={listing.buckets.shape[1]}",
          flush=True)

    # int8 flat (headline config)
    db_i8, gscale = quantize_global_int8(jnp.asarray(x))
    chunk = 8192
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        db_i8 = jnp.pad(db_i8, ((0, n_pad - n), (0, 0)))
    db_bf = jnp.asarray(x, jnp.bfloat16)
    db_re = (
        jnp.pad(db_bf, ((0, n_pad - n), (0, 0))) if n_pad != n else db_bf
    )
    jax.block_until_ready((db_i8, db_re))

    def rtt():
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(db_i8[:1, :1])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    tunnel = rtt()
    print(f"tunnel RTT ~ {tunnel * 1e3:.1f} ms", flush=True)

    pq_idx = None
    if args.pq:
        from rag_inference_pipeline_tpu.index import IVFPQIndex

        t0 = time.time()
        # PQ4 (ksub=16): the gather-free one-hot MXU ADC path; m doubled to
        # keep bits/row equal to PQ8 (ops/pq.py)
        pq_idx = IVFPQIndex(
            d, args.nlist, min(2 * 96, d), nprobe=args.nprobe,
            rescore_k=256, ksub=16,
        )
        pq_idx.train_add(x, train_size=65536, kmeans_iters=8, pq_iters=8)
        print(f"ivfpq build: {time.time() - t0:.1f}s", flush=True)

    for b in (1, 2, 4, 8):
        qs = []
        for i in range(16):
            qi = x[rng.integers(0, n, b)] + 0.02 * rng.standard_normal(
                (b, d)
            ).astype(np.float32)
            qs.append(jax.device_put(jnp.asarray(qi, jnp.float32)))
        jax.block_until_ready(qs)

        # NO jit(lambda) wrappers: closing over the corpus ships it as an
        # HLO constant to the remote compile helper, which hangs on the
        # gigabyte literal (PERF_NOTES "Tunnel hazard"). The kernels are
        # already jitted with arrays as proper arguments.
        def flat_fn(q):
            return fused_topk_int8gs(
                q, db_i8, gscale, args.k, nbins=1024, chunk=chunk,
                rescore_db=db_re, rescore_k=64, ntotal=n, mm_bf16=True,
                interpret=interp,
            )

        def ivf_fn(q):
            return ivf_search_dedup(
                listing, q, args.k, nprobe=args.nprobe, interpret=interp,
            )

        # recall of each vs exact oracle on the first query set
        _, oracle = exact_topk(qs[0].astype(jnp.bfloat16), db_bf, args.k,
                               chunk=65536)
        oracle = np.asarray(oracle)

        def recall(ids):
            ids = np.asarray(ids)
            return float(np.mean(
                [len(set(ids[i]) & set(oracle[i])) / args.k for i in range(b)]
            ))

        def pq_fn(q):
            return pq_idx.search(q, args.k)

        variants = [("flat_int8", flat_fn), ("ivf_dedup", ivf_fn)]
        if pq_idx is not None:
            variants.append(("ivfpq4_256", pq_fn))
        out = {}
        for name, fn in variants:
            _, ids0 = fn(qs[0])
            rec = recall(ids0)
            outs = [fn(qs[0])]
            jax.block_until_ready(outs)
            t0 = time.perf_counter()
            outs = [fn(qs[i % 16]) for i in range(args.iters)]
            jax.block_until_ready(outs)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            # fetch cross-check
            t0 = time.perf_counter()
            for i in range(8):
                s, ids = fn(qs[i % 16])
                np.asarray(ids)
            ms_fetch = ((time.perf_counter() - t0) / 8 - tunnel) * 1e3
            out[name] = (ms, ms_fetch, rec)
            print(
                f"B={b:2d} {name:10s} pipelined {ms:7.2f} ms | fetch-RTT "
                f"{ms_fetch:7.2f} | recall@{args.k} {rec:.3f}",
                flush=True,
            )
        f, v = out["flat_int8"][0], out["ivf_dedup"][0]
        print(f"B={b:2d} ivf_dedup speedup vs flat: {f / v:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
