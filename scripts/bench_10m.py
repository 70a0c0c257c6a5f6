#!/usr/bin/env python
"""The >=10M-row regime demo (round-2 VERDICT #4): flat-int8 vs IVF-PQ4.

PQ4 and the IVF machinery were built FOR the scale where a flat scan's
full-corpus pass stops being affordable and the bf16 rescore copy stops
fitting. This script demonstrates that regime on one chip:

- 10.24M x 768 corpus GENERATED ON DEVICE in blocks (normalized random
  rows, reference parity: scripts/create_test_docs.py random index,
  reference create_test_docs.py:75-106) — nothing crosses the ~16 MB/s
  tunnel except the id layout (40 MB) and results.
- ground truth: exact bf16 top-10 merged block-by-block during ingest.
- flat-int8 (7.9 GB codes): the bf16 rescore copy would need another
  15.7 GB -> does NOT fit 16 GB HBM; measured WITHOUT rescore
  (quantization-bound recall). IVF-Flat bf16 ([nlist, cap, 768] bf16
  ~ 23.6 GB at cap_factor 1.5) does not fit at all — at 10M single-chip
  the bucketed machinery must carry PQ codes, which is exactly the
  IVF-PQ4 configuration measured here.
- IVF-PQ4 (2.0 GB codes incl. bucket padding): residual PQ4 + one-hot MXU
  ADC (ops/pq.py::ivfpq4_search_dedup), with an optional exact-int8
  re-score of the shortlist against the flat codes (both indexes fit
  together: ~10 GB).

Ladder: B in {1, 4, 32} (+128 for flat), nprobe in {32, 64, 128},
rescore depth in {512, 2048} (recall was shortlist-bound at 512: 0.80
measured vs a 0.96-0.99 layout candidate bound). Writes
artifacts/round3/bench_10m.json.

--rescore-kind {pq8,host_int8} switch to the >=30M single-chip regime:
NO flat store exists at that scale (30M x 768 int8 = 23 GB > 16 GB
HBM), so the flat ladder is skipped and the PQ4 shortlist re-ranks
against either a flat residual-PQ8 tier in HBM (recall-tolerant; m8
bytes/row) or an int8 refine store in HOST RAM (the recall-floor play —
faiss refine-from-storage; regenerated host-side via the platform-
deterministic keyed corpus, nothing big crosses the link). 30M example:
  bench_10m.py --n 30720000 --nlist 8192 --rescore-kind host_int8 \
      --train-n 262144 --out artifacts/round3/bench_30m.json
--flat-host-rescore (int8 kind) additionally measures the flat ladder
with an f16 host refine (index/flat.py rescore_store="host") — the
recall row the on-chip bf16 copy can't provide at >=10M.
"""

from __future__ import annotations

try:  # repo-root import without pip install; scripts/ is sys.path[0]
    # only when run as a script — harmless to skip when imported as a
    # module by tests (the package is importable there already)
    import _pathfix  # noqa: F401
except ImportError:
    pass

import argparse
import functools
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_240_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--block", type=int, default=1_024_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nq", type=int, default=128)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--m", type=int, default=96)
    # 2.5 = the round-3 production default: zero capacity-cascade
    # displacement at measured imbalance (ivf_oracle_1m_realistic_cap25)
    ap.add_argument("--cap-factor", type=float, default=2.5)
    ap.add_argument("--nprobes", default="32,64,128")
    ap.add_argument("--flat-batches", default="1,4,32,128")
    ap.add_argument("--pq-batches", default="1,4,32")
    # shortlist depth for the exact-int8 re-score: within a tight cluster
    # the PQ4 ADC error exceeds the true score gaps between near-tie
    # neighbors, so the shortlist must be deep enough for the re-score to
    # do the final ranking (smoke showed 32 -> recall 0.4 with ALL GT rows
    # present in the probed buckets; 512 recovers them)
    ap.add_argument("--rescores", default="512,2048")
    # int8 = exact-int8 shortlist rescore against a resident flat store
    # (fits to ~20M: 30M x 768 int8 = 23 GB > HBM). At >=30M the flat
    # ladder is skipped (no flat store fits) and the options are:
    #   host_int8 — int8 refine store in HOST RAM (faiss refine-from-
    #     storage shape): device shortlist, exact host re-score. The
    #     recall-floor play; ids cross the link, the 23 GB store never
    #     does.
    #   pq8 — flat residual-PQ8 tier in HBM (ops/pq.py::PQFlatTier). The
    #     device-only capacity point: measured precision wall means
    #     mid-recall on tight clusters (>=4 bits/dim needed to re-rank
    #     near-ties).
    #   int4 — int4 per-row-scaled residual tier in HBM
    #     (ops/pq.py::Int4ResidualTier, 0.5 byte/dim): the device-only
    #     capacity point between pq8 (2 bits/dim, mid-recall) and the
    #     flat-int8 copy (1 byte/dim, doesn't fit >=20M). Zero host store.
    ap.add_argument("--rescore-kind",
                    choices=("int8", "pq8", "int4", "host_int8", "host_f16"),
                    default="int8")
    # int8 kind only: ALSO measure the flat ladder with an f16 host-RAM
    # refine of the device shortlist (index/flat.py rescore_store="host")
    # — the recall row the on-chip bf16 copy can't provide at >=10M
    ap.add_argument("--flat-host-rescore", action="store_true")
    ap.add_argument("--m8", type=int, default=96,
                    help="PQ8 tier subspaces (classic geometry: d/8)")
    ap.add_argument("--train-n", type=int, default=131072,
                    help="k-means / PQ training sample size")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on CPU (correctness of the harness)")
    ap.add_argument("--out", default="artifacts/round3/bench_10m.json")
    args = ap.parse_args()

    from rag_inference_pipeline_tpu.core.bootstrap import bootstrap

    bootstrap()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rag_inference_pipeline_tpu.bench import time_inprogram
    from rag_inference_pipeline_tpu.ops import fused_topk_int8gs, int8_mm_bf16_ok
    from rag_inference_pipeline_tpu.ops.kmeans import kmeans
    from rag_inference_pipeline_tpu.ops.pq import (
        Int4ResidualTier,
        int4_tier_rescore_topk,
        ivfpq4_search_dedup,
        IVFPQListing,
        PQFlatTier,
        pq_encode,
        pq_tier_rescore_topk,
        train_pq,
    )

    if args.smoke:
        args.n, args.block, args.nlist, args.nq = 131072, 32768, 64, 32
        args.flat_batches, args.pq_batches = "1,8", "1,8"
        args.nprobes, args.rescores = "8,16", "256"
    n, d, blk, k = args.n, args.d, args.block, args.k
    assert n % blk == 0 and blk % 8192 == 0
    n_blocks = n // blk
    interpret = jax.default_backend() == "cpu"
    chunk, nbins = (8192, 1024) if not args.smoke else (4096, 256)
    print(f"backend={jax.default_backend()} n={n} blocks={n_blocks}",
          flush=True)

    key = jax.random.key(0)
    # Mixture-of-Gaussians corpus (clustered, ANN-realistic — the oracle
    # script's clustered_corpus on device). UNIFORM random vectors make IVF
    # recall structurally meaningless: the reference's own corpus is random
    # (create_test_docs.py:75-106) which is exactly why it never published
    # recall numbers — nearest neighbors of random points spread uniformly
    # over lists, so nprobe=64/4096 caps recall at a few percent for ANY
    # IVF implementation. Cluster spread matches the round-2 bench corpus.
    n_centers = 8192 if not args.smoke else 256
    # spread is the RELATIVE noise norm: sigma = spread/sqrt(d) per
    # coordinate gives ||noise|| ~ spread around unit-norm centers, i.e.
    # intra-cluster cosine ~ 1/sqrt(1+spread^2) ~ 0.82 at 0.7 — the shape
    # of a topical embedding corpus. (Per-coordinate spread 0.3, as in the
    # round-2 bench corpus, puts ||noise|| at 0.3*sqrt(768) ~ 8x the
    # center: effectively a RANDOM corpus, on which any IVF's recall is
    # probing-bound by construction — see artifacts/round3/ivf_oracle.json.)
    spread = 0.7
    sigma = spread / float(np.sqrt(d))
    centers_key, which_key = jax.random.split(jax.random.fold_in(key, 999))
    gen_key = jax.random.fold_in(key, 555)
    _centers = jax.random.normal(centers_key, (n_centers, d), jnp.float32)
    _centers = _centers / jnp.linalg.norm(_centers, axis=1, keepdims=True)

    # generation is CHUNK-keyed: a whole-block f32 generation materializes
    # ~3 GB gather + ~3 GB normal + normalization transients, which OOMs
    # once the 7.9 GB int8 store AND the 3.3 GB PQ4 buckets are resident
    # (measured RESOURCE_EXHAUSTED, deferred to the next sync point). Per
    # 64k-row chunk the same transients are ~0.6 GB.
    gch = next(c for c in range(min(65536, blk), 0, -1) if blk % c == 0)
    n_ch = blk // gch

    def gen_chunk(i, j, centers):
        """f32 normalized rows [i*blk + j*gch, +gch) — keyed, same every call."""
        idx = i * n_ch + j
        which = jax.random.randint(
            jax.random.fold_in(which_key, idx), (gch,), 0, n_centers
        )
        x = centers[which] + sigma * jax.random.normal(
            jax.random.fold_in(gen_key, idx), (gch, d), jnp.float32
        )
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    def gen_block(i, centers=None):
        """Clustered bf16 corpus block i — same rows every call (keyed)."""
        c = _centers if centers is None else centers
        return jax.lax.map(
            lambda j: gen_chunk(i, j, c).astype(jnp.bfloat16),
            jnp.arange(n_ch),
        ).reshape(blk, d)

    # ---- phase 1: ingest (int8 store + exact GT), one compile ----------
    t0 = time.time()
    x0 = gen_block(0)
    from rag_inference_pipeline_tpu.ops import quantize_global_int8

    _, scale = quantize_global_int8(x0[:262144].astype(jnp.float32))
    kq = jax.random.fold_in(key, 10_000)
    # query = corpus row + relative-norm 0.3 noise (cos ~0.96): realistic
    # "query lands near but not on a document" geometry
    q = x0[: args.nq].astype(jnp.float32) + (0.3 / float(np.sqrt(d))) * (
        jax.random.normal(kq, (args.nq, d), jnp.float32)
    )
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    q = jax.device_put(q)
    # keep only a small head of block 0 for cross-platform checks; the
    # full 1.5 GB block must not stay resident next to the 30M buckets
    x0_head = jnp.array(x0[:1024])
    del x0

    # NB every device array is passed as a jit ARGUMENT, never closed over —
    # closed-over arrays ship as HLO constants to the remote compiler and
    # hang it (PERF_NOTES "Tunnel hazard"). Big accumulators are donated.
    @functools.partial(jax.jit, donate_argnums=(1,))
    def ingest(i, db_i8, gt_s, gt_i, qdev, gen_centers):
        x = gen_block(i, gen_centers)
        i8 = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale), -127, 127
        ).astype(jnp.int8)
        db_i8 = jax.lax.dynamic_update_slice(db_i8, i8, (i * blk, 0))
        s = jnp.dot(
            qdev.astype(jnp.bfloat16), x.T, preferred_element_type=jnp.float32
        )  # [nq, blk]
        cs, ci = jax.lax.top_k(s, k)
        all_s = jnp.concatenate([gt_s, cs], axis=1)
        all_i = jnp.concatenate([gt_i, ci + i * blk], axis=1)
        ms, sel = jax.lax.top_k(all_s, k)
        return db_i8, ms, jnp.take_along_axis(all_i, sel, axis=1)

    @jax.jit
    def ingest_gt_only(i, gt_s, gt_i, qdev, gen_centers):
        # pq8 regime: no resident flat store exists at this scale — GT
        # merges block-by-block, corpus blocks are transient
        x = gen_block(i, gen_centers)
        s = jnp.dot(
            qdev.astype(jnp.bfloat16), x.T, preferred_element_type=jnp.float32
        )
        cs, ci = jax.lax.top_k(s, k)
        all_s = jnp.concatenate([gt_s, cs], axis=1)
        all_i = jnp.concatenate([gt_i, ci + i * blk], axis=1)
        ms, sel = jax.lax.top_k(all_s, k)
        return ms, jnp.take_along_axis(all_i, sel, axis=1)

    db_i8 = None
    gt_s = jnp.full((args.nq, k), -1e30, jnp.float32)
    gt_i = jnp.full((args.nq, k), -1, jnp.int32)
    if args.rescore_kind == "int8":
        db_i8 = jnp.zeros((n, d), jnp.int8)
        for i in range(n_blocks):
            db_i8, gt_s, gt_i = ingest(i, db_i8, gt_s, gt_i, q, _centers)
            print(f"  ingest block {i + 1}/{n_blocks}", flush=True)
    else:
        for i in range(n_blocks):
            gt_s, gt_i = ingest_gt_only(i, gt_s, gt_i, q, _centers)
            print(f"  ingest block {i + 1}/{n_blocks}", flush=True)
    gt = np.asarray(gt_i)
    q_np = np.asarray(q)
    print(f"ingest + GT: {time.time() - t0:.0f}s", flush=True)

    results = {"config": {
        "n": n, "d": d, "k": k, "nlist": args.nlist, "m": args.m,
        "rescore_kind": args.rescore_kind,
        "backend": jax.default_backend(),
        "note": (
            "flat-int8 has NO rescore copy (bf16 copy = 15.7 GB > HBM); "
            "IVF-Flat bf16 = 23.6 GB, infeasible single-chip at 10M"
        ) if args.rescore_kind == "int8" else (
            f">=30M regime: flat-int8 store = {n * d / 2**30:.1f} GB > "
            "HBM — no flat ladder exists at this scale; rescore store = "
            + ({"host_int8": "host-RAM int8 refine (device shortlist + "
                             "exact host re-score; ladder times INCLUDE "
                             "the ids-fetch RTT)",
                "host_f16": "host-RAM f16 refine (near-exact ranking; "
                            "ladder times INCLUDE the ids-fetch RTT)",
                "int4": f"int4 per-row-scaled residual tier in HBM "
                        f"({n * (d // 2 + 6) / 2**30:.1f} GB) — zero "
                        "host store (faiss refine-from-storage shape, "
                        "SQ4 refine index analog)",
                }.get(args.rescore_kind,
                      f"flat residual-PQ8 tier in HBM "
                      f"({n * args.m8 / 2**30:.1f} GB, m8={args.m8})"))
        ),
    }, "flat_int8": [], "ivfpq4": []}

    rng = np.random.default_rng(1)

    def variants_for(b, n_var=3, stack=4):
        out = []
        for r in range(n_var):
            sel = rng.integers(0, args.nq, (stack, b))
            out.append(jnp.asarray(q_np[sel]))
        return out

    def recall_against_gt(ids, rows):
        return float(np.mean([
            len(set(ids[j].tolist()) & set(gt[rows[j]].tolist())) / k
            for j in range(len(rows))
        ]))

    def recall_all(search_fn, b, *extra):
        """Recall over ALL nq queries, searched in batches of b — at B=1
        a single-row recall (the earlier protocol) is a 10-sample
        statistic; this gives nq*k samples at every batch size."""
        hits = []
        for lo in range(0, args.nq - args.nq % b, b):
            rows = np.arange(lo, lo + b)
            # numpy in: jitted callees upload once; host-refine callees
            # keep it on host (a jnp round-trip here doubles tunnel RTTs)
            _, ids = search_fn(q_np[rows], *extra)
            hits.append(recall_against_gt(np.asarray(ids), rows))
        return float(np.mean(hits))

    def regen_host_store(kind):
        """Rebuild the keyed corpus host-side on the in-process CPU backend
        (threefry is platform-deterministic; asserted vs device rows).
        kind="int8" -> global-scale codes; kind="f16" -> raw rows. Nothing
        big crosses the link either way."""
        th = time.time()
        cpu0 = jax.devices("cpu")[0]
        centers_np = np.asarray(_centers).astype(np.float32)
        scale_np = float(np.asarray(scale))
        with jax.default_device(cpu0):
            key_c = jax.random.key(0)
            which_c = jax.random.split(jax.random.fold_in(key_c, 999))[1]
            gen_c = jax.random.fold_in(key_c, 555)
            centers_c = jnp.asarray(centers_np)

            @jax.jit
            def host_block(i, centers):
                def chunk(j):
                    idx = i * n_ch + j
                    which = jax.random.randint(
                        jax.random.fold_in(which_c, idx), (gch,), 0,
                        n_centers,
                    )
                    x = centers[which] + sigma * jax.random.normal(
                        jax.random.fold_in(gen_c, idx), (gch, d), jnp.float32
                    )
                    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
                    # mirror the device ingest dtype path: bf16 storage
                    # precision first
                    xb = x.astype(jnp.bfloat16)
                    if kind == "int8":
                        return jnp.clip(
                            jnp.round(xb.astype(jnp.float32) / scale_np),
                            -127, 127,
                        ).astype(jnp.int8)
                    # every bf16 value is exactly representable in f16
                    return xb.astype(jnp.float16)

                return jax.lax.map(chunk, jnp.arange(n_ch)).reshape(blk, d)

            store = np.empty((n, d), np.int8 if kind == "int8" else np.float16)
            for i in range(n_blocks):
                store[i * blk : (i + 1) * blk] = np.asarray(
                    host_block(i, centers_c)
                )
                if i == 0:
                    # cross-platform determinism check vs the device rows
                    # (int8: compare post-clip — the 99.9th-pct scale
                    # legitimately saturates a few outlier coords; allow 1
                    # step for cross-backend normal() ulp)
                    dev_rows = np.asarray(x0_head).astype(np.float32)
                    if kind == "int8":
                        dev_q = np.clip(
                            np.round(dev_rows / scale_np), -127, 127
                        )
                        err = np.abs(
                            store[:1024].astype(np.float32) - dev_q
                        ).max()
                        assert err <= 1.01, (
                            f"host regen diverged ({err:.2f} int8 steps)"
                        )
                    else:
                        err = np.abs(
                            store[:1024].astype(np.float32) - dev_rows
                        ).max()
                        assert err < 1e-3, f"host regen diverged ({err:.2e})"
                print(f"  host store block {i + 1}/{n_blocks}", flush=True)
        print(f"host {kind} store: {time.time() - th:.0f}s "
              f"({store.nbytes / 2**30:.1f} GB host RAM)", flush=True)
        return store, scale_np

    def time_wall(search_np, b, reps=5):
        """Median wall-clock ms/call for a host-facing search (numpy in),
        INCLUDING device-dispatch + ids-fetch RTT; warm on a row-reversed
        copy (never a timed input — dedup hazard, PERF_NOTES)."""
        variants = [
            np.asarray(v)[0] for v in variants_for(b, n_var=reps, stack=1)
        ]
        search_np(variants[0][::-1].copy())
        times = []
        for v in variants:
            t0_ = time.perf_counter()
            search_np(v)
            times.append((time.perf_counter() - t0_) * 1e3)
        return float(np.median(times))

    # ---- phase 2: flat-int8 ladder ("" skips: already-measured rerun) ---
    # device arrays are passed to time_inprogram's scanner via `extra`,
    # never closed over (PERF_NOTES "Tunnel hazard")
    mm = False  # native int8 MXU dot (round-3 default; PERF_NOTES)

    def flat_search(qq, dbi, sc):
        return fused_topk_int8gs(
            qq, dbi, sc, k, nbins=nbins, chunk=chunk,
            ntotal=n, mm_bf16=mm, interpret=interpret,
        )

    for b in (int(x) for x in args.flat_batches.split(",") if x
              ) if args.rescore_kind == "int8" else ():
        rec = recall_all(flat_search, b, db_i8, scale)
        ms = time_inprogram(
            flat_search, variants_for(b), extra=(db_i8, scale), reps=3
        )
        qps = b / (ms / 1e3)
        print(f"flat-int8 B={b:4d}: {ms:8.2f} ms recall {rec:.3f} "
              f"QPS {qps:8.0f}", flush=True)
        results["flat_int8"].append({
            "batch": b, "ms_inprogram": round(ms, 2),
            "recall": round(rec, 4), "qps": round(qps, 1),
        })
        _write(args.out, results)

    if args.flat_host_rescore and args.rescore_kind == "int8":
        # flat-int8 shortlist + f16 host refine (index/flat.py
        # rescore_store="host"): the recall row the on-chip bf16 copy
        # cannot provide at this scale
        from rag_inference_pipeline_tpu.index.flat import _host_f16_rescore

        host_f16, _ = regen_host_store("f16")
        results["flat_int8_host_rescore"] = []

        @functools.partial(jax.jit, static_argnames=("kk",))
        def flat_short(qq, dbi, sc, kk):
            return fused_topk_int8gs(
                qq, dbi, sc, kk, nbins=nbins, chunk=chunk,
                ntotal=n, mm_bf16=mm, interpret=interpret,
            )

        for b in (int(x) for x in args.flat_batches.split(",") if x):
            for s_k in (64, 256):
                def search_np(qq_np, _sk=s_k):
                    _, ids = flat_short(
                        jnp.asarray(qq_np), db_i8, scale, _sk
                    )
                    return _host_f16_rescore(
                        np.asarray(qq_np, np.float32), host_f16,
                        np.asarray(ids), k,
                    )

                rec = recall_all(search_np, b)
                ms = time_wall(search_np, b)
                qps = b / (ms / 1e3)
                print(f"flat+host B={b:4d} sk={s_k:4d}: {ms:8.2f} ms "
                      f"recall {rec:.3f} QPS {qps:8.0f}", flush=True)
                results["flat_int8_host_rescore"].append({
                    "batch": b, "shortlist": s_k,
                    "ms_wall_incl_rtt": round(ms, 2),
                    "recall": round(rec, 4), "qps": round(qps, 1),
                })
                _write(args.out, results)
        del host_f16

    if not args.pq_batches.strip():
        # flat-only run (e.g. --flat-host-rescore refresh): skip the
        # ~20-min PQ build + ladder entirely
        _write(args.out, results)
        print(f"wrote {args.out} (flat-only run)", flush=True)
        return

    # ---- phase 3: IVF-PQ4 build ----------------------------------------
    # training rows are a fresh sample from the SAME mixture, not a slice of
    # block 0: materializing a full 1M x 768 block outside jit costs ~6 GB
    # of f32 transients on top of the resident 7.9 GB int8 store (measured
    # RESOURCE_EXHAUSTED on v5e). faiss likewise trains on a sample.
    t0 = time.time()
    kc, kp, kp8 = jax.random.split(jax.random.fold_in(key, 77), 3)
    train_n = min(args.train_n, blk)

    @jax.jit
    def gen_train(gen_centers):
        which = jax.random.randint(
            jax.random.fold_in(which_key, 777_001), (train_n,), 0, n_centers
        )
        x = gen_centers[which] + sigma * jax.random.normal(
            jax.random.fold_in(key, 777_002), (train_n, d), jnp.float32
        )
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    train = gen_train(_centers)
    centroids, _ = kmeans(kc, train, args.nlist, iters=15)
    print(f"kmeans: {time.time() - t0:.0f}s", flush=True)

    # [blk, nlist] f32 scores = 16.8 GB at 1M x 4096 — generate AND score
    # per chunk so the transient is [gch, nlist] (1 GB at 64000)
    @jax.jit
    def assign_top8(i, cents, gen_centers):
        def chunk_top8(j):
            sc = jnp.dot(
                gen_chunk(i, j, gen_centers), cents.T,
                preferred_element_type=jnp.float32,
            )
            _, top8 = jax.lax.top_k(sc, 8)
            return top8.astype(jnp.int32)

        return jax.lax.map(chunk_top8, jnp.arange(n_ch)).reshape(blk, 8)

    top8_host = np.concatenate(
        [np.asarray(assign_top8(i, centroids, _centers))
         for i in range(n_blocks)]
    )  # [n, 8]
    print(f"assign: {time.time() - t0:.0f}s", flush=True)

    # host layout with an 8-tier nearest-centroid cascade (ops/ivf.py::
    # layout_inverted_lists semantics; the full-distance fallback is
    # replaced by "any free list" and counted — rare at cap_factor 1.5)
    # tier-major vectorized cascade (the sequential per-row loop is ~10M
    # Python iterations): every row tries its home list first, then
    # leftovers cascade to tier 2..8 — same semantics as
    # ops/ivf.py::layout_inverted_lists up to within-tier ordering
    cap = int(np.ceil(args.cap_factor * n / args.nlist))
    cap = max(128, ((cap + 127) // 128) * 128)
    ids = np.full((args.nlist, cap), -1, np.int32)
    sizes = np.zeros(args.nlist, np.int64)
    dest = np.full(n, -1, np.int64)  # row -> flat slot nlist*cap
    remaining = np.arange(n, dtype=np.int64)
    for t in range(top8_host.shape[1]):
        if remaining.size == 0:
            break
        c = top8_host[remaining, t].astype(np.int64)
        order = np.argsort(c, kind="stable")
        cs = c[order]
        rank = np.arange(cs.size) - np.searchsorted(cs, cs, side="left")
        slot = sizes[cs] + rank
        ok = slot < cap
        rows_ok = remaining[order[ok]]
        ids[cs[ok], slot[ok]] = rows_ok
        dest[rows_ok] = cs[ok] * cap + slot[ok]
        sizes += np.bincount(cs[ok], minlength=args.nlist)
        remaining = remaining[order[~ok]]
    parked = int(remaining.size)
    for row in remaining:  # rare at cap_factor >= 2.5: any-free-list park
        c = int(np.argmin(sizes))
        ids[c, sizes[c]] = row
        dest[row] = c * cap + sizes[c]
        sizes[c] += 1
    sizes = sizes.astype(np.int32)
    assign = top8_host[:, 0].copy()
    del top8_host
    print(f"layout: {time.time() - t0:.0f}s (parked {parked})", flush=True)

    # residual PQ4 training on the training sample (residual vs its own
    # nearest centroid — identical to what encode applies per stored row)
    @jax.jit
    def train_residuals(tr, cents):
        sc = jnp.dot(tr, cents.T, preferred_element_type=jnp.float32)
        return tr - cents[jnp.argmax(sc, axis=1)]

    codebooks = train_pq(
        kp, train_residuals(train, centroids), args.m, iters=12, ksub=16
    )
    codebooks8 = None
    if args.rescore_kind == "pq8":
        # finer rescore codebooks on the SAME residual distribution — the
        # tier shares the coarse k-means with the PQ4 listing
        codebooks8 = train_pq(
            kp8, train_residuals(train, centroids), args.m8, iters=12,
            ksub=256,
        )
    del train

    m_store = max(128, ((args.m + 127) // 128) * 128)
    # small transfers FIRST, while HBM still has contiguous headroom
    assign_dev = jax.device_put(jnp.asarray(assign))
    dest_dev = jax.device_put(jnp.asarray(dest, jnp.int32))
    ids_dev = jax.device_put(jnp.asarray(ids))
    sizes_dev = jax.device_put(jnp.asarray(sizes))

    @functools.partial(jax.jit, donate_argnums=(1,))
    def encode_scatter(i, flat_codes, cents, cbooks, a_all, d_all, gen_centers):
        # generate + residual + encode PER CHUNK: whole-block f32
        # residuals are ~6 GB of transients next to the resident int8
        # store + code buckets (OOMs v5e); per-chunk it is [gch, d] f32
        def chunk_codes(j):
            a = jax.lax.dynamic_slice_in_dim(
                a_all, i * blk + j * gch, gch
            )
            r = gen_chunk(i, j, gen_centers) - cents[a]
            return pq_encode(r, cbooks)

        codes = jax.lax.map(chunk_codes, jnp.arange(n_ch)).reshape(
            blk, args.m
        )
        codes = jnp.pad(codes, ((0, 0), (0, m_store - args.m)))
        dst = jax.lax.dynamic_slice_in_dim(d_all, i * blk, blk)
        # scatter into the FINAL bucket shape: a flat buffer + end-of-build
        # reshape costs a second 3.3 GB device copy next to the resident
        # int8 store (measured RESOURCE_EXHAUSTED at cap_factor 2.5)
        return flat_codes.at[dst // cap, dst % cap].set(codes, mode="drop")

    flat_codes = jnp.zeros((args.nlist, cap, m_store), jnp.uint8)
    for i in range(n_blocks):
        flat_codes = encode_scatter(
            i, flat_codes, centroids, codebooks, assign_dev, dest_dev,
            _centers,
        )
        print(f"  encode block {i + 1}/{n_blocks}", flush=True)
    listing = IVFPQListing(
        centroids=centroids,
        codebooks=codebooks,
        code_buckets=flat_codes,
        ids=ids_dev,
        list_sizes=sizes_dev,
    )
    tier = None
    if args.rescore_kind == "pq8":
        # flat PQ8 rescore tier, row-id addressed (no bucket padding):
        # n x m8 bytes — 2.9 GB at 30M/m8=96, resident NEXT TO the 7.9 GB
        # PQ4 buckets where a 23 GB int8 copy cannot be
        @functools.partial(jax.jit, donate_argnums=(1,))
        def encode8(i, codes8_buf, cents, cbooks, a_all, gen_centers):
            def chunk_codes8(j):
                a = jax.lax.dynamic_slice_in_dim(a_all, i * blk + j * gch, gch)
                r = gen_chunk(i, j, gen_centers) - cents[a]
                return pq_encode(r, cbooks)

            c8 = jax.lax.map(chunk_codes8, jnp.arange(n_ch)).reshape(
                blk, args.m8
            )
            return jax.lax.dynamic_update_slice(codes8_buf, c8, (i * blk, 0))

        codes8 = jnp.zeros((n, args.m8), jnp.uint8)
        for i in range(n_blocks):
            codes8 = encode8(
                i, codes8, centroids, codebooks8, assign_dev, _centers
            )
            print(f"  encode8 block {i + 1}/{n_blocks}", flush=True)
        tier = PQFlatTier(
            centroids=centroids,
            codebooks=codebooks8,
            codes=codes8,
            assign=assign_dev,
        )
    tier4 = None
    if args.rescore_kind == "int4":
        # int4 residual tier, row-id addressed: d/2 code bytes + one f16
        # per-row scale next to the PQ4 buckets. Encode matches
        # ops/pq.py::build_int4_tier (symmetric, per-row amax/7 scale)
        # but streams the keyed corpus on device — the bench's x never
        # exists on any host.
        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def encode4(i, codes_buf, scale_buf, cents, a_all, gen_centers):
            def chunk4(j):
                a = jax.lax.dynamic_slice_in_dim(
                    a_all, i * blk + j * gch, gch
                )
                r = gen_chunk(i, j, gen_centers) - cents[a]
                amax = jnp.max(jnp.abs(r), axis=1)
                sc = jnp.maximum(amax / 7.0, 1e-8)
                qv = jnp.clip(
                    jnp.round(r / sc[:, None]), -8, 7
                ).astype(jnp.int32)
                u = (qv + 8).astype(jnp.uint8)
                return u[:, 0::2] | (u[:, 1::2] << 4), sc.astype(jnp.float16)

            packed, sc = jax.lax.map(chunk4, jnp.arange(n_ch))
            codes_buf = jax.lax.dynamic_update_slice(
                codes_buf, packed.reshape(blk, d // 2), (i * blk, 0)
            )
            scale_buf = jax.lax.dynamic_update_slice(
                scale_buf, sc.reshape(blk), (i * blk,)
            )
            return codes_buf, scale_buf

        codes4 = jnp.zeros((n, d // 2), jnp.uint8)
        scl4 = jnp.zeros((n,), jnp.float16)
        for i in range(n_blocks):
            codes4, scl4 = encode4(
                i, codes4, scl4, centroids, assign_dev, _centers
            )
            print(f"  encode4 block {i + 1}/{n_blocks}", flush=True)
        tier4 = Int4ResidualTier(
            centroids=centroids,
            codes=codes4,
            row_scale=scl4,
            assign=assign_dev,
        )
    host_codes = None
    host_scale = 0.0
    host_f16_store = None
    if args.rescore_kind == "host_int8":
        # host-RAM refine store (regen_host_store: keyed CPU-backend
        # rebuild, nothing big crosses the link). 23 GB at 30M x 768 sits
        # in host RAM where it could never sit in HBM.
        host_codes, host_scale = regen_host_store("int8")
    elif args.rescore_kind == "host_f16":
        # f16 originals (46 GB at 30M): near-exact ranking — the int8
        # refine's ceiling is int8 ranking precision (~0.958 measured)
        host_f16_store, _ = regen_host_store("f16")
    print(f"ivfpq4 build total: {time.time() - t0:.0f}s", flush=True)

    # ---- phase 4: IVF-PQ4 ladder (+ exact-int8 shortlist re-score) ------
    # layout candidate bound: fraction of GT rows whose STORED list is
    # among the query's top-nprobe — the probing/centroid-quality ceiling
    # that no scoring method can beat (separates probing loss from ADC
    # loss; same decomposition as scripts/ivf_recall_oracle.py)
    stored_list = (dest // cap).astype(np.int64)
    cents_np = np.asarray(centroids)
    coarse_q = q_np @ cents_np.T
    bounds = {}
    for nprobe in (int(x) for x in args.nprobes.split(",")):
        pr = np.argsort(-coarse_q, axis=1)[:, :nprobe]
        bounds[nprobe] = round(float(np.mean([
            np.isin(stored_list[gt[i]], pr[i]).mean()
            for i in range(args.nq)
        ])), 4)
    results["layout_candidate_bound"] = bounds
    print(f"layout candidate bounds: {bounds}", flush=True)
    scale_f = jax.device_put(scale)

    def pq_search(qq, lst, dbi, sc, *, nprobe, rescore):
        s, ids_ = ivfpq4_search_dedup(
            lst, qq, rescore, nprobe=nprobe, interpret=interpret,
        )
        cand = jnp.take(dbi, jnp.clip(ids_, 0), axis=0)
        exact = jnp.einsum(
            "bsd,bd->bs",
            cand.astype(jnp.float32) * sc,
            qq.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        exact = jnp.where(ids_ >= 0, exact, -1e30)
        top, sel = jax.lax.top_k(exact, k)
        return top, jnp.take_along_axis(ids_, sel, axis=1)

    def pq_search_tier(qq, lst, tr, *, nprobe, rescore):
        # >=30M regime: re-rank the PQ4 ADC shortlist against the flat
        # residual-PQ8 tier (the only rescore store that fits)
        s, ids_ = ivfpq4_search_dedup(
            lst, qq, rescore, nprobe=nprobe, interpret=interpret,
        )
        return pq_tier_rescore_topk(qq.astype(jnp.float32), s, ids_, tr, k)

    def pq_search_tier4(qq, lst, tr, *, nprobe, rescore):
        # int4 HBM tier: re-rank the PQ4 ADC shortlist against per-row-
        # scaled int4 residuals (0.5 byte/dim) — zero host store
        s, ids_ = ivfpq4_search_dedup(
            lst, qq, rescore, nprobe=nprobe, interpret=interpret,
        )
        return int4_tier_rescore_topk(qq.astype(jnp.float32), s, ids_, tr, k)

    if args.rescore_kind == "pq8":
        ladder_extra = (listing, tier)
        ladder_fn = pq_search_tier
    elif args.rescore_kind == "int4":
        ladder_extra = (listing, tier4)
        ladder_fn = pq_search_tier4
    elif args.rescore_kind == "int8":
        ladder_extra = (listing, db_i8, scale_f)
        ladder_fn = pq_search
    else:  # host_int8 drives its own ladder below (no device extras)
        ladder_extra = ()
        ladder_fn = None

    @functools.partial(jax.jit, static_argnames=("rescore", "nprobe"))
    def adc_dev(lst, qq, rescore, nprobe):
        return ivfpq4_search_dedup(
            lst, qq, rescore, nprobe=nprobe, interpret=interpret
        )

    def host_search(qq_np, *, nprobe, rescore):
        # the product path (index/ivf_pq.py rescore_kind="host_int8" /
        # "host_f16"): device shortlist -> ids fetch -> exact host refine
        from rag_inference_pipeline_tpu.index.flat import _host_f16_rescore
        from rag_inference_pipeline_tpu.index.ivf_pq import _host_int8_rescore

        _, ids_ = adc_dev(listing, jnp.asarray(qq_np), rescore, nprobe)
        if host_f16_store is not None:
            return _host_f16_rescore(
                np.asarray(qq_np, np.float32), host_f16_store,
                np.asarray(ids_), k,
            )
        return _host_int8_rescore(
            np.asarray(qq_np, np.float32), host_codes, host_scale,
            np.asarray(ids_), k,
        )

    def time_host(b, nprobe, rescore, reps=5):
        """Wall-clock per call, INCLUDING the ids-fetch RTT (tunnel-honest:
        np.asarray forces execution; PERF_NOTES 'Measurement reliability').
        Returns (total_ms, host_ms)."""
        variants = [np.asarray(v)[0] for v in variants_for(b, n_var=reps, stack=1)]
        # warm on a row-reversed copy — NEVER a timed input (dedup hazard,
        # PERF_NOTES / bench/protocol.py)
        host_search(variants[0][::-1].copy(), nprobe=nprobe, rescore=rescore)
        totals, hosts = [], []
        from rag_inference_pipeline_tpu.index.flat import _host_f16_rescore
        from rag_inference_pipeline_tpu.index.ivf_pq import _host_int8_rescore

        for v in variants:
            t0_ = time.perf_counter()
            _, ids_ = adc_dev(listing, jnp.asarray(v), rescore, nprobe)
            ids_np = np.asarray(ids_)
            t1_ = time.perf_counter()
            if host_f16_store is not None:
                _host_f16_rescore(
                    v.astype(np.float32), host_f16_store, ids_np, k
                )
            else:
                _host_int8_rescore(
                    v.astype(np.float32), host_codes, host_scale, ids_np, k
                )
            t2_ = time.perf_counter()
            totals.append((t2_ - t0_) * 1e3)
            hosts.append((t2_ - t1_) * 1e3)
        return float(np.median(totals)), float(np.median(hosts))

    rescores = [int(x) for x in args.rescores.split(",") if x]
    for b in (int(x) for x in args.pq_batches.split(",") if x):
        for nprobe, rescore in (
            (np_, rs) for np_ in (int(x) for x in args.nprobes.split(","))
            for rs in rescores
        ):
            if args.rescore_kind in ("host_int8", "host_f16"):
                try:
                    search = functools.partial(
                        host_search, nprobe=nprobe, rescore=rescore
                    )
                    rec = recall_all(search, b)
                    ms, host_ms = time_host(b, nprobe, rescore)
                except Exception as e:  # noqa: BLE001
                    print(f"ivfpq4 B={b} nprobe={nprobe} rs={rescore} SKIP: "
                          f"{str(e).splitlines()[0][:90]}", flush=True)
                    continue
                qps = b / (ms / 1e3)
                print(f"ivfpq4+host B={b:3d} nprobe={nprobe:4d} "
                      f"rs={rescore:5d}: {ms:8.2f} ms (host {host_ms:.2f}) "
                      f"recall {rec:.3f} QPS {qps:8.0f}", flush=True)
                results["ivfpq4"].append({
                    "batch": b, "nprobe": nprobe, "rescore": rescore,
                    "ms_wall_incl_rtt": round(ms, 2),
                    "ms_host_rescore": round(host_ms, 2),
                    "recall": round(rec, 4), "qps": round(qps, 1),
                })
                _write(args.out, results)
                continue
            search = functools.partial(
                ladder_fn, nprobe=nprobe, rescore=rescore
            )
            try:
                rec = recall_all(search, b, *ladder_extra)
                ms = time_inprogram(
                    search, variants_for(b),
                    extra=ladder_extra, reps=3,
                )
            except Exception as e:  # noqa: BLE001
                print(f"ivfpq4 B={b} nprobe={nprobe} rs={rescore} SKIP: "
                      f"{str(e).splitlines()[0][:90]}", flush=True)
                continue
            qps = b / (ms / 1e3)
            print(f"ivfpq4 B={b:3d} nprobe={nprobe:4d} rs={rescore:5d}: "
                  f"{ms:8.2f} ms recall {rec:.3f} QPS {qps:8.0f}",
                  flush=True)
            results["ivfpq4"].append({
                "batch": b, "nprobe": nprobe, "rescore": rescore,
                "ms_inprogram": round(ms, 2), "recall": round(rec, 4),
                "qps": round(qps, 1),
            })
            _write(args.out, results)

    flat_by_b = {r["batch"]: r for r in results["flat_int8"]}
    for r in results["ivfpq4"]:
        f = flat_by_b.get(r["batch"])
        if f and "ms_inprogram" in r:
            r["speedup_vs_flat"] = round(
                f["ms_inprogram"] / r["ms_inprogram"], 2
            )
    _write(args.out, results)
    print(f"wrote {args.out}", flush=True)


def _write(path, payload) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=2)


if __name__ == "__main__":
    main()
