#!/usr/bin/env python
"""Parameterized kernel lab for the int8gs flat-scan — consolidates the six
one-shot round-2 ablation scripts (bench_kernel_{ablate,ablate2,ablate3,
ablate4,sweep,sweep2}.py, see git history) into one tool built on
rag_inference_pipeline_tpu.bench.protocol.

Modes:
  scan    one config: in-program + pipelined + fetch-RTT timing, recall
  ladder  sweep batch x nbins x chunk (the round-3 fixed-term-amortization
          experiment: cost/pass = ~4 ms fixed + bytes/800 GB/s on this rig,
          so QPS rises with B until VMEM forces a smaller chunk — find the
          frontier; VERDICT round-2 item #2)
  stream  pure-DMA ceiling kernel over the same grid (GB/s reference)
  tail    raw scan vs +top_k vs +rescore (selection-tail accounting)

The kernel under test is the production path (ops/topk.py::fused_topk_int8gs
with mm_bf16 auto) — not a bench-only variant. Reference hot loop replaced:
faiss IndexFlat search, src/pipeline/components/faiss_store.py:113-158.
"""

from __future__ import annotations

try:  # repo-root import without pip install; scripts/ is sys.path[0]
    # only when run as a script — harmless to skip when imported as a
    # module by tests (the package is importable there already)
    import _pathfix  # noqa: F401
except ImportError:
    pass

import argparse
import json
import os
import time


def build_corpus(args):
    import jax
    import jax.numpy as jnp

    from rag_inference_pipeline_tpu.ops import quantize_global_int8

    n, d = args.n, args.d
    chunk_max = max(args.chunk_list)
    n_pad = ((n + chunk_max - 1) // chunk_max) * chunk_max
    key = jax.random.key(0)
    kd, kq, kp = jax.random.split(key, 3)
    db = jax.random.normal(kd, (n_pad, d), jnp.bfloat16)
    blk = 1 << 20
    _, db_scale = quantize_global_int8(db[: min(blk, n_pad)].astype(jnp.float32))
    qfn = jax.jit(
        lambda x, s: jnp.clip(
            jnp.round(x.astype(jnp.float32) / s), -127, 127
        ).astype(jnp.int8)
    )
    db_i8 = jnp.concatenate(
        [qfn(db[i : i + blk], db_scale) for i in range(0, n_pad, blk)]
    )
    jax.block_until_ready((db, db_i8, db_scale))
    return db, db_i8, db_scale, (kq, kp)


def make_queries(args, db, keys, b, n_variants=4, stack=8):
    import jax
    import jax.numpy as jnp

    kq, kp = keys
    rows = jax.random.randint(kq, (b,), 0, args.n)
    base = db[rows].astype(jnp.float32)
    variants = []
    for r in range(n_variants):
        stk = []
        for s in range(stack):
            noise = 0.05 * jax.random.normal(
                jax.random.fold_in(kp, r * stack + s), (b, args.d)
            )
            stk.append((base + noise).astype(jnp.bfloat16))
        variants.append(jnp.stack(stk))
    jax.block_until_ready(variants)
    return variants


def recall_of(args, search, db, db_i8, db_scale, q):
    import jax
    import numpy as np

    from rag_inference_pipeline_tpu.ops import exact_topk

    oracle_chunk = next(
        c for c in (131072, 65536, 32768, 16384, 8192, db.shape[0])
        if db.shape[0] % c == 0
    )
    _, ei = exact_topk(q, db, args.k, chunk=oracle_chunk, ntotal=args.n)
    _, fi = search(q)
    ei, fi = np.asarray(ei), np.asarray(fi)
    return float(np.mean(
        [len(set(fi[i]) & set(ei[i])) / args.k for i in range(q.shape[0])]
    ))


def run_config(args, db, db_i8, db_scale, keys, b, nbins, chunk, rescore_k):
    """Measure one (B, nbins, chunk) config; returns result dict or None on
    VMEM overflow."""
    import jax
    import jax.numpy as jnp

    from rag_inference_pipeline_tpu.bench import (
        measure_rtt, time_fetch, time_inprogram, time_pipelined,
    )
    from rag_inference_pipeline_tpu.ops import fused_topk_int8gs, int8_mm_bf16_ok

    interpret = jax.default_backend() == "cpu"

    # device arrays reach every jit (incl. time_inprogram's scanner) as
    # ARGUMENTS — closing over them captures GBs as HLO constants, which the
    # tunneled remote compiler cannot survive (PERF_NOTES "Tunnel hazard")
    mm = {
        "auto": False, "bf16": True, "int8": False,  # auto = production default (native int8 dot)
    }[args.mm]

    def search_x(q, dbi, dbs, dbr):
        return fused_topk_int8gs(
            q.astype(jnp.float32), dbi, dbs, args.k,
            nbins=nbins, chunk=chunk, interpret=interpret,
            rescore_db=dbr, rescore_k=rescore_k,
            ntotal=args.n, mm_bf16=mm,
        )

    extra = (db_i8, db_scale, db if rescore_k else None)

    def search(q):
        return search_x(q, *extra)

    variants = make_queries(args, db, keys, b)
    try:
        rec = recall_of(args, search, db, db_i8, db_scale, variants[0][0])
        ms_ip = time_inprogram(search_x, variants, extra=extra, reps=3)
    except Exception as e:  # noqa: BLE001 — VMEM OOM at this config
        msg = str(e).splitlines()[0][:100]
        print(f"B={b:5d} nbins={nbins:5d} chunk={chunk:6d}  SKIP: {msg}")
        return None
    flat_inputs = list(variants[0]) + list(variants[1])
    rtt = measure_rtt(variants[0][0])
    ms_pipe = time_pipelined(search, flat_inputs)
    ms_fetch = time_fetch(search, flat_inputs[:4], rtt)
    qps = b / (ms_ip / 1e3)
    print(
        f"B={b:5d} nbins={nbins:5d} chunk={chunk:6d}  "
        f"inprog {ms_ip:7.2f} ms  pipe {ms_pipe:7.2f}  fetch {ms_fetch:7.2f}"
        f"  recall {rec:.3f}  QPS(inprog) {qps:9.0f}",
        flush=True,
    )
    return {
        "batch": b, "nbins": nbins, "chunk": chunk, "rescore_k": rescore_k,
        "ms_inprogram": round(ms_ip, 3), "ms_pipelined": round(ms_pipe, 3),
        "ms_fetch_xcheck": round(ms_fetch, 3), "recall": round(rec, 4),
        "qps_inprogram": round(qps, 1),
    }


def run_stream(args, db_i8):
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rag_inference_pipeline_tpu.bench import measure_rtt, time_fetch

    def stream_kernel(q_ref, db_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = q_ref[:]

        out_ref[:] = out_ref[:] + db_ref[0:8, 0:128].astype(jnp.int32)

    n, d = db_i8.shape
    for chunk in args.chunk_list:
        grid = n // chunk
        fn = jax.jit(functools.partial(
            pl.pallas_call(
                stream_kernel,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((8, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk, d), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            ),
        ))
        qs = [
            jnp.full((8, 128), i, jnp.int32) for i in range(8)
        ]
        rtt = measure_rtt(qs[0])
        jax.block_until_ready(fn(qs[0], db_i8))
        t0 = time.perf_counter()
        outs = [fn(q, db_i8) for q in qs for _ in range(2)]
        jax.block_until_ready(outs)
        ms_pipe = (time.perf_counter() - t0) / 16 * 1e3
        ms_fetch = time_fetch(lambda q: fn(q, db_i8), qs[:4], rtt)
        gbs = (n * d) / (ms_fetch / 1e3) / 1e9
        print(
            f"stream chunk={chunk:6d}: pipe {ms_pipe:7.2f} ms  "
            f"fetch {ms_fetch:7.2f} ms -> {gbs:6.0f} GB/s", flush=True,
        )


def run_tail(args, db, db_i8, db_scale, keys):
    import jax
    import jax.numpy as jnp

    from rag_inference_pipeline_tpu.bench import time_inprogram
    from rag_inference_pipeline_tpu.ops import (
        binmax_partial_topk_int8gs, fused_topk_int8gs, int8_mm_bf16_ok,
    )

    b, nbins, chunk = args.batch, args.nbins, args.chunk
    mm = False  # production default: native int8 dot
    interp = jax.default_backend() == "cpu"
    variants = make_queries(args, db, keys, b)

    def q_i8(q):
        qf = q.astype(jnp.float32)
        qs = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-9) / 127.0
        return jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)

    def raw(q):
        return binmax_partial_topk_int8gs(
            q_i8(q), db_i8, nbins=nbins, chunk=chunk, ntotal=args.n,
            mm_bf16=mm, interpret=interp,
        )

    def with_topk(q):
        return fused_topk_int8gs(
            q.astype(jnp.float32), db_i8, db_scale, args.k, nbins=nbins,
            chunk=chunk, ntotal=args.n, mm_bf16=mm, interpret=interp,
        )

    def with_rescore(q):
        return fused_topk_int8gs(
            q.astype(jnp.float32), db_i8, db_scale, args.k, nbins=nbins,
            chunk=chunk, ntotal=args.n, mm_bf16=mm, interpret=interp,
            rescore_db=db, rescore_k=args.rescore,
        )

    for name, fn in (("raw scan", raw), ("+top_k", with_topk),
                     ("+top_k+rescore", with_rescore)):
        ms = time_inprogram(fn, variants, reps=3)
        print(f"{name:18s} {ms:7.2f} ms/call (in-program)", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["scan", "ladder", "stream", "tail"],
                    default="scan")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nbins", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--rescore", type=int, default=64)
    ap.add_argument("--batches", default="128,256,512,1024")
    ap.add_argument("--nbins-list", default="512,1024")
    ap.add_argument("--chunks", default="4096,8192")
    ap.add_argument(
        "--mm", choices=["auto", "bf16", "int8"], default="auto",
        help="matmul path: bf16-upcast (bit-exact, bf16 MXU rate) vs native "
        "int8 dot (2x peak TOPs on v5e — the compute-bound large-B lever)",
    )
    ap.add_argument("--out", default="artifacts/round3/bench_kernel.json")
    args = ap.parse_args()
    args.chunk_list = sorted(
        {int(x) for x in args.chunks.split(",")} | {args.chunk}
    )

    from rag_inference_pipeline_tpu.core.bootstrap import bootstrap

    bootstrap()
    import jax

    print(f"backend={jax.default_backend()} n={args.n} d={args.d}", flush=True)
    db, db_i8, db_scale, keys = build_corpus(args)

    results = []
    if args.mode == "scan":
        r = run_config(args, db, db_i8, db_scale, keys, args.batch,
                       args.nbins, args.chunk, args.rescore)
        results = [r] if r else []
    elif args.mode == "ladder":
        for b in (int(x) for x in args.batches.split(",")):
            for nb in (int(x) for x in args.nbins_list.split(",")):
                for ch in (int(x) for x in args.chunks.split(",")):
                    if ch % nb:
                        continue
                    r = run_config(args, db, db_i8, db_scale, keys, b, nb,
                                   ch, args.rescore)
                    if r:
                        results.append(r)
    elif args.mode == "stream":
        run_stream(args, db_i8)
    elif args.mode == "tail":
        run_tail(args, db, db_i8, db_scale, keys)

    if results:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        payload = {
            "mode": args.mode, "n": args.n, "d": args.d,
            "backend": jax.default_backend(), "results": results,
        }
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
