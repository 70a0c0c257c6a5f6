#!/usr/bin/env python
"""Continuous-batching engine A/B vs static batch decode (VERDICT round-1
item #7): mixed 16-512-token workload, segment_steps sweep, pipelined vs
synchronous segment dispatch.

Static baseline = the reference's decode-to-completion semantics
(components/llm.py:368-459): the batch is padded and every request waits for
the longest generation. The engine admits into persistent lanes and frees
them at segment boundaries.

Usage: python scripts/bench_engine_ab.py [--requests 48] [--lanes 16]
"""

from __future__ import annotations

try:  # repo-root import without pip install; scripts/ is sys.path[0]
    # only when run as a script — harmless to skip when imported as a
    # module by tests (the package is importable there already)
    import _pathfix  # noqa: F401
except ImportError:
    pass

import argparse
import asyncio
import os
import time

os.environ.pop("JAX_PLATFORMS", None)

import jax
import jax.numpy as jnp
import numpy as np

from rag_inference_pipeline_tpu.engine.decode_engine import DecodeEngine
from rag_inference_pipeline_tpu.models.qwen import (
    QwenConfig,
    greedy_generate,
    init_qwen_params,
)


def make_workload(rng, n, vocab, prompt_len=128):
    reqs = []
    for i in range(n):
        plen = int(rng.integers(32, prompt_len))
        ids = rng.integers(1, vocab, plen).astype(np.int32)
        max_new = int(rng.choice([16, 32, 64, 128, 256, 512]))
        reqs.append((ids, max_new))
    return reqs


def bench_static(params, cfg, reqs, batch, eos, cache_len):
    """Decode-to-completion in fixed batches (reference semantics)."""
    t0 = time.perf_counter()
    total = 0
    for s in range(0, len(reqs), batch):
        chunk = reqs[s : s + batch]
        plen = max(len(r[0]) for r in chunk)
        plen = ((plen + 63) // 64) * 64
        max_new = max(r[1] for r in chunk)
        ids = np.zeros((len(chunk), plen), np.int32)
        mask = np.zeros((len(chunk), plen), np.int32)
        for j, (p, _) in enumerate(chunk):
            ids[j, : len(p)] = p
            mask[j, : len(p)] = 1
        out = greedy_generate(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask),
            max_new, eos_token_id=eos, cache_len=min(cache_len, plen + max_new),
        )
        # full fetch — block_until_ready through the tunnel does not await
        np.asarray(out)
        # each request only wanted its own max_new
        total += sum(r[1] for r in chunk)
    dt = time.perf_counter() - t0
    return total / dt, dt


def bench_engine(params, cfg, reqs, lanes, steps, eos, cache_len, pipelined):
    async def main():
        eng = DecodeEngine(
            params, cfg, lanes=lanes, cache_len=cache_len,
            segment_steps=steps, eos_token_id=eos,
            admit_buckets=(1, 2, 4, 8, 16),
            prefill_buckets=(64, 128),
            pipeline_segments=pipelined,
        )
        await eng.start()
        t0 = time.perf_counter()
        outs = await asyncio.gather(
            *[eng.submit(p, m) for p, m in reqs]
        )
        dt = time.perf_counter() - t0
        await eng.stop()
        total = sum(len(o) or r[1] for o, r in zip(outs, reqs))
        return total / dt, dt

    return asyncio.new_event_loop().run_until_complete(main())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=48)
    ap.add_argument("--lanes", type=int, default=16)
    ap.add_argument("--cache-len", type=int, default=768)
    ap.add_argument("--tiny", action="store_true", help="tiny cfg (CPU test)")
    ap.add_argument(
        "--model",
        choices=["qwen25_05b", "llama32_1b", "llama31_8b"],
        default="qwen25_05b",
    )
    ap.add_argument("--quant", action="store_true",
                    help="int8 decoder weights (llm_weight_quant analog; "
                    "W8A8-dynamic, PERF_NOTES 'int8 decode')")
    args = ap.parse_args()

    print("backend:", jax.default_backend(), flush=True)
    cfg = (
        QwenConfig.tiny() if args.tiny else getattr(QwenConfig, args.model)()
    )
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    if args.quant:
        # leaf-incremental: also the only way llama31_8b fits one chip
        from rag_inference_pipeline_tpu.models.qwen import (
            init_qwen_params_int8,
        )

        params = init_qwen_params_int8(jax.random.key(0), cfg, dtype)
        print("decoder weights: int8 (W8A8-dynamic)", flush=True)
    else:
        params = init_qwen_params(jax.random.key(0), cfg, dtype)
    rng = np.random.default_rng(0)
    eos = -1  # run to length cap: worst case for the engine, fair A/B
    reqs = make_workload(rng, args.requests, cfg.vocab_size)
    tok_total = sum(r[1] for r in reqs)
    print(f"{len(reqs)} requests, {tok_total} wanted tokens", flush=True)

    # run every variant TWICE: the first pass eats the novel-compile cost
    # (static: one program per (plen-bucket, max_new); engine: per
    # segment_steps) — only the warm second pass is comparable
    bench_static(params, cfg, reqs, args.lanes, eos, args.cache_len)
    qps, dt = bench_static(
        params, cfg, reqs, args.lanes, eos, args.cache_len
    )
    print(f"static batch-{args.lanes:3d}                 "
          f"{qps:8.1f} tok/s   ({dt:.1f}s)", flush=True)

    for steps in (8, 16, 32, 64):
        for pipelined in (False, True):
            bench_engine(
                params, cfg, reqs, args.lanes, steps, eos,
                args.cache_len, pipelined,
            )
            qps, dt = bench_engine(
                params, cfg, reqs, args.lanes, steps, eos,
                args.cache_len, pipelined,
            )
            tag = "pipelined" if pipelined else "sync     "
            print(f"engine steps={steps:3d} {tag}      "
                  f"{qps:8.1f} tok/s   ({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
