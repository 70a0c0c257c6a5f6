#!/usr/bin/env python
"""Probe: does unrolling the decode lax.scan cut per-step overhead?

The corrected sweep fit (PERF_NOTES "int8 decode", RE-MEASURED) puts the
B=1 int8 decode step at 0.851 ms against a ~0.63 ms weight-stream floor.
One candidate for the 0.22 ms residual is per-iteration while-loop
overhead inside the compiled scan (the quant4 probe saw a fixed
per-scan-step cost at small shapes). `lax.scan(..., unroll=u)` trades
code size for u body copies per loop trip — if the residual is loop
overhead, unroll=2/4 should shave it; if it's HBM/compute, nothing moves.

Protocol: same-process, B=1, L=128 steps, one fixed cache_len, reps
timed with np.asarray sync; unroll in {1,2,4,8}; bf16 and int8 params.
Reference hot loop being replaced: src/pipeline/components/llm.py:343-350.

Writes artifacts/round3/scan_unroll.json.
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

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--length", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--unrolls", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--prompt-len", type=int, default=128)
    args = ap.parse_args()

    if args.smoke:
        os.environ.setdefault("DEVICE_PLATFORM", "cpu")
    from rag_inference_pipeline_tpu.core.bootstrap import bootstrap

    bootstrap()
    import jax
    import jax.numpy as jnp

    from rag_inference_pipeline_tpu.models.layers import KVCache
    from rag_inference_pipeline_tpu.models.qwen import (
        QwenConfig,
        init_qwen_params,
        param_compute_dtype,
        quantize_qwen_params,
        qwen_decode_step,
        qwen_prefill,
    )

    cfg = QwenConfig.tiny() if args.smoke else QwenConfig.qwen25_05b()
    dtype = jnp.float32 if args.smoke else jnp.bfloat16
    params = init_qwen_params(jax.random.key(0), cfg, dtype)
    qparams = quantize_qwen_params(params)
    length = 8 if args.smoke else args.length
    t_prompt = 8 if args.smoke else args.prompt_len
    cache_len = t_prompt + length
    dev = jax.devices()[0]
    print(f"device={dev.platform} L={length} cache={cache_len}")

    def make_loop(unroll):
        @jax.jit
        def loop(p, tok0, cache):
            def step(carry, _):
                tok, c = carry
                logits, c = qwen_decode_step(p, cfg, tok, c)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, c), nxt

            (_, _), toks = jax.lax.scan(
                step, (tok0, cache), None, length=length, unroll=unroll
            )
            return toks

        return loop

    rng = np.random.default_rng(0)
    out: dict = {"device": dev.platform, "length": length, "configs": {}}
    for name, p in (("bf16", params), ("int8", qparams)):
        cdt = (
            jnp.bfloat16
            if param_compute_dtype(p) == jnp.bfloat16
            else jnp.float32
        )
        ids = jnp.asarray(
            rng.integers(1, cfg.vocab_size - 1, (1, t_prompt)), jnp.int32
        )
        mask = jnp.ones_like(ids)
        cache = KVCache.zeros(
            cfg.layers, 1, cache_len, cfg.kv_heads, cfg.head_dim, dtype=cdt
        )
        _, warm = qwen_prefill(p, cfg, ids, mask, cache)
        row = {}
        ref_toks = None
        for u in args.unrolls:
            loop = make_loop(u)
            tok0 = jnp.asarray([5], jnp.int32)
            toks = np.asarray(loop(p, tok0, warm))  # compile
            if ref_toks is None:
                ref_toks = toks
                match = True
            else:
                # identical math, but unroll changes fusion groupings —
                # record rather than assert in case f32 reassociation
                # flips an argmax tie
                match = bool(np.array_equal(toks, ref_toks))
            row[f"unroll_{u}_token_match"] = match
            t0 = time.perf_counter()
            for r in range(args.reps):
                np.asarray(loop(p, tok0 + jnp.int32(r + 1), warm))
            ms = (time.perf_counter() - t0) / (args.reps * length) * 1e3
            row[f"unroll_{u}_ms_per_step"] = ms
            print(f"{name} unroll={u}: {ms:.3f} ms/step match={match}")
        out["configs"][name] = row

    os.makedirs("artifacts/round3", exist_ok=True)
    with open("artifacts/round3/scan_unroll.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts/round3/scan_unroll.json")


if __name__ == "__main__":
    main()
