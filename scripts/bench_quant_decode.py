#!/usr/bin/env python
"""int8 weight-quantized decode benchmark (llm_weight_quant="int8").

PERF_NOTES "Round 2 batch-1 latency": the B=1 decode floor is 1.70 ms/step
on this rig = the 0.92 GB bf16 weight stream. W8A8-dynamic quantization
(models/qwen.py::quantize_qwen_params) halves the bytes each step pulls
from HBM, so the roofline predicts ~0.9 ms/step single-chip — the same win
TP=2 buys, without a second chip. This bench measures it honestly:

- in-program lax.scan decode loop (cache carried, steps can't dedup),
  params passed as jit ARGS (PERF_NOTES "Tunnel hazard": closed-over arrays
  ship as HLO constants and hang the remote compile helper);
- per-config: decode ms/step at B in {1, 8}, prefill ms at T=128, and a
  gamma+1 verify-window (qwen_extend) ms/call — the speculative building
  block;
- bf16 baseline and int8 measured in the SAME process (CLAUDE.md: relative
  same-process comparisons are the trustworthy kind through the tunnel).

Reference hot loop being replaced: src/pipeline/components/llm.py:343-350
(fp32 torch, one token per forward, no quantization anywhere upstream).

Writes artifacts/round3/quant_decode.json.
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
    ap.add_argument("--smoke", action="store_true", help="tiny cfg on CPU")
    ap.add_argument("--steps", type=int, default=64, help="scan trip count")
    ap.add_argument(
        "--step-sweep",
        type=int,
        nargs="+",
        default=None,
        help="also time decode at these scan lengths (B=1 only, same "
        "process) and report a linear fit separating the fixed per-call "
        "tunnel cost from the true per-step time",
    )
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cache-len", type=int, default=384)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--gamma", type=int, default=8)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    ap.add_argument(
        "--model",
        choices=["qwen25_05b", "llama32_1b", "llama31_8b"],
        default="qwen25_05b",
        help="config preset (llama shares the decoder; bytes scale)",
    )
    ap.add_argument(
        "--int8-only",
        action="store_true",
        help="skip the bf16 config and init straight into int8 leaf-by-"
        "leaf (init_qwen_params_int8) — the only way llama31_8b fits a "
        "16 GB chip (bf16 weights alone are ~16 GB)",
    )
    ap.add_argument(
        "--out",
        default="artifacts/round3/quant_decode.json",
        help="output JSON path",
    )
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
        init_qwen_params_int8,
        param_compute_dtype,
        quantize_qwen_params,
        qwen_decode_step,
        qwen_extend,
        qwen_prefill,
    )

    cfg = (
        QwenConfig.tiny()
        if args.smoke
        else getattr(QwenConfig, args.model)()
    )
    dtype = jnp.float32 if args.smoke else jnp.bfloat16
    if args.int8_only:
        params = None
        qparams = init_qwen_params_int8(jax.random.key(0), cfg, dtype)
    else:
        params = init_qwen_params(jax.random.key(0), cfg, dtype)
        qparams = quantize_qwen_params(params)
    n_steps = 8 if args.smoke else args.steps
    cache_len = 64 if args.smoke else args.cache_len
    t_prompt = 16 if args.smoke else args.prompt_len
    dev = jax.devices()[0]
    print(f"device={dev.platform} cfg_layers={cfg.layers} hidden={cfg.hidden}")

    def make_decode_loop(length):
        @jax.jit
        def decode_loop(p, tok0, cache):
            def step(carry, _):
                tok, c = carry
                logits, c = qwen_decode_step(p, cfg, tok, c)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, c), nxt

            (_, cache2), toks = jax.lax.scan(
                step, (tok0, cache), None, length=length
            )
            return toks

        return decode_loop

    decode_loop = make_decode_loop(n_steps)

    @jax.jit
    def prefill_once(p, ids, mask, cache):
        logits, cache = qwen_prefill(p, cfg, ids, mask, cache)
        return jnp.argmax(logits, axis=-1)

    @jax.jit
    def verify_window(p, toks, cache):
        logits, _ = qwen_extend(p, cfg, toks, cache)
        return jnp.argmax(logits, axis=-1)

    rng = np.random.default_rng(0)
    out: dict = {"device": dev.platform, "steps": n_steps, "configs": {}}

    config_list = (
        [("int8", qparams)]
        if args.int8_only
        else [("bf16", params), ("int8", qparams)]
    )
    for name, p in config_list:
        cdt = (
            jnp.bfloat16
            if param_compute_dtype(p) == jnp.bfloat16
            else jnp.float32
        )
        row: dict = {}
        for b in args.batches:
            # warm prefill fills cache.length so decode attends a real span
            ids = jnp.asarray(
                rng.integers(1, cfg.vocab_size - 1, (b, t_prompt)), jnp.int32
            )
            mask = jnp.ones_like(ids)
            cache = KVCache.zeros(
                cfg.layers, b, cache_len, cfg.kv_heads, cfg.head_dim, dtype=cdt
            )
            np.asarray(prefill_once(p, ids, mask, cache))  # compile
            t0 = time.perf_counter()
            for _ in range(args.reps):
                np.asarray(prefill_once(p, ids, mask, cache))
            row[f"prefill_ms_b{b}"] = (
                (time.perf_counter() - t0) / args.reps * 1e3
            )

            # decode: run prefill once to get a warm cache, then scan steps
            _, warm_cache = qwen_prefill(p, cfg, ids, mask, cache)
            tok0 = jnp.asarray(
                rng.integers(1, cfg.vocab_size - 1, (b,)), jnp.int32
            )
            np.asarray(decode_loop(p, tok0, warm_cache))  # compile
            t0 = time.perf_counter()
            for r in range(args.reps):
                np.asarray(
                    decode_loop(p, tok0 + jnp.int32(r + 1), warm_cache)
                )
            ms_step = (
                (time.perf_counter() - t0) / (args.reps * n_steps) * 1e3
            )
            row[f"decode_ms_per_step_b{b}"] = ms_step

            if b == 1:
                toks = jnp.asarray(
                    rng.integers(1, cfg.vocab_size - 1, (b, args.gamma + 1)),
                    jnp.int32,
                )
                np.asarray(verify_window(p, toks, warm_cache))
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    np.asarray(verify_window(p, toks, warm_cache))
                row["verify_ms_g%d" % args.gamma] = (
                    (time.perf_counter() - t0) / args.reps * 1e3
                )
        out["configs"][name] = row
        print(name, json.dumps(row, indent=2))

    if not args.int8_only:
        b0 = out["configs"]["bf16"]
        q0 = out["configs"]["int8"]
        k = f"decode_ms_per_step_b{args.batches[0]}"
        out["speedup_decode_b%d" % args.batches[0]] = b0[k] / q0[k]
        print(
            f"int8 decode speedup @B={args.batches[0]}: "
            f"{b0[k]:.3f} -> {q0[k]:.3f} ms/step ({b0[k] / q0[k]:.2f}x)"
        )

    if args.step_sweep:
        # Same-process B=1 sweep over scan lengths with ONE fixed cache_len
        # (attention span constant across lengths, so total time is linear
        # in length: total = F + L*s). Least-squares fit separates the fixed
        # per-call cost F (tunnel RTT + dispatch) from the true per-step s.
        sweep_cache = t_prompt + max(args.step_sweep)
        sweep_out: dict = {"cache_len": sweep_cache, "lengths": {}}
        for name, p in config_list:
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
                cfg.layers, 1, sweep_cache, cfg.kv_heads, cfg.head_dim,
                dtype=cdt,
            )
            _, warm_cache = qwen_prefill(p, cfg, ids, mask, cache)
            totals = []
            for length in args.step_sweep:
                loop = make_decode_loop(length)
                tok0 = jnp.asarray(
                    rng.integers(1, cfg.vocab_size - 1, (1,)), jnp.int32
                )
                np.asarray(loop(p, tok0, warm_cache))  # compile
                t0 = time.perf_counter()
                for r in range(args.reps):
                    np.asarray(loop(p, tok0 + jnp.int32(r + 1), warm_cache))
                tot_ms = (time.perf_counter() - t0) / args.reps * 1e3
                totals.append(tot_ms)
                sweep_out["lengths"].setdefault(str(length), {})[name] = {
                    "total_ms": tot_ms,
                    "ms_per_step_naive": tot_ms / length,
                }
                print(
                    f"sweep {name} L={length}: {tot_ms:.1f} ms total, "
                    f"{tot_ms / length:.3f} ms/step naive"
                )
            ls = np.asarray(args.step_sweep, np.float64)
            ts = np.asarray(totals, np.float64)
            slope, fixed = np.polyfit(ls, ts, 1)
            sweep_out[name + "_fit"] = {
                "ms_per_step": float(slope),
                "fixed_ms_per_call": float(fixed),
            }
            print(
                f"fit {name}: {slope:.3f} ms/step + {fixed:.1f} ms/call fixed"
            )
        out["step_sweep"] = sweep_out

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    out["model"] = args.model
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
