#!/usr/bin/env python
"""Fused E2E RAG step, in-program protocol — the <100 ms north-star
measurement done right.

bench_e2e.py times each stage as its own dispatch, so its E2E numbers
carry stage-dispatch serialization + one fetch RTT (~30 ms on the
tunneled rig). The fused step (engine/device_pipeline.py::_rag_step —
embed -> int8 ANN + exact re-score -> on-device context-token gather ->
KV-cache decode, with optional n-gram self-speculation as ONE in-program
while_loop) is a single XLA program, so the lax.scan protocol
(bench/protocol.py::time_inprogram) times pure device latency with no
host round-trips — the number a host-attached deployment sees.

Corpus (1M x 768) and doc tokens are generated ON DEVICE (keyed chunks,
nothing big crosses the tunnel; PERF_NOTES 'Tunnel hazard': every array
is a jit argument). Weights are random — acceptance is INJECTED at rate
p (models/qwen.py docstring: the timing curve is the real one; real
acceptance is a property of real checkpoints).

Reference hot path being beaten: one token per forward at batch 4,
p50 1,470 ms (reference llm.py:343-350; BASELINE.md row 1).
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--ctx-docs", type=int, default=3)
    ap.add_argument("--doc-tok-len", type=int, default=32)
    ap.add_argument("--q-len", type=int, default=32)
    ap.add_argument("--gamma", type=int, default=8)
    ap.add_argument("--inject-ps", default="0.7,0.9")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stack", type=int, default=2)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument(
        "--llm-model",
        choices=["qwen25_05b", "llama32_1b", "llama31_8b"],
        default="qwen25_05b",
        help="decoder preset for the fused step (llama31_8b needs "
        "--llm-quant and is init'd leaf-incrementally)",
    )
    ap.add_argument(
        "--llm-quant", action="store_true",
        help="int8 matmul weights for the decoder (W8A8-dynamic, "
        "models/qwen.py::quantize_qwen_params) — halves the per-step HBM "
        "weight stream that dominates the fused step at B=1",
    )
    ap.add_argument("--out", default="artifacts/round3/e2e_fused.json")
    args = ap.parse_args()

    from rag_inference_pipeline_tpu.core.bootstrap import bootstrap

    bootstrap()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rag_inference_pipeline_tpu.bench import time_inprogram
    from rag_inference_pipeline_tpu.core import make_mesh
    from rag_inference_pipeline_tpu.engine.device_pipeline import _rag_step
    from rag_inference_pipeline_tpu.models.bert import (
        BertConfig,
        init_bert_params,
    )
    from rag_inference_pipeline_tpu.models.qwen import (
        QwenConfig,
        init_qwen_params,
    )
    from rag_inference_pipeline_tpu.ops import quantize_global_int8

    if args.smoke:
        args.n, args.tokens, args.q_len = 65536, 8, 8
        args.inject_ps = "0.9"
        bert_cfg, qwen_cfg = BertConfig.tiny(), QwenConfig.tiny()
    else:
        bert_cfg = BertConfig.bge_base()
        qwen_cfg = getattr(QwenConfig, args.llm_model)()
    n, d = args.n, bert_cfg.hidden
    ctx = make_mesh(dp=1, tp=1)
    interpret = jax.default_backend() == "cpu"
    print(f"backend={jax.default_backend()} n={n} d={d} "
          f"tokens={args.tokens}", flush=True)

    key = jax.random.key(7)
    bert_params = init_bert_params(jax.random.fold_in(key, 1), bert_cfg)
    if args.llm_model == "llama31_8b":
        # 16 GB bf16 never fits one chip: leaf-incremental int8 init
        if not args.llm_quant:
            raise SystemExit("llama31_8b requires --llm-quant (capacity)")
        from rag_inference_pipeline_tpu.models.qwen import (
            init_qwen_params_int8,
        )

        qwen_params = init_qwen_params_int8(
            jax.random.fold_in(key, 2), qwen_cfg, dtype=jnp.bfloat16
        )
        print("llm weights: leaf-incremental W8A8 int8 init", flush=True)
    else:
        qwen_params = init_qwen_params(
            jax.random.fold_in(key, 2), qwen_cfg, dtype=jnp.bfloat16
        )
        if args.llm_quant:
            from rag_inference_pipeline_tpu.models.qwen import (
                quantize_qwen_params,
            )

            qwen_params = quantize_qwen_params(qwen_params)
            print("llm weights quantized: W8A8-dynamic int8", flush=True)

    # device-generated corpus: normalized rows in 64k chunks (keyed)
    gch = 65536
    n_pad = ((n + gch - 1) // gch) * gch

    @functools.partial(jax.jit, donate_argnums=(1,))
    def gen_block(i, db, kk):
        x = jax.random.normal(
            jax.random.fold_in(kk, i), (gch, d), jnp.float32
        )
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return jax.lax.dynamic_update_slice(
            db, x.astype(jnp.bfloat16), (i * gch, 0)
        )

    db = jnp.zeros((n_pad, d), jnp.bfloat16)
    for i in range(n_pad // gch):
        db = gen_block(i, db, jax.random.fold_in(key, 3))
    db_i8, scale = quantize_global_int8(db[:262144].astype(jnp.float32))
    del db_i8

    @functools.partial(jax.jit, donate_argnums=(1,), static_argnames=())
    def quant_block(i, out, db_, sc):
        blk = jax.lax.dynamic_slice_in_dim(db_, i * gch, gch).astype(
            jnp.float32
        )
        q8 = jnp.clip(jnp.round(blk / sc), -127, 127).astype(jnp.int8)
        return jax.lax.dynamic_update_slice(out, q8, (i * gch, 0))

    db_i8 = jnp.zeros((n_pad, d), jnp.int8)
    for i in range(n_pad // gch):
        db_i8 = quant_block(i, db_i8, db, scale)
    doc_tokens = jax.random.randint(
        jax.random.fold_in(key, 4), (n_pad, args.doc_tok_len), 1,
        min(qwen_cfg.vocab_size, 30000), jnp.int32,
    )
    doc_mask = jnp.ones_like(doc_tokens)
    print("corpus + stores resident", flush=True)

    b = args.batch
    rng = np.random.default_rng(0)

    def variants():
        out = []
        for _ in range(args.reps):
            out.append(jnp.asarray(
                rng.integers(1, 20000, (args.stack, b, args.q_len)),
                jnp.int32,
            ))
        return out

    def body_for(speculative, p):
        def body(qt, bp, qp, db_, dbi, sc, toks, msk):
            ones = jnp.ones_like(qt)
            return _rag_step(
                bp, qp, db_, dbi, sc, toks, msk, qt, ones, qt, ones,
                mesh=ctx, bert_cfg=bert_cfg, qwen_cfg=qwen_cfg,
                k=args.k, ctx_docs=args.ctx_docs,
                max_new_tokens=args.tokens, use_fused=not interpret,
                ntotal=n, index_int8=True, rescore_k=64,
                tokens_sharded=False, speculative=speculative,
                spec_gamma=args.gamma, inject_accept_p=p,
            )

        return body

    extra = (bert_params, qwen_params, db, db_i8, scale, doc_tokens,
             doc_mask)
    results = {"config": {
        "n": n, "d": d, "batch": b, "tokens": args.tokens,
        "gamma": args.gamma, "backend": jax.default_backend(),
        "llm_quant": "int8" if args.llm_quant else "bf16",
        "llm_model": args.llm_model,
        "protocol": "in-program lax.scan (no host RTT; "
                    "PERF_NOTES 'Measurement reliability')",
    }, "rows": []}
    cases = [("greedy", False, None)] + [
        (f"spec_p{p}", True, float(p))
        for p in args.inject_ps.split(",") if p
    ]
    for name, spec, p in cases:
        ms = time_inprogram(
            body_for(spec, p), variants(), extra=extra, reps=args.reps
        )
        print(f"fused e2e {name}: {ms:.1f} ms/batch{b} "
              f"({ms / args.tokens:.2f} ms/tok)", flush=True)
        results["rows"].append({
            "case": name, "ms_inprogram": round(ms, 2),
            "ms_per_token": round(ms / args.tokens, 3),
        })
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
