#!/usr/bin/env python
"""End-to-end RAG device-latency benchmark at REAL model shapes.

Measures the full hot path per batch on one chip — embed (BGE-base) ->
int8 ANN over 1M x 768 -> cross-encoder rerank (BGE-reranker shapes) ->
greedy decode (Qwen2.5-0.5B shapes, KV cache) — with random bf16 weights
(identical compute to real checkpoints). Reports per-stage and E2E p50,
comparable to BASELINE.md's reference numbers (p50 1470 ms at batch 4 on
3 Xeon nodes) and the <100 ms north-star target.

Protocol per PERF_NOTES.md: pipelined submissions, varied inputs.
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
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rag_inference_pipeline_tpu.core.bootstrap import bootstrap  # noqa: E402

bootstrap()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--corpus", type=int, default=1_000_000)
    p.add_argument("--new-tokens", type=int, default=128)
    p.add_argument("--query-len", type=int, default=32)
    p.add_argument("--prompt-len", type=int, default=512)
    p.add_argument("--rerank-len", type=int, default=256)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--spec-gamma", type=int, default=8)
    p.add_argument(
        "--inject-p", type=float, default=None,
        help="acceptance-injection rate for an e2e_spec variant: E2E with "
        "the decode stage running speculative verify windows at synthetic "
        "acceptance p (the <100 ms north-star measurement without real "
        "weights; see bench_spec_accept.py)",
    )
    p.add_argument(
        "--llm-quant", action="store_true",
        help="int8 matmul weights for the decoder (W8A8-dynamic, "
        "models/qwen.py::quantize_qwen_params) — halves the per-step HBM "
        "weight stream that walls B=1 decode",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from rag_inference_pipeline_tpu.models.bert import (
        BertConfig, bert_classify, bert_embed, init_bert_params,
    )
    from rag_inference_pipeline_tpu.models.qwen import (
        QwenConfig, greedy_generate, init_qwen_params,
        ngram_speculative_generate,
    )
    from rag_inference_pipeline_tpu.ops import fused_topk_int8gs, quantize_global_int8

    b = args.batch
    print(f"setup: corpus {args.corpus}x768 int8, batch {b}", file=sys.stderr)
    db = jax.random.normal(jax.random.key(0), (args.corpus, 768), jnp.bfloat16)
    db_i8, gscale = quantize_global_int8(db.astype(jnp.float32))
    del db
    # chunk-align so the jitted search never pays a whole-array pad copy
    n_true = db_i8.shape[0]
    n_pad = -(-n_true // 4096) * 4096
    if n_pad != n_true:
        db_i8 = jnp.pad(db_i8, ((0, n_pad - n_true), (0, 0)))

    emb_cfg = BertConfig.bge_base()
    emb_params = jax.device_put(
        init_bert_params(jax.random.key(1), emb_cfg, jnp.bfloat16)
    )
    rr_cfg = BertConfig.bge_reranker()
    rr_params = jax.device_put(
        init_bert_params(jax.random.key(2), rr_cfg, jnp.bfloat16)
    )
    lm_cfg = QwenConfig.qwen25_05b()
    lm_params = init_qwen_params(jax.random.key(3), lm_cfg, jnp.bfloat16)
    if args.llm_quant:
        from rag_inference_pipeline_tpu.models.qwen import quantize_qwen_params

        lm_params = quantize_qwen_params(lm_params)
        print("llm weights quantized: W8A8-dynamic int8", file=sys.stderr)
    lm_params = jax.device_put(lm_params)
    jax.block_until_ready((db_i8, gscale))

    embed_fn = jax.jit(partial(bert_embed, cfg=emb_cfg))
    rerank_fn = jax.jit(partial(bert_classify, cfg=rr_cfg))
    gen_fn = jax.jit(
        partial(
            greedy_generate, cfg=lm_cfg, max_new_tokens=args.new_tokens,
            eos_token_id=-1, cache_len=args.prompt_len + args.new_tokens,
        )
    )
    spec_fn = jax.jit(
        partial(
            ngram_speculative_generate, cfg=lm_cfg,
            max_new_tokens=args.new_tokens, gamma=args.spec_gamma,
            eos_token_id=-1, cache_len=args.prompt_len + args.new_tokens,
            inject_accept_p=args.inject_p,
        )
    )

    rng = np.random.default_rng(0)

    def make_inputs(seed):
        r = np.random.default_rng(seed)
        return {
            "q_ids": jnp.asarray(r.integers(1, 30000, (b, args.query_len)), jnp.int32),
            "rr_ids": jnp.asarray(
                r.integers(1, 250000, (b * args.k, args.rerank_len)), jnp.int32
            ),
            "lm_ids": jnp.asarray(
                r.integers(1, 150000, (b, args.prompt_len)), jnp.int32
            ),
        }

    ones_q = jnp.ones((b, args.query_len), jnp.int32)
    ones_rr = jnp.ones((b * args.k, args.rerank_len), jnp.int32)
    ones_lm = jnp.ones((b, args.prompt_len), jnp.int32)

    def pipeline(inp):
        emb = embed_fn(emb_params, input_ids=inp["q_ids"], attn_mask=ones_q)
        s, ids = fused_topk_int8gs(emb, db_i8, gscale, args.k, nbins=1024, chunk=4096, ntotal=n_true)
        logits = rerank_fn(rr_params, input_ids=inp["rr_ids"], attn_mask=ones_rr)
        toks = gen_fn(lm_params, input_ids=inp["lm_ids"], attn_mask=ones_lm)
        return s, ids, logits, toks

    # stage-by-stage timing (pipelined within each stage)
    stages = {
        "embed": lambda inp: embed_fn(emb_params, input_ids=inp["q_ids"], attn_mask=ones_q),
        "search": lambda inp: fused_topk_int8gs(
            embed_fn(emb_params, input_ids=inp["q_ids"], attn_mask=ones_q),
            db_i8, gscale, args.k, nbins=1024, chunk=4096, ntotal=n_true,
        ),
        "rerank": lambda inp: rerank_fn(rr_params, input_ids=inp["rr_ids"], attn_mask=ones_rr),
        "generate": lambda inp: gen_fn(lm_params, input_ids=inp["lm_ids"], attn_mask=ones_lm),
        # n-gram speculative decode: acceptance on this random-weight
        # workload comes from the repeat-last fallback, so treat its gain
        # as workload-dependent; mean tokens/call printed alongside
        "generate_spec": lambda inp: spec_fn(
            lm_params, input_ids=inp["lm_ids"], attn_mask=ones_lm
        ),
        "e2e": pipeline,
    }
    if args.inject_p is not None:
        def pipeline_spec(inp):
            emb = embed_fn(emb_params, input_ids=inp["q_ids"], attn_mask=ones_q)
            s, ids = fused_topk_int8gs(
                emb, db_i8, gscale, args.k, nbins=1024, chunk=4096,
                ntotal=n_true,
            )
            logits = rerank_fn(rr_params, input_ids=inp["rr_ids"], attn_mask=ones_rr)
            toks, kbar = spec_fn(
                lm_params, input_ids=inp["lm_ids"], attn_mask=ones_lm
            )
            return s, ids, logits, toks, kbar

        stages["e2e_spec"] = pipeline_spec
    # full-fetch protocol: np.asarray every output (block_until_ready alone
    # does not guarantee execution through the axon tunnel — PERF_NOTES.md);
    # numbers therefore INCLUDE one host round-trip and are upper bounds.
    def fetch(out):
        return jax.tree.map(lambda x: np.asarray(x), out)

    inputs = [make_inputs(100 + i) for i in range(args.iters)]
    results = {}
    for name, fn in stages.items():
        fetch(fn(inputs[-1]))  # warm
        ts = []
        for i in range(args.iters):
            t0 = time.time()
            fetch(fn(inputs[i]))
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        results[name] = round(med * 1e3, 2)
        print(f"{name}: {med * 1e3:.1f} ms/batch{b} (incl. RTT)", file=sys.stderr)

    e2e = results["e2e"]
    print(
        json.dumps(
            {
                "metric": (
                    f"E2E RAG device latency per batch of {b} "
                    f"(embed+ANN@{args.corpus}+rerank+{args.new_tokens}tok decode)"
                ),
                "value": e2e,
                "unit": "ms",
                "vs_baseline": round(1470.41 / e2e, 2),  # BASELINE.md p50
                "detail": {
                    **results, "batch": b,
                    "llm_quant": "int8" if args.llm_quant else "bf16",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
