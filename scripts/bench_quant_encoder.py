#!/usr/bin/env python
"""int8 weight-quantized encoder benchmark (encoder_weight_quant="int8").

The encoder at serving shapes (B>=8, T=512) is the compute-bound regime:
BGE-base at B=32/T=512 is ~4.3 TFLOP per batch, measured 41 ms bf16 on the
v5e (PERF_NOTES "flash attention"), i.e. ~50% MXU-bound. The v5e MXU runs
s8xs8->s32 at 2x the bf16 rate, so IF XLA lowers the quantized dense's
dot_general to the native int8 MXU pass, the dense share halves. That
lowering is the open question this bench answers — the B=1 decode win
(2.9x, bench_quant_decode.py) was pure bandwidth and proves nothing about
the compute path.

Protocol: in-program lax.scan over pre-stacked varied inputs (CLAUDE.md
"Measurement reliability": never reuse a timed input; params as jit args,
never closed over — tunnel hazard). bf16 and int8 run in the same process;
the relative number is the trustworthy one.

Reference being replaced: components/embedding.py:101-175 and
reranker.py:206-308 (fp32 torch, no quantization upstream).

Writes artifacts/round3/quant_encoder.json.
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
    ap.add_argument("--iters", type=int, default=8, help="scan trip count")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 32])
    args = ap.parse_args()

    if args.smoke:
        os.environ.setdefault("DEVICE_PLATFORM", "cpu")
    from rag_inference_pipeline_tpu.core.bootstrap import bootstrap

    bootstrap()
    import jax
    import jax.numpy as jnp
    from functools import partial

    from rag_inference_pipeline_tpu.models.bert import (
        BertConfig,
        bert_classify,
        bert_embed,
        init_bert_params,
        quantize_bert_params,
    )

    if args.smoke:
        cfg_e = BertConfig.tiny()
        cfg_r = BertConfig.tiny(num_labels=1)
        dtype = jnp.float32
        t = 32
        iters = 2
    else:
        cfg_e = BertConfig.bge_base()
        cfg_r = BertConfig.bge_reranker()
        dtype = jnp.bfloat16
        t = args.seq_len
        iters = args.iters

    params_e = init_bert_params(jax.random.key(0), cfg_e, dtype)
    qparams_e = quantize_bert_params(params_e)
    params_r = init_bert_params(jax.random.key(1), cfg_r, dtype)
    qparams_r = quantize_bert_params(params_r)
    dev = jax.devices()[0]
    print(f"device={dev.platform} T={t} iters={iters}")

    @partial(jax.jit, static_argnames=("kind",))
    def loop(p, ids_stack, mask, kind):
        """Scan the forward over pre-varied inputs; reduce to one scalar so
        nothing per-iteration survives to dedup or fetch."""

        def step(acc, ids):
            if kind == "embed":
                out = bert_embed(p, cfg_e, ids, mask)
            else:
                out = bert_classify(
                    p, cfg_r, ids, mask, use_pooler=True
                )
            return acc + out.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(step, jnp.float32(0), ids_stack)
        return acc

    rng = np.random.default_rng(0)
    out: dict = {
        "device": dev.platform, "T": t, "iters": iters, "configs": {},
    }

    for name, pe, pr in (
        ("bf16", params_e, params_r), ("int8", qparams_e, qparams_r)
    ):
        row: dict = {}
        for b in args.batches:
            for kind, p, vocab in (
                ("embed", pe, cfg_e.vocab_size),
                ("rerank", pr, cfg_r.vocab_size),
            ):
                ids = jnp.asarray(
                    rng.integers(2, vocab - 1, (iters, b, t)), jnp.int32
                )
                mask = jnp.ones((b, t), jnp.int32)
                float(loop(p, ids, mask, kind))  # compile + warm
                t0 = time.perf_counter()
                for r in range(args.reps):
                    ids_r = jnp.asarray(
                        rng.integers(2, vocab - 1, (iters, b, t)), jnp.int32
                    )
                    float(loop(p, ids_r, mask, kind))
                ms = (time.perf_counter() - t0) / (args.reps * iters) * 1e3
                row[f"{kind}_ms_b{b}"] = ms
        out["configs"][name] = row
        print(name, json.dumps(row, indent=2))

    bf, q8 = out["configs"]["bf16"], out["configs"]["int8"]
    out["speedups"] = {k: bf[k] / q8[k] for k in bf}
    for k, v in out["speedups"].items():
        print(f"int8 speedup {k}: {bf[k]:.2f} -> {q8[k]:.2f} ms ({v:.2f}x)")

    os.makedirs("artifacts/round3", exist_ok=True)
    with open("artifacts/round3/quant_encoder.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts/round3/quant_encoder.json")


if __name__ == "__main__":
    main()
