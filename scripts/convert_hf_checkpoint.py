#!/usr/bin/env python
"""Convert a local HuggingFace checkpoint directory into the framework's
weights layout (`MODEL_WEIGHTS_DIR/<org__name>/*.safetensors` + tokenizer).

Works fully offline: point it at an already-downloaded HF snapshot (e.g.
~/.cache/huggingface/hub/models--Qwen--Qwen2.5-0.5B-Instruct/snapshots/...)
or any directory containing *.safetensors / pytorch_model.bin + tokenizer
files. Validation: the converted weights are loaded through the framework's
mappers and a forward pass runs (HF-parity of the mappers is covered by
tests/test_hf_parity.py).

Usage:
  python scripts/convert_hf_checkpoint.py SRC_DIR Qwen/Qwen2.5-0.5B-Instruct \
      --weights-dir artifacts/weights --arch qwen
"""

from __future__ import annotations

try:  # repo-root import without pip install; scripts/ is sys.path[0]
    # only when run as a script — harmless to skip when imported as a
    # module by tests (the package is importable there already)
    import _pathfix  # noqa: F401
except ImportError:
    pass

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rag_inference_pipeline_tpu.core.bootstrap import bootstrap  # noqa: E402

bootstrap()

TOKENIZER_FILES = (
    "tokenizer.json",
    "tokenizer_config.json",
    "special_tokens_map.json",
    "vocab.txt",
    "sentencepiece.bpe.model",
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("src", help="local HF snapshot directory")
    p.add_argument("model_name", help="canonical name, e.g. BAAI/bge-base-en-v1.5")
    p.add_argument("--weights-dir", default="artifacts/weights")
    p.add_argument(
        "--arch", choices=["bert", "qwen", "llama"], required=True,
        help="which mapper validates the converted weights",
    )
    args = p.parse_args()

    dst = os.path.join(args.weights_dir, args.model_name.replace("/", "__"))
    os.makedirs(dst, exist_ok=True)

    copied = 0
    for f in os.listdir(args.src):
        if f.endswith(".safetensors") or f in TOKENIZER_FILES:
            shutil.copy(os.path.join(args.src, f), os.path.join(dst, f))
            copied += 1
    if not any(f.endswith(".safetensors") for f in os.listdir(dst)):
        # torch .bin fallback: re-serialize to safetensors
        bins = [f for f in os.listdir(args.src) if f.endswith(".bin")]
        if not bins:
            sys.exit(f"no safetensors or .bin weights in {args.src}")
        import torch
        from safetensors.torch import save_file

        state = {}
        for b in bins:
            state.update(torch.load(os.path.join(args.src, b), map_location="cpu"))
        state = {k: v.clone().contiguous() for k, v in state.items()}
        save_file(state, os.path.join(dst, "model.safetensors"))
        copied += 1
    print(f"copied {copied} files -> {dst}")

    # validation: load through the framework mappers + one forward pass
    import jax.numpy as jnp
    import numpy as np

    from rag_inference_pipeline_tpu.models.weights import load_safetensors_dict

    raw = load_safetensors_dict(dst)
    if args.arch in ("qwen", "llama"):
        from rag_inference_pipeline_tpu.models.qwen import (
            QwenConfig,
            qwen_forward,
        )
        from rag_inference_pipeline_tpu.models.weights import qwen_params_from_hf

        # llama checkpoints load through the same mapper (same decoder
        # family; no qkv bias, llama3 rope scaling live in the config)
        cfg = {
            "meta-llama/Llama-3.2-1B-Instruct": QwenConfig.llama32_1b,
            "meta-llama/Llama-3.2-1B": QwenConfig.llama32_1b,
            "meta-llama/Llama-3.1-8B-Instruct": QwenConfig.llama31_8b,
            "meta-llama/Llama-3.1-8B": QwenConfig.llama31_8b,
        }.get(args.model_name, QwenConfig.qwen25_05b)()
        params = qwen_params_from_hf(raw, cfg, dtype=jnp.bfloat16)
        ids = jnp.asarray(np.arange(1, 9)[None], jnp.int32)
        logits = qwen_forward(params, cfg, ids, jnp.ones_like(ids))
        print(f"validated {args.arch} forward: logits {logits.shape}")
    else:
        from rag_inference_pipeline_tpu.models.bert import BertConfig, bert_embed
        from rag_inference_pipeline_tpu.models.weights import bert_params_from_hf

        name = args.model_name
        cfg = {
            "BAAI/bge-base-en-v1.5": BertConfig.bge_base,
            "BAAI/bge-reranker-base": BertConfig.bge_reranker,
            "nlptown/bert-base-multilingual-uncased-sentiment": BertConfig.sentiment,
            "unitary/toxic-bert": BertConfig.toxicity,
        }.get(name, BertConfig.bge_base)()
        params = bert_params_from_hf(raw, cfg, dtype=jnp.bfloat16)
        ids = jnp.asarray(np.arange(1, 9)[None], jnp.int32)
        emb = bert_embed(params, cfg, ids, jnp.ones_like(ids))
        print(f"validated bert forward: embedding {emb.shape}")
    print(
        f"\nUse with: MODEL_WEIGHTS_DIR={os.path.abspath(args.weights_dir)}"
    )


if __name__ == "__main__":
    main()
