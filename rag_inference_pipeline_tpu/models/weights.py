"""HF safetensors -> param-pytree loading (host-side), with random-init
fallback for air-gapped environments.

The reference pulls weights from the HF hub cache at component load()
(reference llm.py:102-136, embedding.py:70-98). Here weights come from local
safetensors checkpoints (`model_weights_dir`); when absent and
`allow_random_weights` is set, models initialize randomly so the full
pipeline stays runnable offline (shapes/compute identical, outputs
meaningless — flagged in /health).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_PREFIXES = ("bert.", "roberta.", "model.", "transformer.", "")


def _find_safetensors(model_dir: str) -> list[str]:
    files = sorted(
        os.path.join(model_dir, f)
        for f in os.listdir(model_dir)
        if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors under {model_dir}")
    return files


def load_safetensors_dict(model_dir: str) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    out: dict[str, np.ndarray] = {}
    for path in _find_safetensors(model_dir):
        with safe_open(path, framework="np") as f:
            for key in f.keys():
                out[key] = f.get_tensor(key)
    return out


def resolve_model_dir(weights_dir: Optional[str], model_name: str) -> Optional[str]:
    """Look for `<weights_dir>/<model_name with / -> __>/*.safetensors`."""
    if not weights_dir:
        return None
    cand = os.path.join(weights_dir, model_name.replace("/", "__"))
    if os.path.isdir(cand):
        return cand
    return None


class _T:
    """Key lookup with prefix stripping + torch->jax transpose for matmuls."""

    def __init__(self, raw: dict[str, np.ndarray], dtype):
        self.raw = raw
        self.dtype = dtype

    def get(self, name: str, transpose: bool = False) -> jnp.ndarray:
        for p in _PREFIXES:
            k = p + name
            if k in self.raw:
                t = self.raw[k]
                if transpose:
                    t = t.T
                return jnp.asarray(np.ascontiguousarray(t), self.dtype)
        raise KeyError(
            f"weight {name!r} not found (tried prefixes {_PREFIXES}); "
            f"sample keys: {list(self.raw)[:5]}"
        )

    def has(self, name: str) -> bool:
        return any(p + name in self.raw for p in _PREFIXES)


def bert_params_from_hf(
    raw: dict[str, np.ndarray], cfg, dtype=jnp.float32
) -> dict:
    """Map HF BERT/RoBERTa checkpoint names to our bert.py param tree."""
    t = _T(raw, dtype)
    params = {
        "embeddings": {
            "word": t.get("embeddings.word_embeddings.weight"),
            "position": t.get("embeddings.position_embeddings.weight"),
            "token_type": (
                t.get("embeddings.token_type_embeddings.weight")
                if t.has("embeddings.token_type_embeddings.weight")
                else jnp.zeros((cfg.type_vocab, cfg.hidden), dtype)
            ),
            "ln_w": t.get("embeddings.LayerNorm.weight"),
            "ln_b": t.get("embeddings.LayerNorm.bias"),
        },
        "layers": [],
    }
    for i in range(cfg.layers):
        pre = f"encoder.layer.{i}."
        params["layers"].append(
            {
                "q_w": t.get(pre + "attention.self.query.weight", transpose=True),
                "q_b": t.get(pre + "attention.self.query.bias"),
                "k_w": t.get(pre + "attention.self.key.weight", transpose=True),
                "k_b": t.get(pre + "attention.self.key.bias"),
                "v_w": t.get(pre + "attention.self.value.weight", transpose=True),
                "v_b": t.get(pre + "attention.self.value.bias"),
                "o_w": t.get(pre + "attention.output.dense.weight", transpose=True),
                "o_b": t.get(pre + "attention.output.dense.bias"),
                "attn_ln_w": t.get(pre + "attention.output.LayerNorm.weight"),
                "attn_ln_b": t.get(pre + "attention.output.LayerNorm.bias"),
                "ffn_in_w": t.get(pre + "intermediate.dense.weight", transpose=True),
                "ffn_in_b": t.get(pre + "intermediate.dense.bias"),
                "ffn_out_w": t.get(pre + "output.dense.weight", transpose=True),
                "ffn_out_b": t.get(pre + "output.dense.bias"),
                "ffn_ln_w": t.get(pre + "output.LayerNorm.weight"),
                "ffn_ln_b": t.get(pre + "output.LayerNorm.bias"),
            }
        )
    if t.has("pooler.dense.weight"):
        params["pooler"] = {
            "w": t.get("pooler.dense.weight", transpose=True),
            "b": t.get("pooler.dense.bias"),
        }
    else:
        params["pooler"] = {
            "w": jnp.eye(cfg.hidden, dtype=dtype),
            "b": jnp.zeros((cfg.hidden,), dtype),
        }
    if cfg.num_labels:
        if t.has("classifier.weight"):
            params["classifier"] = {
                "w": t.get("classifier.weight", transpose=True),
                "b": t.get("classifier.bias"),
            }
        elif t.has("classifier.out_proj.weight"):  # roberta head
            params["classifier"] = {
                "w": t.get("classifier.out_proj.weight", transpose=True),
                "b": t.get("classifier.out_proj.bias"),
            }
            params["pooler"] = {
                "w": t.get("classifier.dense.weight", transpose=True),
                "b": t.get("classifier.dense.bias"),
            }
        else:
            raise KeyError("no classifier head found in checkpoint")
    return params


def qwen_params_from_hf(
    raw: dict[str, np.ndarray], cfg, dtype=jnp.bfloat16, quantize=False
) -> dict:
    """HF state_dict -> decoder param tree (Qwen2.5 and Llama-3.x share
    the layout: same module names; llama simply has no qkv biases).

    quantize=True quantizes each matmul leaf to W8A8 int8 AS IT LOADS —
    the full bf16 tree never exists on device, which is what lets an 8B
    checkpoint (16 GB bf16) load onto a single 16 GB chip. Equivalent to
    quantize_qwen_params(qwen_params_from_hf(...)) leaf-for-leaf."""
    from .layers import quantize_embed, quantize_linear

    t = _T(raw, dtype)

    def w(name):
        x = t.get(name, transpose=True)
        return quantize_linear(x) if quantize else x

    params = {
        "embed": (
            quantize_embed(t.get("embed_tokens.weight"))
            if quantize
            else t.get("embed_tokens.weight")
        ),
        "final_ln": t.get("norm.weight"),
        "layers": [],
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = w("lm_head.weight")
    for i in range(cfg.layers):
        pre = f"layers.{i}."
        lp = {
            "in_ln": t.get(pre + "input_layernorm.weight"),
            "q_w": w(pre + "self_attn.q_proj.weight"),
            "k_w": w(pre + "self_attn.k_proj.weight"),
            "v_w": w(pre + "self_attn.v_proj.weight"),
            "o_w": w(pre + "self_attn.o_proj.weight"),
            "post_ln": t.get(pre + "post_attention_layernorm.weight"),
            "gate_w": w(pre + "mlp.gate_proj.weight"),
            "up_w": w(pre + "mlp.up_proj.weight"),
            "down_w": w(pre + "mlp.down_proj.weight"),
        }
        if cfg.qkv_bias:
            lp["q_b"] = t.get(pre + "self_attn.q_proj.bias")
            lp["k_b"] = t.get(pre + "self_attn.k_proj.bias")
            lp["v_b"] = t.get(pre + "self_attn.v_proj.bias")
        params["layers"].append(lp)
    return params
