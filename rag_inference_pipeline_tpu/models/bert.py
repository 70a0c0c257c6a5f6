"""BERT-family encoder in pure JAX: backbone for the BGE embedder
(reference components/embedding.py — sentence-transformers BAAI/bge-base),
the BGE cross-encoder reranker (reference components/reranker.py, note
bge-reranker-base is XLM-RoBERTa-based), and the BERT classifiers
(reference components/sentiment.py, toxicity.py).

One config covers BERT and RoBERTa variants (position-id offset, optional
token types). Heads: CLS-pool + L2-normalize (embedder), dense+tanh pooler +
classifier (classification / cross-encoding).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from .layers import (
    dense,
    encoder_attention,
    gelu,
    layer_norm,
    quantize_linear,
)


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 512
    type_vocab: int = 2
    eps: float = 1e-12
    # RoBERTa-style: positions start at pad_token_id + 1 and skip padding
    roberta_positions: bool = False
    pad_token_id: int = 0
    num_labels: int = 0  # 0 = no classification head

    @staticmethod
    def bge_base() -> "BertConfig":
        """BAAI/bge-base-en-v1.5 (BERT-base)."""
        return BertConfig()

    @staticmethod
    def bge_reranker() -> "BertConfig":
        """BAAI/bge-reranker-base (XLM-RoBERTa-base, 1 logit)."""
        return BertConfig(
            vocab_size=250002,
            max_positions=514,
            type_vocab=1,
            eps=1e-5,
            roberta_positions=True,
            pad_token_id=1,
            num_labels=1,
        )

    @staticmethod
    def sentiment() -> "BertConfig":
        """nlptown/bert-base-multilingual-uncased-sentiment (5 stars)."""
        return BertConfig(vocab_size=105879, num_labels=5)

    @staticmethod
    def toxicity() -> "BertConfig":
        """unitary/toxic-bert (6 multi-label heads)."""
        return BertConfig(num_labels=6)

    @staticmethod
    def tiny(num_labels: int = 0) -> "BertConfig":
        """For tests: 2 layers, 64 hidden."""
        return BertConfig(
            vocab_size=1024,
            hidden=64,
            layers=2,
            heads=4,
            intermediate=128,
            max_positions=128,
            num_labels=num_labels,
        )


def init_bert_params(
    key: jax.Array, cfg: BertConfig, dtype=jnp.float32
) -> dict:
    """Random init with HF-compatible parameter tree layout."""
    k = jax.random.split(key, 8 + cfg.layers)
    std = 0.02

    def w(ki, *shape):
        return (std * jax.random.normal(ki, shape)).astype(dtype)

    params = {
        "embeddings": {
            "word": w(k[0], cfg.vocab_size, cfg.hidden),
            "position": w(k[1], cfg.max_positions, cfg.hidden),
            "token_type": w(k[2], cfg.type_vocab, cfg.hidden),
            "ln_w": jnp.ones((cfg.hidden,), dtype),
            "ln_b": jnp.zeros((cfg.hidden,), dtype),
        },
        "layers": [],
        "pooler": {
            "w": w(k[3], cfg.hidden, cfg.hidden),
            "b": jnp.zeros((cfg.hidden,), dtype),
        },
    }
    for li in range(cfg.layers):
        kk = jax.random.split(k[8 + li], 8)
        h, i_ = cfg.hidden, cfg.intermediate
        params["layers"].append(
            {
                "q_w": w(kk[0], h, h), "q_b": jnp.zeros((h,), dtype),
                "k_w": w(kk[1], h, h), "k_b": jnp.zeros((h,), dtype),
                "v_w": w(kk[2], h, h), "v_b": jnp.zeros((h,), dtype),
                "o_w": w(kk[3], h, h), "o_b": jnp.zeros((h,), dtype),
                "attn_ln_w": jnp.ones((h,), dtype),
                "attn_ln_b": jnp.zeros((h,), dtype),
                "ffn_in_w": w(kk[4], h, i_), "ffn_in_b": jnp.zeros((i_,), dtype),
                "ffn_out_w": w(kk[5], i_, h), "ffn_out_b": jnp.zeros((h,), dtype),
                "ffn_ln_w": jnp.ones((h,), dtype),
                "ffn_ln_b": jnp.zeros((h,), dtype),
            }
        )
    if cfg.num_labels:
        params["classifier"] = {
            "w": w(k[4], cfg.hidden, cfg.num_labels),
            "b": jnp.zeros((cfg.num_labels,), dtype),
        }
    return params


_QUANT_KEYS = ("q_w", "k_w", "v_w", "o_w", "ffn_in_w", "ffn_out_w")


def quantize_bert_params(params: dict) -> dict:
    """int8-quantize every encoder matmul weight (W8A8-dynamic).

    Unlike B=1 decode (weight-stream-bound), the encoder at serving shapes
    (B>=8, T=512) is MXU-compute-bound — int8 wins because the v5e MXU runs
    s8 x s8 -> s32 at 2x the bf16 rate, the same arithmetic the index scan
    kernels exploit. QKV/output/FFN projections, the pooler, and the
    classifier head become QuantizedLinear; the embedding tables stay as-is
    (lookup gathers, not matmuls — and the position/type adds need f32
    adds anyway). LayerNorms and biases untouched. Settings knob:
    encoder_weight_quant="int8" (core/config.py) — applies to all four
    BERT-family components (embedder/reranker/sentiment/toxicity; the
    reference serves these as fp32 torch models, components/embedding.py,
    reranker.py, sentiment.py, toxicity.py)."""
    out = {
        "embeddings": params["embeddings"],
        "layers": [],
        "pooler": {
            "w": quantize_linear(params["pooler"]["w"]),
            "b": params["pooler"]["b"],
        },
    }
    if "classifier" in params:
        out["classifier"] = {
            "w": quantize_linear(params["classifier"]["w"]),
            "b": params["classifier"]["b"],
        }
    for lp in params["layers"]:
        nl = dict(lp)
        for k in _QUANT_KEYS:
            nl[k] = quantize_linear(lp[k])
        out["layers"].append(nl)
    return out


def bert_encode(
    params: dict,
    cfg: BertConfig,
    input_ids: jax.Array,  # [B, T] i32
    attn_mask: jax.Array,  # [B, T] {0,1}
    token_type_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Backbone forward -> [B, T, H] hidden states (post-LN BERT)."""
    b, t = input_ids.shape
    emb = params["embeddings"]
    if cfg.roberta_positions:
        # RoBERTa: cumulative positions over non-pad tokens, offset by pad+1
        pos = jnp.cumsum(attn_mask, axis=1) * attn_mask + cfg.pad_token_id
    else:
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
    tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
    x = (
        jnp.take(emb["word"], input_ids, axis=0)
        + jnp.take(emb["position"], pos.astype(jnp.int32), axis=0)
        + jnp.take(emb["token_type"], tt, axis=0)
    )
    x = layer_norm(x, emb["ln_w"], emb["ln_b"], cfg.eps)
    dh = cfg.hidden // cfg.heads

    for lp in params["layers"]:
        q = dense(x, lp["q_w"], lp["q_b"]).reshape(b, t, cfg.heads, dh)
        k_ = dense(x, lp["k_w"], lp["k_b"]).reshape(b, t, cfg.heads, dh)
        v = dense(x, lp["v_w"], lp["v_b"]).reshape(b, t, cfg.heads, dh)
        a = encoder_attention(q, k_, v, attn_mask).reshape(b, t, cfg.hidden)
        x = layer_norm(
            x + dense(a, lp["o_w"], lp["o_b"]), lp["attn_ln_w"],
            lp["attn_ln_b"], cfg.eps,
        )
        h = gelu(dense(x, lp["ffn_in_w"], lp["ffn_in_b"]))
        x = layer_norm(
            x + dense(h, lp["ffn_out_w"], lp["ffn_out_b"]), lp["ffn_ln_w"],
            lp["ffn_ln_b"], cfg.eps,
        )
    return x


def bert_embed(
    params: dict, cfg: BertConfig, input_ids, attn_mask
) -> jax.Array:
    """Sentence embedding: CLS token + L2 normalize — BGE pooling semantics
    (reference embedding.py:101-175 returns normalized float32)."""
    h = bert_encode(params, cfg, input_ids, attn_mask)
    cls = h[:, 0, :].astype(jnp.float32)
    return cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-9)


def bert_classify(
    params: dict, cfg: BertConfig, input_ids, attn_mask,
    token_type_ids=None, *, use_pooler: bool = True,
) -> jax.Array:
    """Sequence classification logits [B, num_labels].

    use_pooler=True: BERT path (dense+tanh on CLS then classifier).
    use_pooler=False: RoBERTa-style head operating directly on CLS (the
    cross-encoder reranker path).
    """
    h = bert_encode(params, cfg, input_ids, attn_mask, token_type_ids)
    cls = h[:, 0, :]
    if use_pooler:
        cls = jnp.tanh(dense(cls, params["pooler"]["w"], params["pooler"]["b"]))
    return dense(
        cls, params["classifier"]["w"], params["classifier"]["b"]
    ).astype(jnp.float32)
