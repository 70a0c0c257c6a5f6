"""Qwen2-style causal LM in pure JAX with a static-shape KV cache.

Replaces the reference's torch LLMGenerator (reference components/llm.py —
Qwen/Qwen2.5-0.5B-Instruct, greedy decode, max_new_tokens=128, KV cache on,
left-pad batching). Architecture: RMSNorm pre-norm, RoPE, GQA, SwiGLU,
optional QKV bias, tied embeddings.

Decode design (SURVEY.md section 7.4 item 3): `prefill` consumes a padded
prompt bucket and fills the cache; `decode_step` advances every sequence one
token; generation is a `lax.scan` over steps — no dynamic shapes anywhere,
so the engine's continuous batching can swap sequences in and out of lanes
between scans without recompiling.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .layers import (
    KVCache,
    QuantizedEmbed,
    QuantizedLinear,
    apply_rope,
    attention,
    dense,
    quantize_act_rows,
    quantize_embed,
    quantize_linear,
    rms_norm,
    rope_frequencies,
)


@dataclass(frozen=True)
class QwenConfig:
    vocab_size: int = 151936
    hidden: int = 896
    layers: int = 24
    heads: int = 14
    kv_heads: int = 2
    head_dim: int = 64
    intermediate: int = 4864
    rope_theta: float = 1e6
    eps: float = 1e-6
    qkv_bias: bool = True
    tie_embeddings: bool = True
    max_len: int = 4096
    # Llama-3.x rope remap: (factor, low_freq_factor, high_freq_factor,
    # original_max_len) or None (see layers.rope_frequencies)
    rope_scaling: Optional[tuple] = None

    @staticmethod
    def qwen25_05b() -> "QwenConfig":
        """Qwen/Qwen2.5-0.5B-Instruct."""
        return QwenConfig()

    @staticmethod
    def llama32_1b() -> "QwenConfig":
        """meta-llama/Llama-3.2-1B-Instruct — same decoder family
        (HF Qwen2 *is* the Llama block + qkv bias): GQA, SiLU MLP,
        RMSNorm, tied embeddings; no qkv bias, llama3 rope scaling."""
        return QwenConfig(
            vocab_size=128256,
            hidden=2048,
            layers=16,
            heads=32,
            kv_heads=8,
            head_dim=64,
            intermediate=8192,
            rope_theta=500000.0,
            eps=1e-5,
            qkv_bias=False,
            tie_embeddings=True,
            max_len=4096,
            rope_scaling=(32.0, 1.0, 4.0, 8192),
        )

    @staticmethod
    def llama31_8b() -> "QwenConfig":
        """meta-llama/Llama-3.1-8B-Instruct. bf16 params ~= 16 GB — on a
        single v5e serve it int8-quantized (llm_weight_quant=int8) or
        TP>=2."""
        return QwenConfig(
            vocab_size=128256,
            hidden=4096,
            layers=32,
            heads=32,
            kv_heads=8,
            head_dim=128,
            intermediate=14336,
            rope_theta=500000.0,
            eps=1e-5,
            qkv_bias=False,
            tie_embeddings=False,
            max_len=4096,
            rope_scaling=(8.0, 1.0, 4.0, 8192),
        )

    @staticmethod
    def tiny() -> "QwenConfig":
        return QwenConfig(
            vocab_size=512,
            hidden=64,
            layers=2,
            heads=4,
            kv_heads=2,
            head_dim=16,
            intermediate=128,
            max_len=256,
        )


def init_qwen_params(key: jax.Array, cfg: QwenConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 3 + cfg.layers)
    std = 0.02

    def w(ki, *shape):
        return (std * jax.random.normal(ki, shape)).astype(dtype)

    h = cfg.hidden
    qd = cfg.heads * cfg.head_dim
    kvd = cfg.kv_heads * cfg.head_dim
    params = {
        "embed": w(ks[0], cfg.vocab_size, h),
        "final_ln": jnp.ones((h,), dtype),
        "layers": [],
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = w(ks[1], h, cfg.vocab_size)
    for li in range(cfg.layers):
        kk = jax.random.split(ks[3 + li], 8)
        lp = {
            "in_ln": jnp.ones((h,), dtype),
            "q_w": w(kk[0], h, qd),
            "k_w": w(kk[1], h, kvd),
            "v_w": w(kk[2], h, kvd),
            "o_w": w(kk[3], qd, h),
            "post_ln": jnp.ones((h,), dtype),
            "gate_w": w(kk[4], h, cfg.intermediate),
            "up_w": w(kk[5], h, cfg.intermediate),
            "down_w": w(kk[6], cfg.intermediate, h),
        }
        if cfg.qkv_bias:
            lp["q_b"] = jnp.zeros((qd,), dtype)
            lp["k_b"] = jnp.zeros((kvd,), dtype)
            lp["v_b"] = jnp.zeros((kvd,), dtype)
        params["layers"].append(lp)
    return params


def init_qwen_params_int8(
    key: jax.Array, cfg: QwenConfig, dtype=jnp.bfloat16
) -> dict:
    """Random-init straight into the W8A8 layout, one leaf at a time.

    Bitwise-identical to ``quantize_qwen_params(init_qwen_params(key,
    cfg, dtype))`` (same key tree, same per-leaf values) but the full
    bf16 tree never exists on device — each leaf is created, quantized,
    and freed before the next. Required to stand up llama31_8b on a
    single 16 GB chip: bf16 weights alone are ~16 GB, the int8 tree is
    ~8 GB, and the per-leaf transient peaks at the lm head (~3.7 GB)."""
    ks = jax.random.split(key, 3 + cfg.layers)
    std = 0.02

    def w(ki, *shape):
        return (std * jax.random.normal(ki, shape)).astype(dtype)

    def wq(ki, *shape):
        return quantize_linear(w(ki, *shape))

    h = cfg.hidden
    qd = cfg.heads * cfg.head_dim
    kvd = cfg.kv_heads * cfg.head_dim
    params: dict = {
        "embed": quantize_embed(w(ks[0], cfg.vocab_size, h)),
        "final_ln": jnp.ones((h,), dtype),
        "layers": [],
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = wq(ks[1], h, cfg.vocab_size)
    for li in range(cfg.layers):
        kk = jax.random.split(ks[3 + li], 8)
        lp = {
            "in_ln": jnp.ones((h,), dtype),
            "q_w": wq(kk[0], h, qd),
            "k_w": wq(kk[1], h, kvd),
            "v_w": wq(kk[2], h, kvd),
            "o_w": wq(kk[3], qd, h),
            "post_ln": jnp.ones((h,), dtype),
            "gate_w": wq(kk[4], h, cfg.intermediate),
            "up_w": wq(kk[5], h, cfg.intermediate),
            "down_w": wq(kk[6], cfg.intermediate, h),
        }
        if cfg.qkv_bias:
            lp["q_b"] = jnp.zeros((qd,), dtype)
            lp["k_b"] = jnp.zeros((kvd,), dtype)
            lp["v_b"] = jnp.zeros((kvd,), dtype)
        params["layers"].append(lp)
    return params


def quantize_qwen_params(params: dict) -> dict:
    """int8-quantize every matmul weight (W8A8-dynamic decode path).

    Attention/MLP projections and the lm head (tied table included) become
    QuantizedLinear/QuantizedEmbed; norms and biases stay as-is. The whole
    weight stream a decode step reads drops ~2x (0.92 GB bf16 -> 0.47 GB for
    Qwen2.5-0.5B), which is the measured per-step wall at B=1. Settings knob:
    llm_weight_quant="int8" (core/config.py)."""
    out = {
        "embed": quantize_embed(params["embed"]),
        "final_ln": params["final_ln"],
        "layers": [],
    }
    if "lm_head" in params:
        out["lm_head"] = quantize_linear(params["lm_head"])
    for lp in params["layers"]:
        nl = dict(lp)
        for k in ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w"):
            nl[k] = quantize_linear(lp[k])
        out["layers"].append(nl)
    return out


def param_compute_dtype(params: dict):
    """Activation dtype of the model — robust to quantized embed tables."""
    return params["final_ln"].dtype


def _embed_rows(params: dict, ids: jax.Array) -> jax.Array:
    """Token-embedding lookup, dequantizing per-row when the table is int8."""
    e = params["embed"]
    if isinstance(e, QuantizedEmbed):
        rows = jnp.take(e.q, ids, axis=0).astype(jnp.float32)
        rows = rows * jnp.take(e.s, ids)[..., None]
        return rows.astype(param_compute_dtype(params))
    return jnp.take(e, ids, axis=0)


class DecodeState(NamedTuple):
    cache: KVCache
    positions: jax.Array  # [B] i32 — next absolute position per lane
    tokens: jax.Array  # [B] i32 — last emitted token per lane
    done: jax.Array  # [B] bool


def _block(
    lp: dict,
    cfg: QwenConfig,
    x: jax.Array,  # [B, T, H]
    cos,
    sin,
    positions,  # [B, T]
    cache_k,  # [B, S, Hkv, Dh] or None
    cache_v,
    mask,  # [B or 1, 1, T, S] bool
):
    b, t, _ = x.shape
    y = rms_norm(x, lp["in_ln"], cfg.eps)
    q = dense(y, lp["q_w"], lp.get("q_b")).reshape(b, t, cfg.heads, cfg.head_dim)
    k = dense(y, lp["k_w"], lp.get("k_b")).reshape(b, t, cfg.kv_heads, cfg.head_dim)
    v = dense(y, lp["v_w"], lp.get("v_b")).reshape(b, t, cfg.kv_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin, positions)
    k = apply_rope(k, cos, sin, positions)
    if cache_k is not None:
        if t == 1:
            # decode-step insert: a masked full-cache rewrite streams at
            # HBM rate, while the vmapped per-lane dynamic_update_slice
            # lowers to a scatter that dominates the step at B>1 —
            # measured 1.55-1.62x faster per step at B=8, neutral at B=1
            # (PERF_NOTES "Decode anatomy", artifacts/round3/
            # decode_anatomy.json). Positions are clamped to the last slot
            # so out-of-bounds lanes overwrite slot S-1 — the exact
            # dynamic_update_slice semantics — instead of silently
            # dropping the newest k/v.
            s_len = cache_k.shape[1]
            pos_clamped = jnp.minimum(positions[:, 0], s_len - 1)
            hit = (
                jax.lax.broadcasted_iota(jnp.int32, (b, s_len), 1)
                == pos_clamped[:, None]
            )[:, :, None, None]
            k_full = jnp.where(hit, k, cache_k)
            v_full = jnp.where(hit, v, cache_v)
        else:
            k_full = jax.vmap(
                lambda ck, kn, p: jax.lax.dynamic_update_slice(
                    ck, kn, (p, 0, 0)
                )
            )(cache_k, k, positions[:, 0])
            v_full = jax.vmap(
                lambda cv, vn, p: jax.lax.dynamic_update_slice(
                    cv, vn, (p, 0, 0)
                )
            )(cache_v, v, positions[:, 0])
    else:
        k_full, v_full = k, v
    a = attention(q, k_full, v_full, mask).reshape(b, t, -1)
    x = x + dense(a, lp["o_w"])
    y = rms_norm(x, lp["post_ln"], cfg.eps)
    ff = jax.nn.silu(dense(y, lp["gate_w"])) * dense(y, lp["up_w"])
    return x + dense(ff, lp["down_w"]), k_full, v_full


def _logits(params, cfg, x):
    y = rms_norm(x, params["final_ln"], cfg.eps)
    e = params["embed"] if cfg.tie_embeddings else params["lm_head"]
    if cfg.tie_embeddings and isinstance(e, QuantizedEmbed):
        # tied head: contract H against the int8 table's dim 1 (no transpose
        # materializes); scales = act row-scale x table row-scale
        yq, ys = quantize_act_rows(y)
        acc = jax.lax.dot_general(
            yq, e.q, (((y.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * ys * e.s
    if not cfg.tie_embeddings and isinstance(e, QuantizedLinear):
        yq, ys = quantize_act_rows(y)
        acc = jax.lax.dot_general(
            yq, e.q, (((y.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * ys * e.s
    head = e.T if cfg.tie_embeddings else e
    return jnp.dot(
        y.astype(jnp.float32), head.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


def qwen_forward(
    params: dict,
    cfg: QwenConfig,
    input_ids: jax.Array,  # [B, T]
    attn_mask: jax.Array,  # [B, T] {0,1} (right-padded prompts)
) -> jax.Array:
    """Plain causal forward (no cache) -> logits [B, T, V]. Training/eval."""
    b, t = input_ids.shape
    cos, sin = rope_frequencies(cfg.head_dim, cfg.max_len, cfg.rope_theta, cfg.rope_scaling)
    positions = jnp.maximum(jnp.cumsum(attn_mask, axis=1) - 1, 0).astype(jnp.int32)
    x = _embed_rows(params, input_ids)
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    causal = (cols <= rows)[None, None]
    pad = (attn_mask > 0)[:, None, None, :]
    mask = jnp.logical_and(causal, pad)
    for lp in params["layers"]:
        x, _, _ = _block(lp, cfg, x, cos, sin, positions, None, None, mask)
    return _logits(params, cfg, x)


def qwen_prefill(
    params: dict,
    cfg: QwenConfig,
    input_ids: jax.Array,  # [B, T] right-padded prompt bucket
    attn_mask: jax.Array,  # [B, T]
    cache: KVCache,
) -> tuple[jax.Array, KVCache]:
    """Fill the cache with the prompt; return (next-token logits [B, V], cache).

    Each lane writes its prompt at cache offset 0; `cache.length` becomes the
    true prompt length per lane.
    """
    b, t = input_ids.shape
    s = cache.k.shape[2]
    cos, sin = rope_frequencies(cfg.head_dim, cfg.max_len, cfg.rope_theta, cfg.rope_scaling)
    positions = jnp.maximum(jnp.cumsum(attn_mask, axis=1) - 1, 0).astype(jnp.int32)
    lengths = jnp.sum(attn_mask, axis=1).astype(jnp.int32)
    x = _embed_rows(params, input_ids)

    rows = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
    causal = (cols <= rows)[None, None]
    valid_key = (cols[None] < lengths[:, None, None])[:, None]
    mask = jnp.logical_and(causal, valid_key)

    zero_pos = jnp.zeros((b,), jnp.int32)
    new_k, new_v = [], []
    for li, lp in enumerate(params["layers"]):
        x, kf, vf = _block(
            lp, cfg, x, cos, sin, positions,
            cache.k[li], cache.v[li], mask,
        )
        # prefill writes at offset 0: dynamic_update_slice at position 0
        new_k.append(kf)
        new_v.append(vf)
    cache = KVCache(
        k=jnp.stack(new_k), v=jnp.stack(new_v), length=lengths
    )
    last = jnp.take_along_axis(
        x, jnp.maximum(lengths - 1, 0)[:, None, None], axis=1
    )[:, 0]
    return _logits(params, cfg, last[:, None, :])[:, 0], cache


def qwen_decode_step(
    params: dict,
    cfg: QwenConfig,
    tokens: jax.Array,  # [B] last tokens
    cache: KVCache,
) -> tuple[jax.Array, KVCache]:
    """One decode step for every lane -> (logits [B, V], updated cache)."""
    b = tokens.shape[0]
    s = cache.k.shape[2]
    cos, sin = rope_frequencies(cfg.head_dim, cfg.max_len, cfg.rope_theta, cfg.rope_scaling)
    positions = cache.length[:, None]  # [B, 1]
    x = _embed_rows(params, tokens)[:, None, :]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    mask = (cols[None] <= positions[:, :, None])[:, None]  # [B,1,1,S]
    new_k, new_v = [], []
    for li, lp in enumerate(params["layers"]):
        x, kf, vf = _block(
            lp, cfg, x, cos, sin, positions, cache.k[li], cache.v[li], mask
        )
        new_k.append(kf)
        new_v.append(vf)
    cache = KVCache(
        k=jnp.stack(new_k), v=jnp.stack(new_v), length=cache.length + 1
    )
    return _logits(params, cfg, x)[:, 0], cache


def greedy_generate(
    params: dict,
    cfg: QwenConfig,
    input_ids: jax.Array,  # [B, T] right-padded
    attn_mask: jax.Array,
    max_new_tokens: int,
    *,
    eos_token_id: int = -1,
    cache_len: Optional[int] = None,
) -> jax.Array:
    """Greedy decode -> [B, max_new_tokens] (eos-padded with eos afterwards).

    The scan body is shape-static; `max_new_tokens` picks the trip count
    (reference llm.py:292-366: greedy, max_new_tokens=128).
    """
    b, t = input_ids.shape
    s = cache_len or (t + max_new_tokens)
    cache = KVCache.zeros(
        cfg.layers, b, s, cfg.kv_heads, cfg.head_dim,
        dtype=param_compute_dtype(params),
    )
    logits, cache = qwen_prefill(params, cfg, input_ids, attn_mask, cache)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    done0 = first == eos_token_id

    def step(carry, _):
        tokens, cache, done = carry
        logits, cache = qwen_decode_step(params, cfg, tokens, cache)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos_token_id, nxt)
        done = jnp.logical_or(done, nxt == eos_token_id)
        return (nxt, cache, done), nxt

    if max_new_tokens == 1:
        return first[:, None]
    (_, _, _), rest = jax.lax.scan(
        step, (first, cache, done0), None, length=max_new_tokens - 1
    )
    return jnp.concatenate([first[:, None], rest.T], axis=1)


def qwen_extend(
    params: dict,
    cfg: QwenConfig,
    tokens: jax.Array,  # [B, T] window to consume (T = gamma + 1)
    cache: KVCache,
) -> tuple[jax.Array, KVCache]:
    """Multi-token decode step: consume a T-token window per lane starting at
    cache.length, returning logits for EVERY window position [B, T, V].

    The speculative-verify primitive: one call scores gamma draft tokens at
    nearly the cost of one decode step (decode is weight/KV-bandwidth-bound;
    T<=16 extra columns ride along free on the MXU). cache.length advances by
    T; callers roll it back to the accepted prefix (stale KV entries beyond
    `length` are never attended and are overwritten by later writes).
    """
    b, t = tokens.shape
    s = cache.k.shape[2]
    cos, sin = rope_frequencies(cfg.head_dim, cfg.max_len, cfg.rope_theta, cfg.rope_scaling)
    positions = cache.length[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
    x = _embed_rows(params, tokens)  # [B, T, H]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, t, s), 2)
    mask = (cols <= positions[:, :, None])[:, None]  # [B, 1, T, S]
    new_k, new_v = [], []
    for li, lp in enumerate(params["layers"]):
        x, kf, vf = _block(
            lp, cfg, x, cos, sin, positions, cache.k[li], cache.v[li], mask
        )
        new_k.append(kf)
        new_v.append(vf)
    cache = KVCache(
        k=jnp.stack(new_k), v=jnp.stack(new_v), length=cache.length + t
    )
    return _logits(params, cfg, x), cache


def bigram_draft(ctx_row, plen, last2, *, gamma: int):
    """Bigram prompt lookup: last occurrence of (last2[0], last2[1]) in the
    prompt -> copy the following `gamma` tokens as the draft. No match ->
    repeat last2[1] (cheap, fails fast at verify). Shared by the static
    speculative path and the decode engine's speculative segments."""
    tt = ctx_row.shape[0]
    pos = jnp.arange(tt - 1, dtype=jnp.int32)
    hit = (
        (ctx_row[:-1] == last2[0])
        & (ctx_row[1:] == last2[1])
        & (pos + 1 < plen)
    )
    idx = jnp.max(jnp.where(hit, pos, -1))
    start = jnp.clip(idx + 2, 0, tt - 1)
    win = jax.lax.dynamic_slice_in_dim(ctx_row, start, min(gamma, tt))
    if win.shape[0] < gamma:
        win = jnp.pad(win, (0, gamma - win.shape[0]))
    return jnp.where(idx >= 0, win, jnp.full((gamma,), last2[1]))


def ngram_speculative_generate(
    params: dict,
    cfg: QwenConfig,
    input_ids: jax.Array,  # [B, T] right-padded
    attn_mask: jax.Array,
    max_new_tokens: int,
    *,
    gamma: int = 8,
    eos_token_id: int = -1,
    cache_len: Optional[int] = None,
    inject_accept_p: Optional[float] = None,
    inject_key: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Greedy decode with n-gram (prompt-lookup) self-speculation.

    Token-identical to greedy_generate: each iteration drafts `gamma` tokens
    by bigram-matching the current suffix against the PROMPT and verifies
    them with one qwen_extend call; the committed tokens are always the
    model's own greedy argmaxes, acceptance only controls how many commit
    per call. RAG answers quote their retrieved context, so prompt-lookup
    acceptance is high exactly where the reference workload lives
    (reference hot loop: llm.py:343-350 emits one token per forward).

    inject_accept_p: ACCEPTANCE-INJECTION benchmark mode (round-2 VERDICT
    #1b). Real prompt-lookup acceptance is a property of the weights (k-bar
    ~ 1 on random weights), so to measure the ms/token-vs-acceptance curve
    without real checkpoints the per-draft accept decision is replaced by a
    Bernoulli(p) draw. The verify-window device cost per call is
    byte-identical to real speculation and the loop structure (commits per
    call -> iteration count) matches real acceptance at rate p, so the
    TIMING curve is the real one. BENCHMARK-ONLY: forced accepts keep KV
    entries computed from draft tokens, so emitted text is not greedy-
    identical in this mode (it is in the default mode, which is tested).

    Returns (tokens [B, max_new_tokens] eos-padded, mean_tokens_per_call f32).
    """
    b, t = input_ids.shape
    s = cache_len or (t + max_new_tokens)
    s = s + gamma + 1  # verify windows may overhang before rollback
    cache = KVCache.zeros(
        cfg.layers, b, s, cfg.kv_heads, cfg.head_dim,
        dtype=param_compute_dtype(params),
    )
    logits, cache = qwen_prefill(params, cfg, input_ids, attn_mask, cache)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    done0 = first == eos_token_id

    out_w = max_new_tokens + gamma + 1  # + scratch tail for masked writes
    out0 = jnp.full((b, out_w), eos_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(first)
    prompt_len = jnp.sum(attn_mask, axis=1).astype(jnp.int32)  # [B]

    draft_fn = functools.partial(bigram_draft, gamma=gamma)

    def cond(state):
        _, _, n_out, _, done, it = state
        return jnp.logical_and(~jnp.all(done), it < max_new_tokens)

    def body(state):
        cache, out, n_out, last, done, it = state
        prev = jnp.where(n_out >= 2, out[jnp.arange(b), n_out - 2], last)
        drafts = jax.vmap(draft_fn)(
            input_ids, prompt_len, jnp.stack([prev, last], axis=1)
        )  # [B, gamma]
        window = jnp.concatenate([last[:, None], drafts], axis=1)  # [B, g+1]
        logits, new_cache = qwen_extend(params, cfg, window, cache)
        targets = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, g+1]
        if inject_accept_p is not None:
            # synthetic Bernoulli(p) accept per draft slot: measures the
            # acceptance->latency curve; commits stay greedy-correct
            kit = jax.random.fold_in(
                inject_key if inject_key is not None else jax.random.key(0),
                it,
            )
            ok = jax.random.uniform(kit, (b, gamma)) < inject_accept_p
        else:
            # accepted prefix: drafts[j] == targets[j] for all j' <= j
            ok = drafts == targets[:, :-1]  # [B, gamma]
        n_acc = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)
        # committed tokens = targets[0..n_acc]; truncate at first eos
        j = jnp.arange(gamma + 1, dtype=jnp.int32)[None]
        within = j <= n_acc[:, None]
        is_eos = (targets == eos_token_id) & within
        any_eos = jnp.any(is_eos, axis=1)
        eos_at = jnp.argmax(is_eos, axis=1)
        commit = jnp.where(any_eos, eos_at + 1, n_acc + 1)
        commit = jnp.where(done, 0, commit)
        commit = jnp.minimum(commit, max_new_tokens - n_out)
        # write targets[0..commit) at out[n_out..]; masked writes go to the
        # scratch tail (index >= max_new_tokens)
        def write(o, tgt, start, cnt):
            for jj in range(gamma + 1):
                dst = jnp.where(jj < cnt, start + jj, out_w - 1)
                o = jax.lax.dynamic_update_slice(o, tgt[jj : jj + 1], (dst,))
            return o

        out = jax.vmap(write)(out, targets, n_out, commit)
        out = out.at[:, max_new_tokens:].set(eos_token_id)  # clean scratch
        # roll the cache back to the accepted prefix: consumed = last + the
        # accepted drafts = commit entries (cap at n_acc+1; eos truncation
        # only shortens the OUTPUT, the consumed prefix stays valid)
        consumed = jnp.where(done, 0, jnp.minimum(commit, n_acc + 1))
        new_len = cache.length + consumed
        new_cache = KVCache(
            k=new_cache.k, v=new_cache.v, length=new_len
        )
        new_last = targets[
            jnp.arange(b), jnp.clip(commit - 1, 0, gamma)
        ]
        new_last = jnp.where(done, last, new_last)
        n_out = n_out + commit
        done = done | any_eos | (n_out >= max_new_tokens)
        return (new_cache, out, n_out, new_last, done, it + 1)

    n_out0 = jnp.where(done0, jnp.ones((b,), jnp.int32), 1)
    state = (cache, out0, n_out0, first, done0, jnp.array(0, jnp.int32))
    cache, out, n_out, _, _, iters = jax.lax.while_loop(cond, body, state)
    mean_per_call = jnp.sum(n_out - 1).astype(jnp.float32) / jnp.maximum(
        iters.astype(jnp.float32) * b, 1.0
    )
    return out[:, :max_new_tokens], mean_per_call
