"""Shared transformer building blocks, pure JAX.

Replaces the reference's torch/transformers forward passes (reference:
components/embedding.py, reranker.py, llm.py, sentiment.py, toxicity.py all
call HF torch models). Models here are param-pytree + pure-function style so
weights map 1:1 from HF safetensors and shard cleanly with NamedSharding;
everything is jit/pjit-compatible with static shapes (SURVEY.md section 7.2
item 4).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

Params = dict  # nested str -> array pytree


def layer_norm(x, weight, bias, eps: float = 1e-12):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * weight + bias).astype(x.dtype)


def rms_norm(x, weight, eps: float = 1e-6):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * weight).astype(x.dtype)


class QuantizedLinear(NamedTuple):
    """Weight-only int8 linear: w ~= q * s[None, :] (per-output-column scales).

    Decode at small batch is a weight-stream problem (PERF_NOTES: 1.70
    ms/step at B=1 = the 0.92 GB bf16 read at ~550 GB/s effective), so
    storing matmul weights as int8 halves the bytes every step pulls from
    HBM. Compute is W8A8-dynamic: activations quantize per token (symmetric
    abs-max), the dot runs s8 x s8 -> s32 on the MXU (the same native int8
    pass the index kernels use), and the result dequantizes in f32 with
    act_scale * col_scale. Replaces what the reference would reach for with
    torch.quantization / bitsandbytes (reference components/llm.py loads
    fp32 torch weights; no quantization upstream)."""

    q: jax.Array  # [in, out] int8
    s: jax.Array  # [out] f32 column scales


class QuantizedEmbed(NamedTuple):
    """int8 token-embedding table with per-row (per-vocab-token) scales.

    Quantizing the table matters twice for tied-embedding LMs: the lookup
    gather is cheap either way, but the tied lm-head dot streams the whole
    [V, H] table every decode step (0.27 GB bf16 for Qwen2.5-0.5B)."""

    q: jax.Array  # [V, H] int8
    s: jax.Array  # [V] f32 row scales


def quantize_linear(w) -> QuantizedLinear:
    """Symmetric per-output-column int8 quantization of a [in, out] weight."""
    w32 = jnp.asarray(w).astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=0), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / s[None, :]), -127, 127).astype(jnp.int8)
    return QuantizedLinear(q=q, s=s)


def quantize_embed(w) -> QuantizedEmbed:
    """Symmetric per-row int8 quantization of a [V, H] embedding table."""
    w32 = jnp.asarray(w).astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / s[:, None]), -127, 127).astype(jnp.int8)
    return QuantizedEmbed(q=q, s=s)


def quantize_act_rows(x) -> tuple[jax.Array, jax.Array]:
    """Dynamic symmetric int8 quantization over the last axis.

    Returns (q int8 same shape, scales f32 [..., 1]). The activation side of
    the W8A8 decode dot; at decode shapes ([B, 1, H]) this is noise next to
    the weight stream it unlocks."""
    x32 = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _qdense(x, w: QuantizedLinear):
    xq, xs = quantize_act_rows(x)
    acc = jax.lax.dot_general(
        xq,
        w.q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * xs * w.s


def dense(x, w, b=None):
    if isinstance(w, QuantizedLinear):
        y = _qdense(x, w).astype(x.dtype)
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def rope_frequencies(
    head_dim: int, max_len: int, theta: float = 10000.0, scaling=None
):
    """Precompute RoPE cos/sin tables: [max_len, head_dim//2] each.

    `scaling`, when given, is the Llama-3.x frequency remap as a tuple
    (factor, low_freq_factor, high_freq_factor, original_max_len) —
    HF transformers `_compute_llama3_parameters` semantics
    (modeling_rope_utils.py): wavelengths shorter than the high-freq
    cutoff keep their frequency, longer than the low-freq cutoff divide
    by `factor`, and the band between interpolates smoothly.
    """
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    if scaling is not None:
        factor, low_ff, high_ff, orig_max = scaling
        wavelen = 2.0 * jnp.pi / inv
        low_wl = orig_max / low_ff
        high_wl = orig_max / high_ff
        smooth = (orig_max / wavelen - low_ff) / (high_ff - low_ff)
        smoothed = (1.0 - smooth) * (inv / factor) + smooth * inv
        inv = jnp.where(
            wavelen < high_wl,
            inv,
            jnp.where(wavelen > low_wl, inv / factor, smoothed),
        )
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x, cos, sin, positions):
    """x: [B, T, H, Dh]; positions: [B, T] absolute positions."""
    c = cos[positions][:, :, None, :]  # [B, T, 1, Dh/2]
    s = sin[positions][:, :, None, :]
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate(
        [x1 * c - x2 * s, x2 * c + x1 * s], axis=-1
    ).astype(x.dtype)


def attention(
    q: jax.Array,  # [B, T, Hq, Dh]
    k: jax.Array,  # [B, S, Hkv, Dh]
    v: jax.Array,  # [B, S, Hkv, Dh]
    mask: Optional[jax.Array] = None,  # broadcastable to [B, Hq, T, S], bool
) -> jax.Array:
    """Scaled dot-product attention with GQA head-group broadcast.

    f32 softmax accumulation regardless of input dtype (bf16-safe).
    """
    b, t, hq, dh = q.shape
    hkv = k.shape[2]
    if hq != hkv:
        group = hq // hkv
        k = jnp.repeat(k, group, axis=2)
        v = jnp.repeat(v, group, axis=2)
    scores = jnp.einsum(
        "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(dh)
    if mask is not None:
        scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


def encoder_attention(
    q: jax.Array,  # [B, T, H, Dh]
    k: jax.Array,
    v: jax.Array,
    attn_mask: jax.Array,  # [B, T] {0,1}
) -> jax.Array:
    """Bidirectional self-attention with key-padding, flash-accelerated.

    On TPU at long context (T >= 1024, flash-compatible shapes) this runs
    the fused Pallas flash-attention kernel with padding expressed as
    segment ids (validated vs the reference path at bf16 tolerance, 2e-3).
    Measured on v5e: at T=512 XLA's fused masked attention is FASTER
    (41 vs 70 ms for bge-base B=32), so flash only engages where the T^2
    materialization dominates.
    """
    b, t, h, dh = q.shape
    use_flash = (
        jax.default_backend() == "tpu"
        and t % 128 == 0
        and t >= 1024
        and dh in (64, 128, 256)
    )
    if use_flash:
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        out = fa.flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            segment_ids=fa.SegmentIds(q=attn_mask, kv=attn_mask),
            causal=False,
            sm_scale=1.0 / math.sqrt(dh),
        )
        return out.transpose(0, 2, 1, 3).astype(q.dtype)
    return attention(q, k, v, make_padding_mask(attn_mask))


def causal_mask(t: int, s: int, offset) -> jax.Array:
    """[1, 1, T, S] boolean causal mask; `offset` = absolute position of the
    first query row (traced value OK)."""
    rows = offset + jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
    return (cols <= rows)[None, None]


def make_padding_mask(attn_mask: jax.Array) -> jax.Array:
    """[B, S] {0,1} -> [B, 1, 1, S] boolean key-padding mask."""
    return (attn_mask > 0)[:, None, None, :]


class KVCache(NamedTuple):
    """Static-shape KV cache: [B, max_len, Hkv, Dh] per layer, stacked on
    axis 0 over layers -> [L, B, max_len, Hkv, Dh]."""

    k: jax.Array
    v: jax.Array
    length: jax.Array  # [B] i32 — filled length per sequence

    @classmethod
    def zeros(cls, layers, batch, max_len, heads_kv, head_dim, dtype=jnp.bfloat16):
        shape = (layers, batch, max_len, heads_kv, head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((batch,), jnp.int32),
        )
