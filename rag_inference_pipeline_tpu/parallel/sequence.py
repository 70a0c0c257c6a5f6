"""Sequence parallelism: token-dim sharding for long encoder inputs.

The reference has NO sequence-level scaling — it truncates every input to
512 tokens instead (SURVEY.md section 5.7). This module is the TPU-idiomatic
extension: standard sequence parallelism (LN/MLP token-sharded over an `sp`
axis, K/V all-gathered for attention, Q kept token-sharded so attention
compute is also split over sp). Queries see the full key set, so results
are exact — validated against the unsharded encoder in tests.

Composition: sp reuses the dp axis of the standard mesh when batch < dp
(long-context single-query workloads), or a dedicated sp axis on larger
meshes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..core.mesh import MeshContext
from ..models.bert import BertConfig
from ..models.layers import dense, gelu, layer_norm


def _sp_attention(q, k_local, v_local, mask_local, axis: str):
    """Attention with token-sharded Q and all-gathered K/V.

    q: [B, T/sp, H, Dh] local query tokens
    k_local/v_local: [B, T/sp, H, Dh] local key/value tokens
    mask_local: [B, T/sp] local key validity
    """
    k = jax.lax.all_gather(k_local, axis, axis=1, tiled=True)  # [B, T, H, Dh]
    v = jax.lax.all_gather(v_local, axis, axis=1, tiled=True)
    mask = jax.lax.all_gather(mask_local, axis, axis=1, tiled=True)  # [B, T]
    dh = q.shape[-1]
    scores = jnp.einsum(
        "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(dh)
    scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def bert_encode_sp(
    params: dict,
    cfg: BertConfig,
    mesh_ctx: MeshContext,
    input_ids: jax.Array,  # [B, T], T divisible by sp size
    attn_mask: jax.Array,
    *,
    sp_axis: str = "dp",
) -> jax.Array:
    """Sequence-parallel BERT encoder: exact-match to bert_encode.

    Embeddings, LayerNorms, and MLPs run on T/sp local tokens per device;
    each attention all-gathers K/V over ICI (2 x T x H bytes per layer).
    """
    mesh = mesh_ctx.mesh
    sp = mesh.shape[sp_axis]
    t = input_ids.shape[1]
    if t % sp != 0:
        raise ValueError(f"seq len {t} not divisible by sp={sp}")

    def local_fn(params, ids_l, mask_l, pos_l):
        emb = params["embeddings"]
        x = (
            jnp.take(emb["word"], ids_l, axis=0)
            + jnp.take(emb["position"], pos_l, axis=0)
            + jnp.take(emb["token_type"], jnp.zeros_like(ids_l), axis=0)
        )
        x = layer_norm(x, emb["ln_w"], emb["ln_b"], cfg.eps)
        b, tl = ids_l.shape
        dh = cfg.hidden // cfg.heads
        for lp in params["layers"]:
            q = dense(x, lp["q_w"], lp["q_b"]).reshape(b, tl, cfg.heads, dh)
            k = dense(x, lp["k_w"], lp["k_b"]).reshape(b, tl, cfg.heads, dh)
            v = dense(x, lp["v_w"], lp["v_b"]).reshape(b, tl, cfg.heads, dh)
            a = _sp_attention(q, k, v, mask_l, sp_axis).reshape(b, tl, cfg.hidden)
            x = layer_norm(
                x + dense(a, lp["o_w"], lp["o_b"]),
                lp["attn_ln_w"], lp["attn_ln_b"], cfg.eps,
            )
            h = gelu(dense(x, lp["ffn_in_w"], lp["ffn_in_b"]))
            x = layer_norm(
                x + dense(h, lp["ffn_out_w"], lp["ffn_out_b"]),
                lp["ffn_ln_w"], lp["ffn_ln_b"], cfg.eps,
            )
        return x

    positions = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32), input_ids.shape
    )
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, sp_axis), P(None, sp_axis), P(None, sp_axis)),
        out_specs=P(None, sp_axis),
        check_rep=False,
    )
    return fn(params, input_ids, attn_mask, positions)
