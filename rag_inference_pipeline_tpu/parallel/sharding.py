"""Parameter/activation sharding rules over the dp x tp mesh.

This supplies the tensor/data parallelism the reference entirely lacks
(SURVEY.md section 2.5: TP/PP/SP all absent upstream — here they're
first-class). Megatron-style TP for transformer blocks:

- attention qkv projections column-parallel (heads split over tp),
  output projection row-parallel (psum inserted by XLA);
- MLP gate/up column-parallel, down row-parallel;
- embeddings replicated (vocab small enough per-chip at 0.5B scale);
- activations sharded batch-over-dp.

Shardings are declared via NamedSharding constraints on params + jit
in/out shardings; XLA inserts the all-reduces over ICI (scaling-book
recipe: pick a mesh, annotate, let the compiler place collectives).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.mesh import DP_AXIS, TP_AXIS, MeshContext


def _ns(mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def qwen_param_sharding(mesh_ctx: MeshContext, params: dict) -> dict:
    """Sharding pytree matching models.qwen.init_qwen_params layout.

    Quantized leaves (models.layers.QuantizedLinear/QuantizedEmbed) get the
    same placement as their bf16 counterpart: the int8 block follows the
    weight's split and the per-output-column scale vector shards with the
    columns (so a column-split stays fully local; a row-split replicates the
    scales — they multiply AFTER the psum'd s32 accumulate dequantizes)."""
    from ..models.layers import QuantizedEmbed, QuantizedLinear

    m = mesh_ctx.mesh
    repl = _ns(m)
    col = _ns(m, None, TP_AXIS)  # [in, out]: split output features
    row = _ns(m, TP_AXIS, None)  # [in, out]: split input features
    vec_tp = _ns(m, TP_AXIS)

    def _wq(p, base):
        """Sharding for a maybe-quantized weight leaf."""
        if isinstance(p, QuantizedLinear):
            return QuantizedLinear(
                q=base, s=vec_tp if base is col else repl
            )
        return base

    def _embed_sharding(p):
        if isinstance(p, QuantizedEmbed):
            return QuantizedEmbed(q=repl, s=repl)
        return repl

    out: dict[str, Any] = {
        "embed": _embed_sharding(params["embed"]),
        "final_ln": repl,
        "layers": [],
    }
    if "lm_head" in params:
        out["lm_head"] = _wq(params["lm_head"], col)
    for lp in params["layers"]:
        ls = {
            "in_ln": repl,
            "q_w": _wq(lp["q_w"], col),
            "k_w": _wq(lp["k_w"], col),
            "v_w": _wq(lp["v_w"], col),
            "o_w": _wq(lp["o_w"], row),
            "post_ln": repl,
            "gate_w": _wq(lp["gate_w"], col),
            "up_w": _wq(lp["up_w"], col),
            "down_w": _wq(lp["down_w"], row),
        }
        if "q_b" in lp:
            ls["q_b"] = vec_tp
            ls["k_b"] = vec_tp
            ls["v_b"] = vec_tp
        out["layers"].append(ls)
    return out


def bert_param_sharding(mesh_ctx: MeshContext, params: dict) -> dict:
    """Megatron-TP placements for the BERT encoder tree; quantized leaves
    follow the same rule as qwen_param_sharding (scales ride a column
    split, replicate across a row split)."""
    from ..models.layers import QuantizedLinear

    m = mesh_ctx.mesh
    repl = _ns(m)
    col = _ns(m, None, TP_AXIS)
    row = _ns(m, TP_AXIS, None)
    vec_tp = _ns(m, TP_AXIS)

    def _wq(p, base):
        if isinstance(p, QuantizedLinear):
            return QuantizedLinear(q=base, s=vec_tp if base is col else repl)
        return base

    out: dict[str, Any] = {
        "embeddings": {k: repl for k in params["embeddings"]},
        "layers": [],
        "pooler": {"w": _wq(params["pooler"]["w"], repl), "b": repl},
    }
    if "classifier" in params:
        out["classifier"] = {"w": _wq(params["classifier"]["w"], repl), "b": repl}
    for lp in params["layers"]:
        ls = {}
        for k in lp:
            if k in ("q_w", "k_w", "v_w", "ffn_in_w"):
                ls[k] = _wq(lp[k], col)
            elif k in ("o_w", "ffn_out_w"):
                ls[k] = _wq(lp[k], row)
            elif k in ("q_b", "k_b", "v_b", "ffn_in_b"):
                ls[k] = _ns(m, TP_AXIS)
            else:
                ls[k] = repl
        out["layers"].append(ls)
    return out


def shard_params(mesh_ctx: MeshContext, params: dict, shardings: dict) -> dict:
    """device_put the param pytree with its sharding pytree."""
    return jax.tree.map(
        lambda p, s: jax.device_put(p, s), params, shardings,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )


def batch_sharding(mesh_ctx: MeshContext) -> NamedSharding:
    """Activations: batch dim over dp, everything else replicated."""
    return _ns(mesh_ctx.mesh, DP_AXIS)


def kv_cache_sharding(mesh_ctx: MeshContext) -> NamedSharding:
    """KVCache arrays [L, B, S, Hkv, Dh]: batch over dp, kv heads over tp."""
    return _ns(mesh_ctx.mesh, None, DP_AXIS, None, TP_AXIS, None)
