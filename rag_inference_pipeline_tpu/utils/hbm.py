"""Process-wide HBM accounting + the derived LLM bucket-ladder cap.

The tunneled v5e exposes no `device.memory_stats()` (returns None), so OOM
safety has to be analytic: every component that parks arrays in HBM
registers its footprint here at load(), and the LLM derives the largest
safe batch-lane count from what is left of the budget instead of trusting
the configured bucket ladder blindly. This replaces the hand-set
`BATCH_SHAPE_BUCKETS: '1,2,4,8'` footgun in the 8B manifests (round-3
VERDICT #8): an 8B int8 checkpoint + a 4.5M int8 index leaves ~2.7 GB of
headroom, and the 32-lane warmup that used to OOM is now clamped at load
with a log line.

Reference analog: none — the reference leans on torch's caching allocator
and visible CUDA memory stats (components load eagerly and OOM at runtime,
src/pipeline/components/llm.py:70-118); XLA allocates statically per
program, so the check must happen before compilation.
"""

from __future__ import annotations

import logging
import threading
from typing import Any

logger = logging.getLogger(__name__)

_lock = threading.Lock()
_reservations: dict[str, int] = {}


def tree_nbytes(tree: Any) -> int:
    """Total bytes of every array leaf in a pytree (device or host)."""
    import jax

    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        nbytes = getattr(leaf, "nbytes", None)
        if nbytes is not None:
            total += int(nbytes)
    return total


def device_obj_bytes(obj: Any, _depth: int = 2) -> int:
    """Sum the bytes of every jax.Array reachable from `obj`'s attributes
    (host numpy stores do NOT count — they live in host RAM). Recurses a
    couple of levels so wrapper objects (index tiers, components) are
    covered without risking reference cycles."""
    import jax

    total = 0
    if not hasattr(obj, "__dict__"):
        return 0
    for v in vars(obj).values():
        for leaf in jax.tree_util.tree_leaves(v):
            if isinstance(leaf, jax.Array):
                total += int(leaf.nbytes)
            elif _depth > 0 and hasattr(leaf, "__dict__"):
                total += device_obj_bytes(leaf, _depth - 1)
    return total


def reserve(tag: str, nbytes: int) -> None:
    """Record `nbytes` of HBM parked under `tag` (idempotent per tag)."""
    with _lock:
        _reservations[tag] = int(nbytes)
    logger.debug("hbm reserve %s: %.2f GB", tag, nbytes / 2**30)


def release(tag: str) -> None:
    with _lock:
        _reservations.pop(tag, None)


def reserved_bytes() -> int:
    with _lock:
        return sum(_reservations.values())


def reservations() -> dict[str, int]:
    with _lock:
        return dict(_reservations)


def reset() -> None:
    """Testing hook."""
    with _lock:
        _reservations.clear()


def llm_param_bytes(cfg, quant: str, dtype_bytes: int = 2) -> int:
    """Analytic parameter footprint for a QwenConfig-family decoder."""
    per_layer = (
        cfg.hidden * cfg.heads * cfg.head_dim  # q
        + 2 * cfg.hidden * cfg.kv_heads * cfg.head_dim  # k, v
        + cfg.heads * cfg.head_dim * cfg.hidden  # o
        + 3 * cfg.hidden * cfg.intermediate  # gate, up, down
    )
    wbytes = 1 if quant == "int8" else dtype_bytes
    tables = cfg.vocab_size * cfg.hidden * (1 if cfg.tie_embeddings else 2)
    return per_layer * cfg.layers * wbytes + tables * wbytes


def llm_lane_bytes(cfg, prompt_len: int, cache_len: int) -> int:
    """Per-batch-lane HBM cost of the generate program (KV cache + the
    prefill's live activation buffers). Calibrated against the measured
    v5e data points: 0.5B bf16 runs 64 lanes at 4.5M docs; 8B int8 runs
    8 lanes but OOMs at 32 (round-3 notes)."""
    kv = 2 * cfg.layers * cache_len * cfg.kv_heads * cfg.head_dim * 2
    # prefill attention scores materialize [heads, P, P] f32 (no flash at
    # these lengths); XLA keeps ~2 buffers live across the layer scan
    attn = 2 * cfg.heads * prompt_len * prompt_len * 4
    # MLP intermediates: ~4 live [P, intermediate] bf16 buffers
    mlp = 4 * prompt_len * cfg.intermediate * 2
    # residual/logit streams are < 10% of the above; covered by the
    # safety margin applied by the caller
    return kv + attn + mlp


def derive_llm_bucket_ladder(
    cfg,
    settings,
    param_bytes: int,
    ladder: tuple[int, ...],
) -> tuple[int, ...]:
    """Clamp the configured bucket ladder to what fits the HBM budget.

    free = budget - runtime reserve - everything already reserved (index,
    encoders, ...) - the LLM's own parameters; cap = free * margin /
    lane_bytes. Returns the ladder filtered to buckets <= cap (always at
    least the smallest configured bucket, so a mis-set budget degrades to
    the old behavior instead of refusing to serve).
    """
    budget = int(settings.hbm_budget_gb * 2**30)
    reserve_fixed = int(0.75 * 2**30)  # XLA runtime + scratch
    prompt_len = min(settings.truncate_length, cfg.max_len - settings.max_tokens)
    cache_len = prompt_len + settings.max_tokens
    lane = llm_lane_bytes(cfg, prompt_len, cache_len)
    free = budget - reserve_fixed - reserved_bytes() - param_bytes
    cap = int(free * 0.85 // lane) if lane > 0 else max(ladder)
    clamped = tuple(b for b in ladder if b <= cap)
    if not clamped:
        clamped = ladder[:1]
    if clamped != tuple(ladder):
        logger.warning(
            "llm bucket ladder clamped %s -> %s: %.2f GB free after "
            "%.2f GB params + %.2f GB reserved (budget %.1f GB), "
            "%.1f MB/lane",
            list(ladder), list(clamped), free / 2**30, param_bytes / 2**30,
            reserved_bytes() / 2**30, settings.hbm_budget_gb, lane / 2**20,
        )
    return clamped
