from .topk import binmax_partial_topk, exact_topk, fused_topk, sharded_topk

__all__ = [
    "binmax_partial_topk",
    "exact_topk",
    "fused_topk",
    "sharded_topk",
]
