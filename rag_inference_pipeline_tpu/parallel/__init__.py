from .sequence import bert_encode_sp
from .sharding import (
    batch_sharding,
    bert_param_sharding,
    kv_cache_sharding,
    qwen_param_sharding,
    shard_params,
)

__all__ = [
    "bert_encode_sp",
    "batch_sharding",
    "bert_param_sharding",
    "kv_cache_sharding",
    "qwen_param_sharding",
    "shard_params",
]
