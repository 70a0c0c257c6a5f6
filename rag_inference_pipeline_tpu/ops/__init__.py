from .ivf import (
    IVFListing,
    build_ivf,
    build_ivf_listing,
    ivf_search,
    ivf_search_pallas,
)
from .kmeans import assign_clusters, kmeans
from .pq import (
    IVFPQListing,
    adc_lookup_sum,
    build_ivfpq,
    ivfpq_search,
    pq_decode,
    pq_encode,
    pq_lut,
    pq_topk,
    train_pq,
)
from .topk import (
    binmax_partial_topk,
    binmax_partial_topk_int8,
    exact_topk,
    fused_topk,
    fused_topk_int8,
    quantize_rows_int8,
    sharded_topk,
)

__all__ = [
    "IVFListing",
    "build_ivf",
    "build_ivf_listing",
    "ivf_search",
    "ivf_search_pallas",
    "assign_clusters",
    "kmeans",
    "IVFPQListing",
    "adc_lookup_sum",
    "build_ivfpq",
    "ivfpq_search",
    "pq_decode",
    "pq_encode",
    "pq_lut",
    "pq_topk",
    "train_pq",
    "binmax_partial_topk",
    "exact_topk",
    "fused_topk",
    "sharded_topk",
    "binmax_partial_topk_int8",
    "fused_topk_int8",
    "quantize_rows_int8",
]
