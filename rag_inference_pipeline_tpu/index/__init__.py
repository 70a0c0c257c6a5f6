from .base import BaseIndex
from .flat import FlatIndex
from .ivf_flat import IVFFlatIndex
from .ivf_pq import IVFPQIndex


def make_index(settings, mesh=None) -> BaseIndex:
    """Settings -> index instance (component-factory hook)."""
    from ..core.enums import IndexKind

    kind = settings.index_kind
    if kind is IndexKind.FLAT:
        # partial-topk bin count: oversample * k, lane-aligned, >= 512
        nbins = max(512, -(-settings.retrieval_k * settings.index_search_oversample // 128) * 128)
        return FlatIndex(
            settings.index_dim,
            metric=settings.index_metric,
            dtype=settings.index_dtype,
            mesh=mesh,
            nbins=min(nbins, 2048),
            rescore_k=settings.index_rescore_k,
            rescore_store=settings.index_rescore_store,
        )
    if kind is IndexKind.IVF_FLAT:
        idx = IVFFlatIndex(
            settings.index_dim,
            settings.index_nlist,
            metric=settings.index_metric,
            nprobe=settings.index_nprobe,
            dtype=settings.index_dtype,
            mesh=mesh,
            cap_factor=settings.index_cap_factor,
        )
        idx.nprobe_local = settings.index_nprobe_local
        return idx
    idx = IVFPQIndex(
        settings.index_dim,
        settings.index_nlist,
        settings.index_pq_m,
        nprobe=settings.index_nprobe,
        mesh=mesh,
        rescore_k=settings.index_pq_rescore_k,
        cap_factor=settings.index_cap_factor,
        # 4-bit codes -> ksub=16 one-hot MXU ADC kernel (the >=10M capacity
        # play: 10M x 768 at m=192/PQ4 is ~1.9 GB of codes vs 15 GB bf16)
        ksub=16 if settings.index_pq_bits == 4 else 256,
        rescore_kind=settings.index_pq_rescore_kind,
    )
    idx.nprobe_local = settings.index_nprobe_local
    return idx


__all__ = ["BaseIndex", "FlatIndex", "IVFFlatIndex", "IVFPQIndex", "make_index"]
