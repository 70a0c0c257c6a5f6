"""IVF-Flat on TPU: cluster-bucketed database layout + two-stage search.

Replaces faiss IndexIVFFlat (reference: faiss_store.py:84-107 sets nprobe and
precompute tables; search at :152). TPU-first design (SURVEY.md section 7.4
items 2/5):

- XLA needs static shapes, so inverted lists are a *padded dense tensor*
  [nlist, cap, D] with an id map [nlist, cap] (-1 = padding), not CSR.
  Vectors that overflow a full list cascade to their next-nearest centroid
  (build is host-side numpy — index build parity with faiss's CPU add()).
- Search: coarse scan is a small MXU matmul over centroids -> top-nprobe;
  then probed buckets are gathered from HBM and scored as one batched
  einsum; padding masked; exact top-k over the nprobe*cap candidates.
- The bucketed layout trades <= `cap_factor` memory padding for zero
  dynamic shapes; balanced k-means keeps the overhead small.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .kmeans import assign_clusters
from .topk import NEG_INF


class IVFListing(NamedTuple):
    """Device-resident bucketed IVF layout."""

    centroids: jax.Array  # [nlist, D] f32
    buckets: jax.Array  # [nlist, cap, D] storage dtype, zero-padded
    ids: jax.Array  # [nlist, cap] i32, -1 = padding
    list_sizes: jax.Array  # [nlist] i32


def layout_inverted_lists(
    x: np.ndarray,
    centroids: np.ndarray,
    assignments: np.ndarray,
    *,
    cap_factor: float = 2.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side id layout only: (ids [nlist, cap] i32, sizes [nlist] i32).

    Overflowing vectors cascade to the nearest centroid with free capacity
    so every row is indexed exactly once and cap stays ~cap_factor * mean.
    Used directly by IVF-PQ builds, which need the layout but not the
    full-precision vector buckets.
    """
    n, _ = x.shape
    nlist = centroids.shape[0]
    cap = int(np.ceil(cap_factor * n / nlist))
    # lane-align cap so Pallas bucket blocks [cap, D] / id blocks [1, cap]
    # tile cleanly (128-lane vregs)
    cap = max(128, ((cap + 127) // 128) * 128)
    ids = np.full((nlist, cap), -1, np.int32)
    sizes = np.zeros(nlist, np.int32)
    overflow: list[int] = []
    for row in range(n):
        c = assignments[row]
        if sizes[c] < cap:
            ids[c, sizes[c]] = row
            sizes[c] += 1
        else:
            overflow.append(row)
    if overflow:
        ov = np.asarray(overflow)
        # distance of overflow rows to all centroids, nearest-first cascade
        d2 = (
            -2.0 * x[ov].astype(np.float32) @ centroids.T.astype(np.float32)
            + np.sum(centroids.astype(np.float32) ** 2, axis=1)[None, :]
        )
        order = np.argsort(d2, axis=1)
        for i, row in enumerate(ov):
            for c in order[i]:
                if sizes[c] < cap:
                    ids[c, sizes[c]] = row
                    sizes[c] += 1
                    break
            else:  # pragma: no cover — cap_factor >= 1 makes this impossible
                raise RuntimeError("IVF build: no capacity left anywhere")
    return ids, sizes


def build_ivf_listing(
    x: np.ndarray,
    centroids: np.ndarray,
    assignments: np.ndarray,
    *,
    cap_factor: float = 2.5,
    storage_dtype=jnp.bfloat16,
) -> IVFListing:
    """Host-side list construction from a device-computed assignment."""
    n, d = x.shape
    ids, sizes = layout_inverted_lists(
        x, centroids, assignments, cap_factor=cap_factor
    )
    nlist, cap = ids.shape
    buckets = np.zeros((nlist, cap, d), np.float32)
    mask = ids >= 0
    buckets[mask] = x[ids[mask]]
    return IVFListing(
        centroids=jnp.asarray(centroids, jnp.float32),
        buckets=jnp.asarray(buckets, storage_dtype),
        ids=jnp.asarray(ids),
        list_sizes=jnp.asarray(sizes),
    )


def build_ivf(
    key: jax.Array,
    x_host: np.ndarray,
    nlist: int,
    *,
    train_size: int = 131072,
    iters: int = 15,
    cap_factor: float = 2.5,
    storage_dtype=jnp.bfloat16,
    seed: int = 0,
) -> IVFListing:
    """Full IVF build: on-TPU k-means train + assign, host list layout."""
    from .kmeans import kmeans

    n = x_host.shape[0]
    sel = np.random.default_rng(seed).choice(
        n, size=min(train_size, n), replace=False
    )
    x_train = jnp.asarray(x_host[sel], jnp.float32)
    centroids, _ = kmeans(key, x_train, nlist, iters=iters)
    assignments = np.asarray(
        assign_clusters(jnp.asarray(x_host, jnp.float32), centroids)
    )
    return build_ivf_listing(
        x_host,
        np.asarray(centroids),
        assignments,
        cap_factor=cap_factor,
        storage_dtype=storage_dtype,
    )


# ---------------------------------------------------------------------------
# Streaming Pallas IVF scan: probed buckets are DMA'd HBM->VMEM one per grid
# step, driven by scalar-prefetched cluster ids — no [B, nprobe, cap, D]
# gather intermediate ever exists in HBM (PERF_NOTES.md gap #2: the XLA
# gather path writes + re-reads a copy of every probed bucket; this kernel
# reads each bucket exactly once, double-buffered).
# ---------------------------------------------------------------------------


def _make_ivf_scan_kernel(nprobe: int, cap: int):
    def kernel(probe_ref, sizes_ref, q_ref, bucket_ref, vals_ref, win_ref):
        """Grid (B, nprobe): step (b, p) scores one probed bucket for query b
        and folds a per-position running max into row b of the accumulators.

        Positional bin-max: vals[b, c] = best score seen at bucket position c
        across this query's probed lists; win[b, c] = which probe slot won
        (global row ids are resolved outside — TPU block-tiling forbids the
        [1, cap] id blocks the in-kernel variant would need).
        """
        bi = pl.program_id(0)
        pi = pl.program_id(1)

        @pl.when(jnp.logical_and(bi == 0, pi == 0))
        def _init():
            vals_ref[:] = jnp.full_like(vals_ref, NEG_INF)
            win_ref[:] = jnp.full_like(win_ref, -1)

        # score ALL query rows against this bucket (the matmul hides under
        # the bucket DMA; Mosaic also cannot tile a [1, D] row load at a
        # non-8-aligned dynamic offset) and mask the update to row bi
        s = jax.lax.dot_general(
            q_ref[:],  # [b_pad, D]
            bucket_ref[0],  # [cap, D]
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [b_pad, cap]
        b_pad = s.shape[0]
        size = sizes_ref[probe_ref[bi * nprobe + pi]]
        pos = jax.lax.broadcasted_iota(jnp.int32, (b_pad, cap), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (b_pad, cap), 0)
        s = jnp.where(pos < size, s, NEG_INF)
        old = vals_ref[:]
        better = jnp.logical_and(row == bi, s > old)
        vals_ref[:] = jnp.where(better, s, old)
        win_ref[:] = jnp.where(better, pi, win_ref[:])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "interpret")
)
def ivf_search_pallas(
    listing: IVFListing,
    queries: jax.Array,
    k: int,
    *,
    nprobe: int = 64,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """IVF search (IP metric) with the streaming bucket kernel."""
    from jax.experimental.pallas import tpu as pltpu

    nlist, cap, d = listing.buckets.shape
    nprobe = min(nprobe, nlist)
    b = queries.shape[0]
    b_pad = ((max(b, 8) + 7) // 8) * 8
    qf = queries.astype(jnp.float32)
    coarse = jnp.dot(qf, listing.centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(coarse, nprobe)  # [B, nprobe]
    if b_pad != b:
        probe = jnp.pad(probe, ((0, b_pad - b), (0, 0)))
        qf = jnp.pad(qf, ((0, b_pad - b), (0, 0)))
    probe_flat = probe.reshape(-1).astype(jnp.int32)

    q = qf.astype(listing.buckets.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_pad, nprobe),
        in_specs=[
            pl.BlockSpec((b_pad, d), lambda bi, pi, pr, sz: (0, 0)),
            pl.BlockSpec(
                (1, cap, d), lambda bi, pi, pr, sz: (pr[bi * nprobe + pi], 0, 0)
            ),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, cap), lambda bi, pi, pr, sz: (0, 0)),
            pl.BlockSpec((b_pad, cap), lambda bi, pi, pr, sz: (0, 0)),
        ),
    )
    vals, win = pl.pallas_call(
        _make_ivf_scan_kernel(nprobe, cap),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, cap), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, cap), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * nprobe * cap * d,
            bytes_accessed=b_pad * nprobe * cap * d
            * listing.buckets.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(probe_flat, listing.list_sizes.astype(jnp.int32), q, listing.buckets)
    vals, win, probe = vals[:b], win[:b], probe[:b]
    # resolve winning (probe slot, position) -> global row id
    clusters = jnp.take_along_axis(probe, jnp.clip(win, 0), axis=1)  # [B, cap]
    pos = jnp.broadcast_to(jnp.arange(cap, dtype=jnp.int32), (b, cap))
    out_ids = listing.ids[clusters, pos]
    out_ids = jnp.where(win >= 0, out_ids, -1)
    k_eff = min(k, cap)
    top_s, sel = jax.lax.top_k(vals, k_eff)
    return top_s, jnp.take_along_axis(out_ids, sel, axis=1)


# ---------------------------------------------------------------------------
# Batch-deduped cluster-major scan (round 2, PERF_NOTES gap #2): the probed
# cluster sets of a batch overlap heavily, and both paths above read a bucket
# once PER QUERY that probes it. Here the batch's probe sets are UNIONed
# (compaction via stable top_k over a scatter mask), each unique bucket is
# DMA'd exactly once and scored against ALL queries on the MXU, and per-query
# membership is restored by masking outside the kernel. HBM traffic drops
# from B*nprobe buckets to |union| buckets (~8x at B=32, nprobe=64, 1M).
# ---------------------------------------------------------------------------


def dedup_probes(
    probe: jax.Array, nlist: int, n_slots: int
) -> tuple[jax.Array, jax.Array]:
    """Union the batch's probed cluster ids.

    probe [B, nprobe] i32 -> (slots [n_slots] i32, member [B, n_slots] bool).
    Probed clusters come first in `slots` (lax.top_k is stable: ties keep
    ascending index order); surplus slots hold unprobed cluster ids whose
    candidates are masked off by `member`.
    """
    mask = jnp.zeros((nlist,), jnp.float32).at[probe.reshape(-1)].set(1.0)
    _, slots = jax.lax.top_k(mask, n_slots)
    member = (probe[:, :, None] == slots[None, None, :]).any(axis=1)
    return slots.astype(jnp.int32), member


def _dedup_bucket_kernel(slots_ref, q_ref, bucket_ref, out_ref):
    """Grid step s: score every query against unique bucket slots[s]."""
    del slots_ref  # consumed by the index_map
    s = jax.lax.dot_general(
        q_ref[:],  # [b_pad, D]
        bucket_ref[0],  # [cap, D]
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [b_pad, cap]
    out_ref[:] = s[None]


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "max_slots", "interpret")
)
def ivf_search_dedup(
    listing: IVFListing,
    queries: jax.Array,
    k: int,
    *,
    nprobe: int = 64,
    max_slots: int = 0,  # 0 = min(nlist, B * nprobe)
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """IVF search (IP) reading each probed bucket once per BATCH.

    The latency-serving (batch <= 4) fast path: at B=4/nprobe=64 the kernel
    streams ~256 buckets (~0.15 GB at bf16) instead of the flat scan's full
    corpus — and unlike ivf_search_pallas it is exact within probed lists
    (no positional bin collapse).
    """
    from jax.experimental.pallas import tpu as pltpu

    nlist, cap, d = listing.buckets.shape
    nprobe = min(nprobe, nlist)
    b = queries.shape[0]
    b_pad = ((max(b, 8) + 7) // 8) * 8
    n_slots = max_slots or min(nlist, b * nprobe)
    n_slots = min(n_slots, nlist)
    qf = queries.astype(jnp.float32)
    coarse = jnp.dot(qf, listing.centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(coarse, nprobe)  # [B, nprobe]
    slots, member = dedup_probes(probe.astype(jnp.int32), nlist, n_slots)

    q = qf.astype(listing.buckets.dtype)
    if b_pad != b:
        q = jnp.pad(q, ((0, b_pad - b), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_slots,),
        in_specs=[
            pl.BlockSpec((b_pad, d), lambda s, slots: (0, 0)),
            pl.BlockSpec((1, cap, d), lambda s, slots: (slots[s], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b_pad, cap), lambda s, slots: (s, 0, 0)),
    )
    scores = pl.pallas_call(
        _dedup_bucket_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slots, b_pad, cap), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_slots * cap * d,
            bytes_accessed=n_slots * cap * d * listing.buckets.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(slots, q, listing.buckets)

    ids_g = listing.ids[slots]  # [n_slots, cap]
    s_bq = jnp.transpose(scores[:, :b, :], (1, 0, 2))  # [B, n_slots, cap]
    valid = member[:, :, None] & (ids_g >= 0)[None]
    s_bq = jnp.where(valid, s_bq, NEG_INF)
    flat_s = s_bq.reshape(b, n_slots * cap)
    flat_i = jnp.broadcast_to(
        ids_g.reshape(1, n_slots * cap), (b, n_slots * cap)
    )
    k_eff = min(k, n_slots * cap)
    top_s, sel = jax.lax.top_k(flat_s, k_eff)
    return top_s, jnp.take_along_axis(flat_i, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "metric"))
def ivf_search(
    listing: IVFListing,
    queries: jax.Array,
    k: int,
    *,
    nprobe: int = 64,
    metric: str = "ip",
) -> tuple[jax.Array, jax.Array]:
    """IVF search. Returns (scores [B,k] f32, global row ids [B,k] i32).

    Stage 1: coarse centroid scan (MXU) -> top-nprobe lists per query.
    Stage 2: gather probed buckets, one batched einsum, mask padding,
    exact top-k over nprobe*cap candidates.
    """
    nlist, cap, d = listing.buckets.shape
    nprobe = min(nprobe, nlist)
    b = queries.shape[0]
    qf = queries.astype(jnp.float32)

    c = listing.centroids
    coarse = jnp.dot(qf, c.T, preferred_element_type=jnp.float32)
    if metric == "l2":
        coarse = 2.0 * coarse - jnp.sum(c * c, axis=1)[None, :]
    _, probe = jax.lax.top_k(coarse, nprobe)  # [B, nprobe]

    bucket_vecs = listing.buckets[probe]  # [B, nprobe, cap, D] gather
    bucket_ids = listing.ids[probe]  # [B, nprobe, cap]
    qd = qf.astype(listing.buckets.dtype)
    s = jnp.einsum(
        "bpcd,bd->bpc", bucket_vecs, qd, preferred_element_type=jnp.float32
    )
    if metric == "l2":
        sq = jnp.sum(
            bucket_vecs.astype(jnp.float32) ** 2, axis=-1
        )
        s = 2.0 * s - sq
    s = jnp.where(bucket_ids >= 0, s, NEG_INF)
    flat_s = s.reshape(b, nprobe * cap)
    flat_i = bucket_ids.reshape(b, nprobe * cap)
    k_eff = min(k, nprobe * cap)
    top_s, sel = jax.lax.top_k(flat_s, k_eff)
    return top_s, jnp.take_along_axis(flat_i, sel, axis=1)


# ---------------------------------------------------------------------------
# dp-sharded IVF: inverted lists sharded over the mesh's dp axis.
# ---------------------------------------------------------------------------


def shard_ivf_listing(ctx, listing: IVFListing) -> IVFListing:
    """Place an IVF listing with its lists sharded over dp.

    Every per-list tensor (centroids, buckets, ids, list_sizes) shards on
    dim 0; requires nlist % dp == 0 (build with an nlist the mesh
    divides). This is the capacity axis: IVF-Flat bf16 at 10M x 768 is
    ~24 GB — infeasible on one 16 GB chip, ~6 GB/chip at dp=4
    (PERF_NOTES "Fused-pipeline memory headroom")."""
    nlist = listing.buckets.shape[0]
    if nlist % ctx.dp != 0:
        raise ValueError(
            f"nlist ({nlist}) must be divisible by mesh dp ({ctx.dp})"
        )
    rows = ctx.rows_dp
    return IVFListing(
        centroids=ctx.put(listing.centroids, rows),
        buckets=ctx.put(listing.buckets, rows),
        ids=ctx.put(listing.ids, rows),
        list_sizes=ctx.put(listing.list_sizes, rows),
    )


def sharded_ivf_search(
    ctx,
    listing: IVFListing,
    queries: jax.Array,
    k: int,
    *,
    nprobe: int = 64,
    nprobe_local: int = 0,
    metric: str = "ip",
) -> tuple[jax.Array, jax.Array]:
    """IVF search over dp-sharded inverted lists (distributed-faiss shape).

    Each shard owns nlist/dp lists AND their centroids. Probe selection is
    GLOBAL: the per-shard coarse scores all-gather into the full [B, nlist]
    table (B*nlist f32 — KBs over ICI, vs the GBs of bucket data that stay
    put), every shard computes the same global top-nprobe threshold, and
    then scans only the lists it OWNS that clear it. This makes the probed
    union identical to the unsharded search by construction — round-3
    VERDICT #7 closed structurally, not just measured (the old local-top-
    nprobe_local heuristic probed a different union whenever a query's
    best lists clustered on one shard). Per-shard candidates all-gather
    and merge identically everywhere, the same collective-merge pattern
    as ops/topk.py::sharded_topk (SURVEY.md section 2.6).

    `nprobe_local` is the per-shard SCAN SLOT budget (static shape). It
    defaults to 2*ceil(nprobe / dp): the measured exactness point — at
    1x (work parity with the single-device budget) a shard owning more
    than its share of global winners drops the tail and recall dips
    (0.9180 vs 0.9250 unsharded at 120k rows / nprobe 64 / dp 8), while
    from 2x the sharded ranking matched the unsharded one exactly at
    every tested budget (artifacts/round4/ivf_sharded_parity.json).
    Slots beyond the global threshold are masked, so the extra slots
    cost only gather bandwidth, never recall; exactness still requires
    that no shard owns more than nprobe_local threshold-clearing lists
    (raise toward nprobe to bound worst-case skew at dp x scan cost).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..core.mesh import DP_AXIS

    dp = ctx.dp
    if nprobe_local <= 0:
        # 2x the balanced share: measured exact-parity default (see above)
        nprobe_local = max(1, 2 * -(-nprobe // dp))
    nlist = listing.buckets.shape[0]
    nprobe_local = min(nprobe_local, nlist // dp)
    nprobe_eff = min(nprobe, nlist)

    def local(q, cents, buckets, ids, sizes):
        b = q.shape[0]
        cap = buckets.shape[1]
        coarse_l = jnp.dot(q, cents.T, preferred_element_type=jnp.float32)
        if metric == "l2":
            coarse_l = 2.0 * coarse_l - jnp.sum(cents * cents, axis=1)[None, :]
        # global probe selection: tiny collective, identical threshold on
        # every shard
        coarse_g = jax.lax.all_gather(coarse_l, DP_AXIS, axis=1, tiled=True)
        tvals, _ = jax.lax.top_k(coarse_g, nprobe_eff)
        thresh = tvals[:, -1:]  # [B, 1] nprobe-th best coarse score
        sl, probe_l = jax.lax.top_k(coarse_l, nprobe_local)  # local winners
        keep = sl >= thresh  # member of the global top-nprobe (ties widen)
        bucket_vecs = buckets[probe_l]  # [B, nprobe_local, cap, D]
        bucket_ids = ids[probe_l]  # [B, nprobe_local, cap] (global rows)
        s = jnp.einsum(
            "bpcd,bd->bpc",
            bucket_vecs,
            q.astype(bucket_vecs.dtype),
            preferred_element_type=jnp.float32,
        )
        if metric == "l2":
            sq = jnp.sum(bucket_vecs.astype(jnp.float32) ** 2, axis=-1)
            s = 2.0 * s - sq
        s = jnp.where(keep[:, :, None] & (bucket_ids >= 0), s, NEG_INF)
        flat_s = s.reshape(b, nprobe_local * cap)
        flat_i = bucket_ids.reshape(b, nprobe_local * cap)
        k_eff = min(k, nprobe_local * cap)
        s_top, sel = jax.lax.top_k(flat_s, k_eff)
        i_top = jnp.take_along_axis(flat_i, sel, axis=1)
        if k_eff < k:  # local shard has fewer than k candidate slots
            s_top = jnp.pad(
                s_top, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF
            )
            i_top = jnp.pad(
                i_top, ((0, 0), (0, k - k_eff)), constant_values=-1
            )
        s_top = jnp.where(i_top >= 0, s_top, NEG_INF)
        s_all = jax.lax.all_gather(s_top, DP_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i_top, DP_AXIS, axis=1, tiled=True)
        ms, sel = jax.lax.top_k(s_all, k)
        return ms, jnp.take_along_axis(i_all, sel, axis=1)

    fn = shard_map(
        local,
        mesh=ctx.mesh,
        in_specs=(P(), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return fn(
        queries.astype(jnp.float32),
        listing.centroids,
        listing.buckets,
        listing.ids,
        listing.list_sizes,
    )
