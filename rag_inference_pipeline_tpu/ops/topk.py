"""Fused similarity-scan + top-k kernels — the TPU replacement for FAISS's
flat scan (reference: faiss-cpu IndexFlat / IndexIVFFlat search invoked at
src/pipeline/components/faiss_store.py:113-158).

Design (SURVEY.md section 7.4 item 1, after the TPU-KNN recipe in PAPERS.md):

- The distance computation is a plain MXU matmul: scores = Q @ DB^T in
  bfloat16 with float32 accumulation — this is where the FLOPs are and it
  runs at peak when DB is HBM-resident and streamed through VMEM.
- The top-k selection after the matmul is the bottleneck if done as a sort.
  The fused Pallas kernel instead keeps an L-bin *partial* top-k per query
  (bin = column mod L, running (max, argmax) per bin, updated chunk by
  chunk while the next chunk DMAs in). Collisions of two true top-k items
  in one bin are the only recall loss; with L = oversample*k bins the loss
  is negligible (L=128, k=10, 1M rows -> recall@10 ~ 0.97; L=512 -> >0.99).
  A final exact `lax.top_k` over the L survivors yields the result.
- Exact mode is a chunked XLA scan with running top-k merge (used as the
  oracle and for small corpora).
- Multi-chip: the database is row-sharded over the `dp` mesh axis; each
  shard computes its local top-k and a single all-gather of k*(dp) UIDs +
  scores merges on every device (rides ICI, tiny payload).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..core.mesh import DP_AXIS, MeshContext

NEG_INF = -3.0e38  # plain float: jnp scalars would be captured as consts in Pallas


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Exact top-k (XLA): chunked scan with running merge. Oracle + small corpora.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "metric", "ntotal")
)
def exact_topk(
    queries: jax.Array,
    db: jax.Array,
    k: int,
    *,
    chunk: int = 131072,
    metric: str = "ip",
    db_sq_norms: Optional[jax.Array] = None,
    ntotal: Optional[int] = None,  # true rows when db carries pad rows
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k by score. Returns (scores [B,k] f32, indices [B,k] i32).

    metric 'ip' maximizes q.d; 'l2' maximizes 2*q.d - |d|^2 (equivalent to
    min L2 distance; scores returned are that surrogate).
    """
    n, d = db.shape
    n_true = min(ntotal or n, n)
    b = queries.shape[0]
    k = min(k, n_true)
    chunk = max(min(chunk, n), k)  # lax.top_k over a chunk needs chunk >= k
    n_chunks = (n + chunk - 1) // chunk
    n_pad = n_chunks * chunk
    if n_pad != n:
        db = jnp.pad(db, ((0, n_pad - n), (0, 0)))
        if db_sq_norms is not None:
            db_sq_norms = jnp.pad(
                db_sq_norms, (0, n_pad - n), constant_values=jnp.inf
            )
    if metric == "l2" and db_sq_norms is None:
        db_sq_norms = jnp.sum(
            db.astype(jnp.float32) * db.astype(jnp.float32), axis=-1
        )
    q = queries.astype(db.dtype)

    def body(carry, i):
        best_s, best_i = carry
        rows = jax.lax.dynamic_slice_in_dim(db, i * chunk, chunk, axis=0)
        s = jnp.dot(q, rows.T, preferred_element_type=jnp.float32)
        if metric == "l2":
            norms = jax.lax.dynamic_slice_in_dim(db_sq_norms, i * chunk, chunk)
            s = 2.0 * s - norms[None, :]
        # mask padded tail rows of the final chunk
        gids = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        s = jnp.where(gids < n_true, s, NEG_INF)
        cs, ci = jax.lax.top_k(s, k)
        cand_s = jnp.concatenate([best_s, cs], axis=1)
        cand_i = jnp.concatenate([best_i, (gids[0][ci]).astype(jnp.int32)], axis=1)
        ms, sel = jax.lax.top_k(cand_s, k)
        mi = jnp.take_along_axis(cand_i, sel, axis=1)
        return (ms, mi), None

    init = (
        jnp.full((b, k), NEG_INF, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    (scores, idx), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return scores, idx


# ---------------------------------------------------------------------------
# Fused Pallas kernel: matmul + L-bin partial top-k, streamed over DB chunks.
# ---------------------------------------------------------------------------


def _binmax_kernel(q_ref, db_ref, nrows_ref, vals_ref, idxs_ref, *, nbins, chunk):
    """One grid step: score a DB chunk and fold into running per-bin max.

    q_ref:    [B, D]      queries (VMEM, resident across steps)
    db_ref:   [chunk, D]  current DB chunk (auto-DMA'd HBM->VMEM)
    nrows_ref:[1, 1]      SMEM: true (unpadded) DB row count
    vals_ref: [B, nbins]  output/accumulator: running bin max scores
    idxs_ref: [B, nbins]  output/accumulator: running bin argmax (global row)

    Layout discipline (the round-1 kernel ran at ~12% of HBM SoL): the chunk
    is scored as chunk//nbins sequential [B, nbins] sub-block matmuls whose
    *columns ARE the bins* — the accumulator update is one compare and two
    selects per sub-block with no reshape (cross-lane relayout), no argmax,
    and only a 2-D iota. Bin semantics are unchanged: bin(row) = row % nbins.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, NEG_INF)
        idxs_ref[:] = jnp.full_like(idxs_ref, -1)

    b = vals_ref.shape[0]
    nrows = nrows_ref[0, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, nbins), 1)
    for j in range(chunk // nbins):
        # [B, nbins] scores on the MXU; f32 accumulation.
        s = jax.lax.dot_general(
            q_ref[:],
            db_ref[j * nbins : (j + 1) * nbins, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gid = (i * chunk + j * nbins) + col
        s = jnp.where(gid < nrows, s, NEG_INF)
        better = s > vals_ref[:]
        vals_ref[:] = jnp.where(better, s, vals_ref[:])
        idxs_ref[:] = jnp.where(better, gid, idxs_ref[:])


def binmax_partial_topk(
    queries: jax.Array,
    db: jax.Array,
    *,
    nbins: int = 512,
    chunk: int = 4096,
    interpret: bool = False,
    ntotal: Optional[int] = None,  # true rows when db is chunk-padded
) -> tuple[jax.Array, jax.Array]:
    """Partial top-k: per-query (score, index) of the best row in each of
    `nbins` column-residue bins. Exact scores; approximate as a top-k set
    only through bin collisions.

    Returns (vals [B, nbins] f32, idxs [B, nbins] i32), unsorted.
    """
    n, d = db.shape
    b = queries.shape[0]
    if chunk % nbins != 0:
        raise ValueError(f"chunk ({chunk}) must be a multiple of nbins ({nbins})")
    b_pad = _round_up(max(b, 8), 8)
    n_pad = _round_up(n, chunk)
    if b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, 0)))
    if n_pad != n:
        db = jnp.pad(db, ((0, n_pad - n), (0, 0)))
    q = queries.astype(db.dtype)
    n_chunks = n_pad // chunk
    nrows = jnp.array([[min(ntotal or n, n)]], dtype=jnp.int32)

    kern = functools.partial(_binmax_kernel, nbins=nbins, chunk=chunk)
    vals, idxs = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((b_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, nbins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, nbins), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, nbins), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, nbins), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d,
            bytes_accessed=n_pad * d * db.dtype.itemsize + b_pad * d * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # sequential accumulator over grid steps — not parallelizable
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(q, db, nrows)
    return vals[:b], idxs[:b]


@functools.partial(
    jax.jit, static_argnames=("k", "nbins", "chunk", "interpret", "ntotal")
)
def fused_topk(
    queries: jax.Array,
    db: jax.Array,
    k: int,
    *,
    nbins: int = 512,
    chunk: int = 4096,
    interpret: bool = False,
    ntotal: Optional[int] = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused flat-IP search: Pallas bin-max scan + exact top-k over survivors.

    Recall vs exact is controlled by nbins (>= ~32*k for recall@k ~ 0.99 on
    1M rows). Returns (scores [B,k] f32, indices [B,k] i32). Requires
    k <= nbins (the scan keeps only nbins survivors); callers wanting larger
    k should use exact_topk.
    """
    if k > nbins:
        raise ValueError(
            f"fused_topk keeps only nbins={nbins} candidates; k={k} exceeds "
            "it — raise nbins or use exact_topk"
        )
    vals, idxs = binmax_partial_topk(
        queries, db, nbins=nbins, chunk=chunk, interpret=interpret,
        ntotal=ntotal,
    )
    s, sel = jax.lax.top_k(vals, min(k, vals.shape[1]))
    return s, jnp.take_along_axis(idxs, sel, axis=1)


# ---------------------------------------------------------------------------
# Int8 quantized scan: half the HBM traffic of bf16 (the scan is
# bandwidth-bound — PERF_NOTES.md), int8 matmul on the MXU with int32
# accumulation, per-row scales folded in on the VPU. The SQ8 analog of
# faiss's scalar quantizer.
# ---------------------------------------------------------------------------


def quantize_rows_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization. Returns (q [N,D] i8, scales [N] f32)."""
    xf = x.astype(jnp.float32)
    maxabs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-9)
    scales = maxabs / 127.0
    q = jnp.clip(jnp.round(xf / scales[:, None]), -127, 127).astype(jnp.int8)
    return q, scales


def _binmax_kernel_int8(
    q_ref, db_ref, scale_ref, nrows_ref, vals_ref, idxs_ref, *, nbins, chunk
):
    """Int8 variant: scores = (q_i8 . db_i8) * row_scale (query scales are
    applied outside — they do not change per-query ranking). Same
    sub-block/column-bin layout discipline as _binmax_kernel."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, NEG_INF)
        idxs_ref[:] = jnp.full_like(idxs_ref, -1)

    b = vals_ref.shape[0]
    nrows = nrows_ref[0, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, nbins), 1)
    for j in range(chunk // nbins):
        s = jax.lax.dot_general(
            q_ref[:],
            db_ref[j * nbins : (j + 1) * nbins, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * scale_ref[0, j * nbins : (j + 1) * nbins][None, :]
        gid = (i * chunk + j * nbins) + col
        s = jnp.where(gid < nrows, s, NEG_INF)
        better = s > vals_ref[:]
        vals_ref[:] = jnp.where(better, s, vals_ref[:])
        idxs_ref[:] = jnp.where(better, gid, idxs_ref[:])


def binmax_partial_topk_int8(
    queries_i8: jax.Array,  # [B, D] int8 (pre-quantized)
    db_i8: jax.Array,  # [N, D] int8
    db_scales: jax.Array,  # [N] f32
    *,
    nbins: int = 512,
    chunk: int = 8192,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Int8 partial top-k. Scores are dequantized by db row scale only; the
    per-query scale is a positive constant per row and preserves ranking."""
    n, d = db_i8.shape
    b = queries_i8.shape[0]
    if chunk % nbins != 0:
        raise ValueError(f"chunk ({chunk}) must be a multiple of nbins ({nbins})")
    b_pad = _round_up(max(b, 32), 32)  # int8 sublane tile is 32
    n_pad = _round_up(n, chunk)
    if b_pad != b:
        queries_i8 = jnp.pad(queries_i8, ((0, b_pad - b), (0, 0)))
    if n_pad != n:
        db_i8 = jnp.pad(db_i8, ((0, n_pad - n), (0, 0)))
        db_scales = jnp.pad(db_scales, (0, n_pad - n))
    n_chunks = n_pad // chunk
    nrows = jnp.array([[n]], dtype=jnp.int32)
    scales_2d = db_scales.astype(jnp.float32).reshape(1, n_pad)

    kern = functools.partial(_binmax_kernel_int8, nbins=nbins, chunk=chunk)
    vals, idxs = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((b_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, nbins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, nbins), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, nbins), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, nbins), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d,
            bytes_accessed=n_pad * d + b_pad * d + n_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(queries_i8, db_i8, scales_2d, nrows)
    return vals[:b], idxs[:b]


@functools.partial(
    jax.jit,
    static_argnames=("k", "nbins", "chunk", "interpret", "rescore_k"),
)
def fused_topk_int8(
    queries: jax.Array,  # [B, D] float — quantized internally
    db_i8: jax.Array,
    db_scales: jax.Array,
    k: int,
    *,
    nbins: int = 512,
    chunk: int = 8192,
    interpret: bool = False,
    rescore_db: Optional[jax.Array] = None,  # [N, D] full-precision rows
    rescore_k: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Quantized flat search: int8 scan + top-k over the L survivors.

    Returned scores are int32-domain dequantized by db scales (proportional
    to true IP up to the per-query quant scale — fine for ranking). With
    `rescore_db` + `rescore_k`, the top rescore_k int8 candidates are
    re-scored exactly against the full-precision rows before the final cut
    — recovers the quantization recall gap for the cost of a tiny gather.
    """
    q_i8, q_scales = quantize_rows_int8(queries)
    vals, idxs = binmax_partial_topk_int8(
        q_i8, db_i8, db_scales, nbins=nbins, chunk=chunk, interpret=interpret
    )
    vals = vals * q_scales[:, None]
    if rescore_db is not None and rescore_k > k:
        shortlist = min(rescore_k, vals.shape[1])
        _, sel = jax.lax.top_k(vals, shortlist)
        cand_ids = jnp.take_along_axis(idxs, sel, axis=1)  # [B, S]
        cand = jnp.take(rescore_db, jnp.clip(cand_ids, 0), axis=0)
        exact = jnp.einsum(
            "bsd,bd->bs", cand, queries.astype(cand.dtype),
            preferred_element_type=jnp.float32,
        )
        exact = jnp.where(cand_ids >= 0, exact, NEG_INF)
        s, sel2 = jax.lax.top_k(exact, min(k, shortlist))
        return s, jnp.take_along_axis(cand_ids, sel2, axis=1)
    s, sel = jax.lax.top_k(vals, min(k, vals.shape[1]))
    return s, jnp.take_along_axis(idxs, sel, axis=1)


# ---------------------------------------------------------------------------
# Global-scale int8 scan: the fast path. One scalar scale for the whole DB
# means scores compare directly in the int32 domain — no f32 convert, no
# per-row scale multiply, no scale stream from HBM. Padded-tail masking only
# runs on the final grid step. Combined this roughly halves the VPU work per
# sub-block vs the per-row-scale kernel, which was the bottleneck once the
# DMA was overlapped (PERF_NOTES.md round-2 kernel push).
# ---------------------------------------------------------------------------

INT32_MIN = -(2**31) + 1


def int8_mm_bf16_ok(d: int) -> bool:
    """True when the bf16-upcast MXU matmul is BIT-EXACT for int8 operands
    of dimension d: every |product| <= 127^2 is exact in the f32 accumulator
    and |sum| <= d*127^2 must stay below 2^24 (f32 mantissa) — beyond that
    the 'exact int scores' claim silently becomes approximate."""
    return d * 127 * 127 < 2**24


def quantize_global_int8(
    x: jax.Array, *, clip_pct: float = 99.9
) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization with ONE global scale (clipped at the
    `clip_pct` percentile of per-row maxabs so a single outlier row cannot
    crush resolution for everyone). Returns (q [N,D] i8, scale f32 scalar).

    Ranking in the int32 score domain equals ranking of true inner products
    up to quantization error (the scale is a positive constant)."""
    xf = x.astype(jnp.float32)
    maxabs = jnp.max(jnp.abs(xf), axis=-1)
    # method="lower": linear interpolation between the clip-percentile row
    # and the NEXT one leaks an outlier's magnitude into the scale (a 1e4x
    # row dragged the scale ~10x at N=1000 even at the 99.9th percentile)
    clip = jnp.maximum(
        jnp.percentile(maxabs, clip_pct, method="lower"), 1e-9
    )
    scale = clip / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _binmax_kernel_int8gs(
    q_ref, db_ref, nrows_ref, vals_ref, steps_ref, *, nbins, chunk,
    mm_bf16=False,
):
    """Global-scale int8 grid step. Accumulators live in the int32 domain:
    vals [B, nbins] i32 running bin max, steps [B, nbins] i32 running
    sub-block id of that max (row = step * nbins + bin_column). Only grid
    steps whose chunk extends past `nrows` pay the padded-tail mask (a
    dynamic pl.when on the SMEM row count — so per-shard true row counts
    can be traced values under shard_map); every full chunk is just
    matmul + compare + two selects per sub-block.

    mm_bf16: upcast the int8 operands to bf16 and matmul at the bf16 MXU
    rate instead of the integer dot path. BIT-EXACT for int8 data: |x|<=127
    is exact in bf16 (8 significant bits), products <=127^2 are exact in the
    f32 MXU accumulator, and |sum| <= 768*127^2 = 12.4M < 2^24, so the f32
    result is the exact integer score and the final i32 cast is lossless."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, INT32_MIN)
        steps_ref[:] = jnp.full_like(steps_ref, -1)

    b = vals_ref.shape[0]
    sub = chunk // nbins

    def scores(j):
        blk = db_ref[j * nbins : (j + 1) * nbins, :]
        if mm_bf16:
            s = jax.lax.dot_general(
                q_ref[:].astype(jnp.bfloat16),
                blk.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return s.astype(jnp.int32)
        return jax.lax.dot_general(
            q_ref[:],
            blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def update(j, s):
        better = s > vals_ref[:]
        vals_ref[:] = jnp.where(better, s, vals_ref[:])
        step = i * sub + j
        steps_ref[:] = jnp.where(better, step, steps_ref[:])

    nrows = nrows_ref[0, 0]
    full = (i + 1) * chunk <= nrows  # this chunk is all real rows

    @pl.when(full)
    def _body():
        for j in range(sub):
            update(j, scores(j))

    @pl.when(jnp.logical_not(full))
    def _partial():
        col = jax.lax.broadcasted_iota(jnp.int32, (b, nbins), 1)
        for j in range(sub):
            s = scores(j)
            gid = (i * chunk + j * nbins) + col
            s = jnp.where(gid < nrows, s, INT32_MIN)
            update(j, s)


def binmax_partial_topk_int8gs(
    queries_i8: jax.Array,  # [B, D] int8 (pre-quantized)
    db_i8: jax.Array,  # [N, D] int8, global-scale quantized
    *,
    nbins: int = 1024,
    chunk: int = 8192,
    interpret: bool = False,
    ntotal: Optional[int] = None,
    mm_bf16: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Global-scale int8 partial top-k. Returns (vals [B,nbins] i32 raw
    int-domain scores, idxs [B,nbins] i32 global row ids, -1 = empty bin).

    `ntotal` (true row count, rows past it masked) may be a python int or a
    TRACED scalar — per-shard row counts under shard_map are traced.

    PERF: pre-pad the DB to a `chunk` multiple at BUILD time and pass
    `ntotal` = true row count. An unaligned DB forces a jnp.pad inside the
    jitted program, which copies the ENTIRE array every call — measured
    +2.2 ms/call at 1M x 768 int8, more than the 1.85 ms scan itself."""
    n, d = db_i8.shape
    b = queries_i8.shape[0]
    if chunk % nbins != 0:
        raise ValueError(f"chunk ({chunk}) must be a multiple of nbins ({nbins})")
    if mm_bf16 and not int8_mm_bf16_ok(d):
        # the kernel's bit-exactness argument needs d*127^2 < 2^24
        raise ValueError(
            f"mm_bf16 is exact only for d <= "
            f"{(1 << 24) // (127 * 127)}; got d={d} — use the int8 dot path"
        )
    b_pad = _round_up(max(b, 32), 32)  # int8 sublane tile is 32
    n_pad = _round_up(n, chunk)
    if b_pad != b:
        queries_i8 = jnp.pad(queries_i8, ((0, b_pad - b), (0, 0)))
    if n_pad != n:
        db_i8 = jnp.pad(db_i8, ((0, n_pad - n), (0, 0)))
    n_chunks = n_pad // chunk
    if ntotal is None:
        ntotal = n
    nrows = jnp.minimum(jnp.asarray(ntotal, jnp.int32), n).reshape(1, 1)

    kern = functools.partial(
        _binmax_kernel_int8gs, nbins=nbins, chunk=chunk, mm_bf16=mm_bf16,
    )
    vals, steps = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((b_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, nbins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, nbins), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, nbins), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, nbins), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d,
            bytes_accessed=n_pad * d + b_pad * d,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(queries_i8, db_i8, nrows)
    col = jax.lax.broadcasted_iota(jnp.int32, (b_pad, nbins), 1)
    idxs = jnp.where(steps >= 0, steps * nbins + col, -1)
    return vals[:b], idxs[:b]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "nbins", "chunk", "interpret", "rescore_k", "mm_bf16"
    ),
)
def fused_topk_int8gs(
    queries: jax.Array,  # [B, D] float — quantized internally
    db_i8: jax.Array,
    db_scale: jax.Array,  # scalar f32 (from quantize_global_int8)
    k: int,
    *,
    nbins: int = 1024,
    chunk: int = 8192,
    interpret: bool = False,
    rescore_db: Optional[jax.Array] = None,  # [N, D] full-precision rows
    rescore_k: int = 0,
    # true rows when db_i8 is chunk-padded; int or traced scalar (dynamic
    # operand so shard_map can pass per-shard row counts)
    ntotal: Optional[jax.typing.ArrayLike] = None,
    mm_bf16: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Global-scale quantized flat search: int8 scan (int32-domain compare)
    + top-k over the nbins survivors, with optional exact bf16 re-score of
    the top rescore_k candidates (recovers the quantization recall gap).
    Pre-pad db_i8 (and rescore_db) to a chunk multiple and pass ntotal —
    see binmax_partial_topk_int8gs's PERF note."""
    qf = queries.astype(jnp.float32)
    q_scale = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-9) / 127.0
    q_i8 = jnp.clip(jnp.round(qf / q_scale), -127, 127).astype(jnp.int8)
    vals_i, idxs = binmax_partial_topk_int8gs(
        q_i8, db_i8, nbins=nbins, chunk=chunk, interpret=interpret,
        ntotal=ntotal, mm_bf16=mm_bf16,
    )
    vals = jnp.where(
        idxs >= 0,
        vals_i.astype(jnp.float32) * (q_scale * db_scale),
        NEG_INF,
    )
    if rescore_db is not None and rescore_k > k:
        shortlist = min(rescore_k, vals.shape[1])
        _, sel = jax.lax.top_k(vals, shortlist)
        cand_ids = jnp.take_along_axis(idxs, sel, axis=1)  # [B, S]
        cand = jnp.take(rescore_db, jnp.clip(cand_ids, 0), axis=0)
        exact = jnp.einsum(
            "bsd,bd->bs", cand, queries.astype(cand.dtype),
            preferred_element_type=jnp.float32,
        )
        exact = jnp.where(cand_ids >= 0, exact, NEG_INF)
        s, sel2 = jax.lax.top_k(exact, min(k, shortlist))
        return s, jnp.take_along_axis(cand_ids, sel2, axis=1)
    s, sel = jax.lax.top_k(vals, min(k, vals.shape[1]))
    return s, jnp.take_along_axis(idxs, sel, axis=1)


# ---------------------------------------------------------------------------
# Sharded search: DB rows sharded over dp; local scan + all-gather merge.
# ---------------------------------------------------------------------------


def sharded_topk(
    ctx: MeshContext,
    queries: jax.Array,
    db_sharded: jax.Array,
    k: int,
    *,
    use_fused: bool = False,
    nbins: int = 512,
    chunk: int = 4096,
    metric: str = "ip",
    ntotal: Optional[int] = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Top-k over a dp-row-sharded database.

    Each dp shard scans its local rows (fused Pallas kernel on TPU, exact
    scan otherwise), then the tiny [dp*k] candidate sets are all-gathered
    over ICI and merged identically on every device — the collective-based
    replacement for the reference's HTTP fan-out (SURVEY.md section 2.6).

    `ntotal` is the true (unpadded) row count: rows appended for even
    sharding are masked to NEG_INF so a zero pad row can never displace a
    real (possibly negative-scoring) neighbor.
    """
    n_rows = db_sharded.shape[0]
    n_real = ntotal if ntotal is not None else n_rows
    dp = ctx.dp
    shard_rows = n_rows // dp
    if use_fused and metric != "ip":
        raise ValueError("fused sharded scan supports metric='ip' only")

    def local(q, db_local):
        if use_fused:
            s, i = fused_topk(
                q, db_local, k, nbins=nbins, chunk=chunk, interpret=interpret
            )
        else:
            s, i = exact_topk(
                q, db_local, k, chunk=min(chunk * 8, shard_rows), metric=metric
            )
        # lift local row ids to global ids; mask shard-padding rows
        shard = jax.lax.axis_index(DP_AXIS)
        i = i + shard * shard_rows
        s = jnp.where(i < n_real, s, NEG_INF)
        i = jnp.where(i < n_real, i, -1)
        s_all = jax.lax.all_gather(s, DP_AXIS, axis=1, tiled=True)  # [B, dp*k]
        i_all = jax.lax.all_gather(i, DP_AXIS, axis=1, tiled=True)
        ms, sel = jax.lax.top_k(s_all, k)
        return ms, jnp.take_along_axis(i_all, sel, axis=1)

    fn = shard_map(
        local,
        mesh=ctx.mesh,
        in_specs=(P(), P(DP_AXIS)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return fn(queries, db_sharded)


def sharded_topk_int8gs(
    ctx: MeshContext,
    queries: jax.Array,  # [B, D] float (replicated)
    db_i8_sharded: jax.Array,  # [N_pad, D] int8, rows over dp
    db_scale: jax.Array,  # scalar f32 (global quantization scale)
    k: int,
    *,
    rescore_db_sharded: Optional[jax.Array] = None,  # [N_pad, D] bf16, dp rows
    rescore_k: int = 0,
    nbins: int = 1024,
    chunk: int = 8192,
    ntotal: Optional[int] = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """dp-sharded global-scale int8 scan + per-shard bf16 rescore + all-gather
    merge — the sharded twin of fused_topk_int8gs (the headline index config,
    now also the FlatIndex int8 + mesh.dp>1 serving path).

    Each shard passes its own true row count into the kernel, so
    even-sharding pad rows (zero vectors, int8 score 0) are masked to
    INT32_MIN *inside* the bins and can never displace a real
    negative-scoring candidate. Pre-align shard row counts to a `chunk`
    multiple at build time (FlatIndex does) — an unaligned shard pays a
    whole-shard jnp.pad copy per call."""
    n_rows = db_i8_sharded.shape[0]
    n_real = ntotal if ntotal is not None else n_rows
    dp = ctx.dp
    shard_rows = n_rows // dp

    use_rescore = rescore_db_sharded is not None
    if not use_rescore:
        rescore_db_sharded = db_i8_sharded  # placeholder operand, unused

    def local(q, db_i8_local, rdb_local):
        shard = jax.lax.axis_index(DP_AXIS)
        # rows this shard actually owns (last shard carries the pad tail)
        local_rows = jnp.clip(n_real - shard * shard_rows, 0, shard_rows)
        s, i = fused_topk_int8gs(
            q, db_i8_local, db_scale, k,
            nbins=nbins, chunk=chunk, interpret=interpret,
            rescore_db=rdb_local if use_rescore else None,
            rescore_k=rescore_k if use_rescore else 0,
            ntotal=local_rows,
            # native s8xs8->s32 MXU dot: exact with no accumulator bound
            # and faster than the bf16 upcast at every measured batch
            # (round-3 PERF_NOTES "Native int8 MXU dot")
            mm_bf16=False,
        )
        valid = i >= 0  # empty bins / in-kernel-masked candidates stay -1
        gid = i + shard * shard_rows
        keep = valid & (gid < n_real)
        s = jnp.where(keep, s, NEG_INF)
        gid = jnp.where(keep, gid, -1)
        s_all = jax.lax.all_gather(s, DP_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(gid, DP_AXIS, axis=1, tiled=True)
        ms, sel = jax.lax.top_k(s_all, k)
        return ms, jnp.take_along_axis(i_all, sel, axis=1)

    fn = shard_map(
        local,
        mesh=ctx.mesh,
        in_specs=(P(), P(DP_AXIS), P(DP_AXIS)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return fn(queries, db_i8_sharded, rescore_db_sharded)
