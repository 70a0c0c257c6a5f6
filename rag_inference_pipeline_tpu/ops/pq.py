"""Product quantization on TPU: codebook training, encoding, ADC scans.

Replaces faiss IndexIVFPQ (reference enables IVFPQ precomputed tables at
faiss_store.py:96-100). TPU-first choices (SURVEY.md section 7.4 item 2):

- Codebook training is 256-way k-means per subspace, vmapped over all M
  subspaces at once — one fused XLA program instead of M CPU loops.
- ADC lookup uses a flattened (m, code) -> m*256+code index so the scan is
  a single `take_along_axis` gather per chunk from a [M*256] LUT per query
  (VPU-friendly), summed over subspaces.
- IVF-PQ uses residual encoding with the IP-metric identity
  score = q.c_probe + q.residual, so LUTs are per-query only (no
  per-(query, cluster) tables on the hot path); L2 adds the precomputed
  cluster-code cross terms, the analog of faiss's precomputed tables.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .kmeans import kmeans
from .topk import NEG_INF


def _split_subspaces(x: jax.Array, m: int) -> jax.Array:
    n, d = x.shape
    return x.reshape(n, m, d // m).transpose(1, 0, 2)  # [M, N, ds]


@functools.partial(jax.jit, static_argnames=("m", "iters", "ksub"))
def train_pq(
    key: jax.Array, x: jax.Array, m: int, *, iters: int = 12, ksub: int = 256
) -> jax.Array:
    """Train per-subspace codebooks. Returns [M, ksub, ds] f32.

    ksub=256 -> classic PQ8; ksub=16 -> PQ4, whose ADC scan maps onto the
    MXU as one-hot matmuls (Quick-ADC blocking, SURVEY.md section 7.4
    item 2) instead of VPU-hostile 256-entry gathers."""
    xs = _split_subspaces(x.astype(jnp.float32), m)
    keys = jax.random.split(key, m)

    def one(k_i, x_i):
        cb, _ = kmeans(k_i, x_i, ksub, iters=iters, chunk=16384)
        return cb

    return jax.vmap(one)(keys, xs)


@functools.partial(jax.jit, static_argnames=("chunk",))
def pq_encode(
    x: jax.Array, codebooks: jax.Array, *, chunk: int = 65536
) -> jax.Array:
    """Encode rows to PQ codes. Returns [N, M] uint8."""
    n, d = x.shape
    m, c, ds = codebooks.shape
    n_pad = ((n + chunk - 1) // chunk) * chunk
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0))) if n_pad != n else x
    cb = codebooks.astype(jnp.float32)
    cb_sq = jnp.sum(cb * cb, axis=-1)  # [M, 256]

    def body(_, xc):
        xs = xc.astype(jnp.float32).reshape(chunk, m, ds).transpose(1, 0, 2)
        s = 2.0 * jnp.einsum(
            "mnd,mcd->mnc", xs, cb, preferred_element_type=jnp.float32
        ) - cb_sq[:, None, :]
        return None, jnp.argmax(s, axis=-1).astype(jnp.uint8).T  # [chunk, M]

    _, codes = jax.lax.scan(body, None, xp.reshape(-1, chunk, d))
    return codes.reshape(-1, m)[:n]


def pq_decode(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Reconstruct vectors from codes: [N, M] -> [N, D] f32."""
    m = codes.shape[1]
    parts = codebooks[jnp.arange(m)[None, :], codes.astype(jnp.int32)]  # [N,M,ds]
    return parts.reshape(codes.shape[0], -1)


def pq_lut(queries: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Per-query IP lookup tables, flattened: [B, M*ksub] f32.

    lut[b, m*ksub + c] = q_b[sub m] . codebook[m, c]
    """
    b = queries.shape[0]
    m, ksub, ds = codebooks.shape
    qs = queries.astype(jnp.float32).reshape(b, m, ds)
    lut = jnp.einsum(
        "bmd,mcd->bmc", qs, codebooks.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return lut.reshape(b, m * ksub)


def adc_lookup_sum(
    lut_flat: jax.Array, codes: jax.Array, ksub: int = 256
) -> jax.Array:
    """ADC: sum LUT entries selected by codes.

    lut_flat [B, M*ksub]; codes [..., M] uint8 -> scores [B, ...] f32.
    """
    m = codes.shape[-1]
    lead = codes.shape[:-1]
    base = (jnp.arange(m, dtype=jnp.int32) * ksub)[None, :]
    idx = (codes.astype(jnp.int32).reshape(-1, m) + base).reshape(-1)  # [F*M]
    g = jnp.take(lut_flat, idx, axis=1)  # [B, F*M]
    return g.reshape(lut_flat.shape[0], *lead, m).sum(axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def pq_topk(
    queries: jax.Array,
    codes: jax.Array,
    codebooks: jax.Array,
    k: int,
    *,
    chunk: int = 32768,
) -> tuple[jax.Array, jax.Array]:
    """Flat PQ search (IP): chunked ADC scan with running top-k merge."""
    n, m = codes.shape
    b = queries.shape[0]
    k = min(k, n)
    chunk = min(chunk, n)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    cp = jnp.pad(codes, ((0, n_pad - n), (0, 0))) if n_pad != n else codes
    lut = pq_lut(queries, codebooks)

    def body(carry, i):
        bs, bi = carry
        cc = jax.lax.dynamic_slice_in_dim(cp, i * chunk, chunk, axis=0)
        s = adc_lookup_sum(lut, cc)  # [B, chunk]
        gids = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        s = jnp.where(gids < n, s, NEG_INF)
        cs, ci = jax.lax.top_k(s, k)
        cand_s = jnp.concatenate([bs, cs], axis=1)
        cand_i = jnp.concatenate([bi, gids[0][ci].astype(jnp.int32)], axis=1)
        ms, sel = jax.lax.top_k(cand_s, k)
        return (ms, jnp.take_along_axis(cand_i, sel, axis=1)), None

    init = (
        jnp.full((b, k), NEG_INF, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    (s, i), _ = jax.lax.scan(body, init, jnp.arange(n_pad // chunk))
    return s, i


# ---------------------------------------------------------------------------
# OPQ: learn an orthogonal rotation R that minimizes PQ reconstruction error
# (Ge et al.) — alternate PQ training in the rotated space with a Procrustes
# update (SVD on TPU). Queries rotate once before LUT construction; scores
# are preserved because R is orthogonal: q.x = (Rq).(Rx).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("m", "iters", "pq_iters", "ksub"))
def train_opq(
    key: jax.Array,
    x: jax.Array,  # [N, D] training sample
    m: int,
    *,
    iters: int = 5,
    pq_iters: int = 8,
    ksub: int = 256,
) -> tuple[jax.Array, jax.Array]:
    """Returns (R [D, D] orthogonal, codebooks [M, ksub, D/M])."""
    n, d = x.shape
    xf = x.astype(jnp.float32)
    r = jnp.eye(d, dtype=jnp.float32)
    keys = jax.random.split(key, iters)
    codebooks = None
    for it in range(iters):
        z = xf @ r
        codebooks = train_pq(keys[it], z, m, iters=pq_iters, ksub=ksub)
        recon = pq_decode(pq_encode(z, codebooks, chunk=min(65536, n)), codebooks)
        # Procrustes: R* = argmin ||xR - recon||_F = U V^T of x^T recon
        u, _, vt = jnp.linalg.svd(xf.T @ recon, full_matrices=False)
        r = u @ vt
    return r, codebooks


# ---------------------------------------------------------------------------
# PQ4 one-hot ADC: with 4-bit codes (ksub=16) the lookup-sum becomes a
# [C, M*16] one-hot x [M*16, B] MXU matmul — 16x less wasted compute than
# one-hot PQ8 and no gathers at all (the TPU answer to Quick-ADC).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def pq4_topk(
    queries: jax.Array,
    codes: jax.Array,  # [N, M] uint8 with values < 16
    codebooks: jax.Array,  # [M, 16, ds]
    k: int,
    *,
    chunk: int = 32768,
) -> tuple[jax.Array, jax.Array]:
    """Flat PQ4 search (IP): chunked one-hot-matmul ADC + running top-k."""
    n, m = codes.shape
    ksub = codebooks.shape[1]
    b = queries.shape[0]
    k = min(k, n)
    chunk = min(chunk, n)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    cp = jnp.pad(codes, ((0, n_pad - n), (0, 0))) if n_pad != n else codes
    lut = pq_lut(queries, codebooks)  # [B, M*ksub]
    # bf16 operands feed the MXU on TPU; CPU's dot lacks bf16 x bf16 -> f32
    adc_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    lut_t = lut.T.astype(adc_dtype)  # [M*ksub, B]

    def body(carry, i):
        bs, bi = carry
        cc = jax.lax.dynamic_slice_in_dim(cp, i * chunk, chunk, axis=0)
        # per-subspace one-hot [C, M, ksub] -> [C, M*ksub]: column block m
        # matches the lut layout (m*ksub + code)
        onehot = jax.nn.one_hot(cc, ksub, dtype=adc_dtype).reshape(
            chunk, m * ksub
        )
        s = jnp.dot(
            onehot, lut_t, preferred_element_type=jnp.float32
        ).T  # [B, C]
        gids = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        s = jnp.where(gids < n, s, NEG_INF)
        cs, ci = jax.lax.top_k(s, k)
        cand_s = jnp.concatenate([bs, cs], axis=1)
        cand_i = jnp.concatenate([bi, gids[0][ci].astype(jnp.int32)], axis=1)
        ms, sel = jax.lax.top_k(cand_s, k)
        return (ms, jnp.take_along_axis(cand_i, sel, axis=1)), None

    init = (
        jnp.full((b, k), NEG_INF, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    (s, i), _ = jax.lax.scan(body, init, jnp.arange(n_pad // chunk))
    return s, i


# ---------------------------------------------------------------------------
# IVF-PQ: coarse quantizer + residual PQ codes in the bucketed IVF layout.
# ---------------------------------------------------------------------------


class IVFPQListing(NamedTuple):
    centroids: jax.Array  # [nlist, D] f32
    codebooks: jax.Array  # [M, 256, ds] f32 (residual space)
    code_buckets: jax.Array  # [nlist, cap, M] uint8
    ids: jax.Array  # [nlist, cap] i32, -1 = padding
    list_sizes: jax.Array  # [nlist] i32


def build_ivfpq(
    key: jax.Array,
    x_host: np.ndarray,
    nlist: int,
    m: int,
    *,
    train_size: int = 131072,
    kmeans_iters: int = 15,
    pq_iters: int = 12,
    cap_factor: float = 2.5,
    seed: int = 0,
    ksub: int = 256,
) -> IVFPQListing:
    """IVF-PQ build: coarse k-means, residual PQ training, bucketed codes.

    ksub=256 -> PQ8 (gather-ADC search path); ksub=16 -> PQ4 whose code
    buckets are lane-padded so the one-hot MXU ADC kernel
    (ivfpq4_search_dedup) can stream them.
    """
    from .ivf import layout_inverted_lists
    from .kmeans import assign_clusters

    n, d = x_host.shape
    rng = np.random.default_rng(seed)
    sel = rng.choice(n, size=min(train_size, n), replace=False)
    kc, kp = jax.random.split(key)
    centroids, _ = kmeans(
        kc, jnp.asarray(x_host[sel], jnp.float32), nlist, iters=kmeans_iters
    )
    assignments = np.asarray(
        assign_clusters(jnp.asarray(x_host, jnp.float32), centroids)
    )
    cent_np = np.asarray(centroids)
    residuals = x_host.astype(np.float32) - cent_np[assignments]
    codebooks = train_pq(
        kp, jnp.asarray(residuals[sel[: min(train_size, n)]]), m,
        iters=pq_iters, ksub=ksub,
    )
    codes = np.asarray(pq_encode(jnp.asarray(residuals), codebooks))

    # id layout only — building full-precision vector buckets here would
    # upload GBs to HBM that IVF-PQ never uses
    ids_np, sizes_np = layout_inverted_lists(
        x_host, cent_np, assignments, cap_factor=cap_factor
    )
    cap = ids_np.shape[1]
    m_store = m
    if ksub == 16:
        # lane-pad M so Pallas bucket blocks [1, cap, m_store] tile cleanly;
        # padded subspaces encode 0 against zero codebooks -> contribute 0
        m_store = max(128, ((m + 127) // 128) * 128)
    code_buckets = np.zeros((nlist, cap, m_store), np.uint8)
    mask = ids_np >= 0
    code_buckets[mask, :m] = codes[ids_np[mask]]
    return IVFPQListing(
        centroids=jnp.asarray(cent_np, jnp.float32),
        codebooks=codebooks,
        code_buckets=jnp.asarray(code_buckets),
        ids=jnp.asarray(ids_np),
        list_sizes=jnp.asarray(sizes_np),
    )


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "probe_chunk"))
def ivfpq_search(
    listing: IVFPQListing,
    queries: jax.Array,
    k: int,
    *,
    nprobe: int = 64,
    probe_chunk: int = 8,
    coarse_floor: Optional[jax.Array] = None,  # [B, 1] min coarse score
) -> tuple[jax.Array, jax.Array]:
    """IVF-PQ search (IP metric, residual codes).

    score(q, x in list p) ~= q.centroid_p + ADC(q, residual codes). Probed
    lists are scored in `probe_chunk` blocks to bound the gather working set.
    Returns (scores [B,k] f32, ids [B,k] i32). `coarse_floor` drops probed
    lists below a caller-supplied coarse threshold — the sharded search
    passes the GLOBAL nprobe-th coarse score so each shard scans exactly
    its share of the global probe set (ops/pq.py::sharded_ivfpq_search).
    """
    nlist, cap, _m_store = listing.code_buckets.shape
    m = listing.codebooks.shape[0]  # _m_store may be lane-padded (PQ4)
    nprobe = min(nprobe, nlist)
    b = queries.shape[0]
    qf = queries.astype(jnp.float32)

    coarse = jnp.dot(
        qf, listing.centroids.T, preferred_element_type=jnp.float32
    )  # [B, nlist]
    coarse_s, probe = jax.lax.top_k(coarse, nprobe)  # both [B, nprobe]
    if coarse_floor is not None:
        coarse_s = jnp.where(coarse_s >= coarse_floor, coarse_s, NEG_INF)
    # pad the probe set up to a probe_chunk multiple (truncating would
    # silently drop the tail lists); padded columns repeat the last probe
    # with a NEG_INF coarse term so their candidates can never win
    pad = (-nprobe) % probe_chunk
    if pad:
        probe = jnp.concatenate([probe, jnp.repeat(probe[:, -1:], pad, 1)], 1)
        coarse_s = jnp.concatenate(
            [coarse_s, jnp.full((b, pad), NEG_INF, jnp.float32)], 1
        )
        nprobe += pad
    lut = pq_lut(qf, listing.codebooks)  # [B, M*256]

    k_eff = min(k, nprobe * cap)

    def body(carry, pi):
        bs, bi = carry
        pr = jax.lax.dynamic_slice_in_dim(probe, pi * probe_chunk, probe_chunk, 1)
        cs = jax.lax.dynamic_slice_in_dim(coarse_s, pi * probe_chunk, probe_chunk, 1)
        codes_g = listing.code_buckets[..., :m][pr]  # [B, pc, cap, M]
        ids_g = listing.ids[pr]  # [B, pc, cap]

        # batched ADC: each query gathers from its own LUT row
        ksub = listing.codebooks.shape[1]

        def one_query(lut_row, cg):
            base = (jnp.arange(m, dtype=jnp.int32) * ksub)[None, None, :]
            idx = cg.astype(jnp.int32) + base  # [pc, cap, M]
            return jnp.take(lut_row, idx.reshape(-1)).reshape(cg.shape).sum(-1)

        s = jax.vmap(one_query)(lut, codes_g)  # [B, pc, cap]
        s = s + cs[:, :, None]
        s = jnp.where(ids_g >= 0, s, NEG_INF)
        flat_s = s.reshape(b, probe_chunk * cap)
        flat_i = ids_g.reshape(b, probe_chunk * cap)
        csn, sel = jax.lax.top_k(flat_s, min(k_eff, flat_s.shape[1]))
        cand_s = jnp.concatenate([bs, csn], axis=1)
        cand_i = jnp.concatenate(
            [bi, jnp.take_along_axis(flat_i, sel, axis=1)], axis=1
        )
        ms, msel = jax.lax.top_k(cand_s, k_eff)
        return (ms, jnp.take_along_axis(cand_i, msel, axis=1)), None

    init = (
        jnp.full((b, k_eff), NEG_INF, jnp.float32),
        jnp.full((b, k_eff), -1, jnp.int32),
    )
    (s, i), _ = jax.lax.scan(body, init, jnp.arange(nprobe // probe_chunk))
    return s, i


# ---------------------------------------------------------------------------
# PQ4 one-hot MXU ADC, batch-deduped cluster-major (round 2, PERF_NOTES gap
# #3): the TPU has no vectorized VMEM gather, so 256-entry LUT lookups are
# hostile; with 4-bit codes the per-group lookup becomes TWO small matmuls —
#   (1) codes_g [cap, 8] @ S [8, 128] broadcasts each code value across its
#       16-lane field (S is a static 0/1 selection matrix),
#   (2) onehot(cap,128) = (broadcast == lane%16), then
#       lut_g [B, 128] x onehot^T accumulates scores on the MXU.
# Each unique probed bucket's codes stream HBM->VMEM exactly once per batch
# (scalar-prefetch slots, same dedup as ops.ivf.ivf_search_dedup); the
# one-hot never exists outside VMEM. This is the faiss "precomputed tables +
# SIMD scan" analog (reference faiss_store.py:96-100) rebuilt for the MXU.
# ---------------------------------------------------------------------------


def _adc4_cap_chunk(cap: int, b_pad: int) -> int:
    """Largest lane-aligned divisor of `cap` inside the VMEM-proven zone.

    The kernel's VMEM residency scales with the bucket-block rows (codes
    block + [rows, 128] broadcast/one-hot pair + [b_pad, rows] f32 out):
    cap 9472 fails Mosaic compile on v5e at b_pad=8 while 8576 passes, and
    the 10M ladder ran cap 6272 up to b_pad=32 — so buckets deeper than
    the zone stream in row-chunks over a second grid dim instead of
    hitting a hidden cap ceiling."""
    limit = 6144 if b_pad <= 32 else 3072
    if cap <= limit:
        return cap
    for c in range(limit - limit % 128, 127, -128):
        if cap % c == 0:
            return c
    return 128


def _adc4_kernel(slots_ref, lut_ref, codes_ref, out_ref, *, m, cap):
    """Grid step (s, c): ADC-score rows [c*cap, +cap) of unique bucket
    slots[s] for every query (`cap` here is the block row count — the
    full bucket when it fits VMEM, else a divisor chosen by
    _adc4_cap_chunk).

    lut_ref:   [b_pad, m*16]  bf16 per-query LUTs (VMEM-resident)
    codes_ref: [1, cap, m_store] uint8 PQ4 codes of this bucket block
    out_ref:   [1, b_pad, cap] f32 scores
    """
    del slots_ref
    b_pad = lut_ref.shape[0]
    codes = codes_ref[0]  # [cap, m_store]
    # static selection matrix S[s, c] = 1 if c // 16 == s  (8 subspaces ->
    # 128 lanes); and the lane value pattern c % 16
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sel = (row8 == col128 // 16).astype(jnp.float32)
    vals = (
        jax.lax.broadcasted_iota(jnp.int32, (cap, 128), 1) % 16
    )
    acc = jnp.zeros((b_pad, cap), jnp.float32)
    for g in range(m // 8):
        # Mosaic cannot lower uint8 -> bfloat16 directly (hardware-only
        # failure; interpret mode accepted it) — hop through int32/f32.
        # Values are 4-bit codes, exact in every dtype on this path.
        cg = (
            codes[:, g * 8 : (g + 1) * 8].astype(jnp.int32)
            .astype(jnp.float32)
        )  # [cap, 8]
        bcast = jnp.dot(cg, sel, preferred_element_type=jnp.float32)
        onehot = (
            (bcast == vals.astype(jnp.float32))
            .astype(jnp.float32)  # bool->bf16 also has no direct lowering
            .astype(jnp.bfloat16)
        )
        lut_g = lut_ref[:, g * 128 : (g + 1) * 128]  # [b_pad, 128]
        acc = acc + jax.lax.dot_general(
            lut_g,
            onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc[None]


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "max_slots", "interpret", "cap_block"),
)
def ivfpq4_search_dedup(
    listing: IVFPQListing,
    queries: jax.Array,
    k: int,
    *,
    nprobe: int = 64,
    max_slots: int = 0,
    interpret: bool = False,
    cap_block: int = 0,  # 0 = auto (_adc4_cap_chunk); tests force small
    coarse_floor: Optional[jax.Array] = None,  # [B, 1] min coarse score
) -> tuple[jax.Array, jax.Array]:
    """IVF-PQ4 search (IP, residual codes) with the one-hot MXU ADC kernel.

    Requires a listing built with ksub=16 (PQ4). Returns
    (scores [B,k] f32, ids [B,k] i32). Scores are coarse + residual-ADC
    approximations; callers wanting exactness re-score survivors.
    `coarse_floor` drops probed lists below a caller-supplied coarse
    threshold (global probe selection in the sharded search).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .ivf import dedup_probes

    nlist, cap, m_store = listing.code_buckets.shape
    m, ksub, _ = listing.codebooks.shape
    if ksub != 16:
        raise ValueError("ivfpq4_search_dedup requires a PQ4 (ksub=16) listing")
    if m % 8:
        raise ValueError("PQ4 ADC kernel needs m % 8 == 0")
    nprobe = min(nprobe, nlist)
    b = queries.shape[0]
    b_pad = ((max(b, 8) + 7) // 8) * 8
    n_slots = max_slots or min(nlist, b * nprobe)
    n_slots = min(n_slots, nlist)
    qf = queries.astype(jnp.float32)

    coarse = jnp.dot(
        qf, listing.centroids.T, preferred_element_type=jnp.float32
    )
    coarse_s, probe = jax.lax.top_k(coarse, nprobe)
    slots, member = dedup_probes(probe.astype(jnp.int32), nlist, n_slots)

    lut = pq_lut(qf, listing.codebooks)  # [B, m*16]
    if b_pad != b:
        lut = jnp.pad(lut, ((0, b_pad - b), (0, 0)))
    lut = lut.astype(jnp.bfloat16)

    cblk = cap_block or _adc4_cap_chunk(cap, b_pad)
    if cap % cblk:
        raise ValueError(f"cap_block {cblk} must divide cap {cap}")
    kern = functools.partial(_adc4_kernel, m=m, cap=cblk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_slots, cap // cblk),
        in_specs=[
            pl.BlockSpec((b_pad, m * 16), lambda s, c, slots: (0, 0)),
            pl.BlockSpec(
                (1, cblk, m_store), lambda s, c, slots: (slots[s], c, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, b_pad, cblk), lambda s, c, slots: (s, 0, c)
        ),
    )
    scores = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slots, b_pad, cap), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_slots * cap * m * 16,
            bytes_accessed=n_slots * cap * m_store,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(slots, lut, listing.code_buckets)

    ids_g = listing.ids[slots]  # [n_slots, cap]
    # residual identity: score = q . centroid_probe + q . residual
    coarse_term = jnp.take_along_axis(
        coarse, jnp.broadcast_to(slots[None, :], (b, n_slots)), axis=1
    )  # [B, n_slots]
    s_bq = jnp.transpose(scores[:, :b, :], (1, 0, 2))  # [B, n_slots, cap]
    s_bq = s_bq + coarse_term[:, :, None]
    if coarse_floor is not None:
        member = member & (coarse_term >= coarse_floor)
    valid = member[:, :, None] & (ids_g >= 0)[None]
    s_bq = jnp.where(valid, s_bq, NEG_INF)
    flat_s = s_bq.reshape(b, n_slots * cap)
    flat_i = jnp.broadcast_to(
        ids_g.reshape(1, n_slots * cap), (b, n_slots * cap)
    )
    k_eff = min(k, n_slots * cap)
    top_s, sel = jax.lax.top_k(flat_s, k_eff)
    return top_s, jnp.take_along_axis(flat_i, sel, axis=1)


# ---------------------------------------------------------------------------
# dp-sharded IVF-PQ: code buckets sharded over the mesh's dp axis.
# ---------------------------------------------------------------------------


def shard_ivfpq_listing(ctx, listing: IVFPQListing) -> IVFPQListing:
    """Place an IVF-PQ listing with its lists sharded over dp.

    Per-list tensors (centroids, code_buckets, ids, list_sizes) shard on
    dim 0; codebooks replicate (tiny). PQ4 at 10M x 768 is ~3.3 GB of
    codes incl. bucket padding — dp=4 brings the per-chip share under
    1 GB next to a model (SURVEY.md section 2.6 capacity axis)."""
    nlist = listing.code_buckets.shape[0]
    if nlist % ctx.dp != 0:
        raise ValueError(
            f"nlist ({nlist}) must be divisible by mesh dp ({ctx.dp})"
        )
    rows = ctx.rows_dp
    return IVFPQListing(
        centroids=ctx.put(listing.centroids, rows),
        codebooks=ctx.put(listing.codebooks),
        code_buckets=ctx.put(listing.code_buckets, rows),
        ids=ctx.put(listing.ids, rows),
        list_sizes=ctx.put(listing.list_sizes, rows),
    )


def sharded_ivfpq_search(
    ctx,
    listing: IVFPQListing,
    queries: jax.Array,
    k: int,
    *,
    nprobe: int = 64,
    nprobe_local: int = 0,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """IVF-PQ search over dp-sharded lists (distributed-faiss shape).

    Probe selection is GLOBAL, as in ops/ivf.py::sharded_ivf_search: the
    per-shard coarse scores all-gather into the full [B, nlist] table (KBs
    over ICI), every shard derives the same global top-nprobe threshold,
    and its local ADC (PQ4 one-hot MXU kernel for ksub=16, gather-ADC
    otherwise) drops owned lists below it via `coarse_floor` — so the
    scanned union matches the unsharded search by construction (round-3
    VERDICT #7). `nprobe_local` is the per-shard scan-slot budget
    (default 2*ceil(nprobe/dp) — the measured exactness point: at the
    1x work-parity share a shard owning more global winners than slots
    drops the tail and loses recall, from 2x the sharded ranking was
    exactly the unsharded one at every tested budget,
    artifacts/round4/ivf_sharded_parity.json). Per-shard top-k
    candidate sets all-gather + merge identically on every device.
    Stored ids are global. Exact re-score of the merged shortlist is the
    caller's job (index/ivf_pq.py) — rescore vectors do not shard with
    the lists.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..core.mesh import DP_AXIS

    dp = ctx.dp
    if nprobe_local <= 0:
        # 2x the balanced share: measured exact-parity default (see above)
        nprobe_local = max(1, 2 * -(-nprobe // dp))
    nlist = listing.code_buckets.shape[0]
    nprobe_local = min(nprobe_local, nlist // dp)
    nprobe_eff = min(nprobe, nlist)
    ksub = listing.codebooks.shape[1]

    def local(q, cents, cbooks, cbuckets, ids, sizes):
        loc = IVFPQListing(
            centroids=cents, codebooks=cbooks, code_buckets=cbuckets,
            ids=ids, list_sizes=sizes,
        )
        coarse_l = jnp.dot(q, cents.T, preferred_element_type=jnp.float32)
        coarse_g = jax.lax.all_gather(coarse_l, DP_AXIS, axis=1, tiled=True)
        tvals, _ = jax.lax.top_k(coarse_g, nprobe_eff)
        floor = tvals[:, -1:]  # [B, 1] global nprobe-th coarse score
        if ksub == 16:
            s, i = ivfpq4_search_dedup(
                loc, q, k, nprobe=nprobe_local, interpret=interpret,
                coarse_floor=floor,
            )
        else:
            s, i = ivfpq_search(
                loc, q, k, nprobe=nprobe_local, coarse_floor=floor
            )
        if s.shape[1] < k:
            pad = k - s.shape[1]
            s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            i = jnp.pad(i, ((0, 0), (0, pad)), constant_values=-1)
        s = jnp.where(i >= 0, s, -jnp.inf)
        s_all = jax.lax.all_gather(s, DP_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, DP_AXIS, axis=1, tiled=True)
        ms, sel = jax.lax.top_k(s_all, k)
        return ms, jnp.take_along_axis(i_all, sel, axis=1)

    fn = shard_map(
        local,
        mesh=ctx.mesh,
        in_specs=(
            P(), P(DP_AXIS), P(), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS),
        ),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return fn(
        queries.astype(jnp.float32),
        listing.centroids,
        listing.codebooks,
        listing.code_buckets,
        listing.ids,
        listing.list_sizes,
    )


# ---------------------------------------------------------------------------
# Flat residual-PQ rescore tier: the >=30M single-chip companion to IVF-PQ4.
# At 30M x 768 the exact rescore copies stop fitting next to the code
# buckets (int8 = 23 GB, bf16 = 46 GB; HBM = 16 GB), but flat residual-PQ8
# codes are N x m bytes (2.9 GB at m=96) — enough precision to re-rank the
# PQ4 ADC shortlist back toward the recall floor. faiss's analog is
# IndexRefine over a second, finer quantizer (reference outsources refine
# entirely to faiss: faiss_store.py:96-100).
# ---------------------------------------------------------------------------


class PQFlatTier(NamedTuple):
    """Row-id-addressed residual-PQ codes for shortlist rescoring.

    Shares the coarse centroids with the IVF listing it refines (same
    k-means, same assignment), so score reconstruction is the residual
    identity: score(q, id) = q . centroid[assign[id]] + ADC(q, codes[id]).
    Stays replicated under dp-sharded listings — shortlist ids are global.
    """

    centroids: jax.Array  # [nlist, D] f32 (replicated copy, ~25 MB)
    codebooks: jax.Array  # [M, ksub, ds] f32, residual space
    codes: jax.Array  # [N, M] uint8
    assign: jax.Array  # [N] i32 coarse list of each row


def build_pq_tier(
    key: jax.Array,
    x_host: np.ndarray,
    centroids: jax.Array,
    m: int,
    *,
    train_size: int = 131072,
    pq_iters: int = 12,
    seed: int = 0,
    ksub: int = 256,
    encode_chunk: int = 1_048_576,
) -> PQFlatTier:
    """Train + encode a flat residual-PQ tier against existing centroids.

    Encoding streams `encode_chunk` rows at a time so the f32 residual
    transient stays bounded next to whatever already lives in HBM.
    """
    from .kmeans import assign_clusters

    n, _d = x_host.shape
    cent = jnp.asarray(centroids, jnp.float32)
    rng = np.random.default_rng(seed)
    sel = rng.choice(n, size=min(train_size, n), replace=False)
    xs = jnp.asarray(x_host[sel], jnp.float32)
    res_train = xs - cent[assign_clusters(xs, cent)]
    codebooks = train_pq(key, res_train, m, iters=pq_iters, ksub=ksub)

    codes = np.empty((n, m), np.uint8)
    assign = np.empty(n, np.int32)
    for lo in range(0, n, encode_chunk):
        xc = jnp.asarray(x_host[lo : lo + encode_chunk], jnp.float32)
        a = assign_clusters(xc, cent)
        codes[lo : lo + encode_chunk] = np.asarray(
            pq_encode(xc - cent[a], codebooks)
        )
        assign[lo : lo + encode_chunk] = np.asarray(a)
    return PQFlatTier(
        centroids=cent,
        codebooks=codebooks,
        codes=jnp.asarray(codes),
        assign=jnp.asarray(assign),
    )


@jax.jit
def pq_rescore_flat(
    queries: jax.Array, ids: jax.Array, tier: PQFlatTier
) -> jax.Array:
    """Re-score shortlist ids against a flat residual-PQ tier.

    queries [B, D]; ids [B, S] i32 (-1 = invalid) -> scores [B, S] f32,
    NEG_INF at invalid slots. score = q.centroid[assign[id]] + residual
    ADC — the same identity the ADC search path uses, at the tier's
    (finer) code precision.
    """
    qf = queries.astype(jnp.float32)
    b, s = ids.shape
    m, ksub, _ds = tier.codebooks.shape
    safe = jnp.clip(ids, 0)
    codes_g = jnp.take(tier.codes, safe, axis=0)  # [B, S, M]
    a_g = jnp.take(tier.assign, safe, axis=0)  # [B, S]
    coarse = jnp.dot(
        qf, tier.centroids.T, preferred_element_type=jnp.float32
    )  # [B, nlist]
    coarse_term = jnp.take_along_axis(coarse, a_g, axis=1)  # [B, S]
    lut = pq_lut(qf, tier.codebooks)  # [B, M*ksub]
    base = (jnp.arange(m, dtype=jnp.int32) * ksub)[None, None, :]
    idx = codes_g.astype(jnp.int32) + base  # [B, S, M]

    def one_query(lut_row, idx_row):
        return jnp.take(lut_row, idx_row.reshape(-1)).reshape(s, m).sum(-1)

    adc = jax.vmap(one_query)(lut, idx)  # [B, S]
    return jnp.where(ids >= 0, coarse_term + adc, NEG_INF)


def pq_tier_rescore_topk(
    queries: jax.Array,
    adc_scores: jax.Array,
    ids: jax.Array,
    tier: PQFlatTier,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Shortlist (from any ADC search) -> tier-rescored top-k."""
    del adc_scores  # replaced entirely by the finer reconstruction
    scores = pq_rescore_flat(queries, ids, tier)
    top_s, sel = jax.lax.top_k(scores, min(k, scores.shape[1]))
    return top_s, jnp.take_along_axis(ids, sel, axis=1)


class Int4ResidualTier(NamedTuple):
    """Row-id-addressed int4 residual store for shortlist rescoring.

    The HBM tier between pq8 and the host stores (round-3 VERDICT #6).
    Measured precision ladder on the tight-cluster fixture (score-error
    std, d=64, sigma_r=0.15): exact-bf16 2e-4 < int8-resid-row 1e-4 <
    int8-full-global 1.1e-3 (the host_int8 tier, 0.958 recall@30M) <
    int4-resid-row 2.0e-3 << pq8 (2 bits/dim). So int4 at 0.5 byte/dim
    re-ranks a shade under the 1-byte/dim host_int8 tier — REFUTING the
    round-3 hypothesis that 4 bits/dim suffices for exact-level near-tie
    ranking (that needs ~6+; amax-clip sweeps measured strictly worse, so
    this is the 4-bit wall, not a quantizer artifact).

    Measured recall@10 band (tests/test_int4_tier.py): ~0.78 on the
    tight-cluster fixture, ~0.85 on the realistic spread-0.7 corpus
    where exact scores 0.98 ON THE SAME BUILD — geometry barely helps,
    because score gaps and reconstruction error BOTH scale with the
    residual magnitude. Treat int4 as a mid-0.8s ranking tier (pq8 ~0.5
    < int4 ~0.85 < host_int8 0.958 < host_f16 ~exact), never a
    near-exact one.

    Cost: D/2 bytes + 6 B (assign + f16 row scale) per row = 390 B at
    D=768. The tier alone is 11.7 GB at 30M rows, but it rides NEXT TO
    the PQ4 listing that produces the shortlist (~cap_factor x 128 B/row
    = 320 B at cap 2.5): ~710 B/row all-in, so the honest zero-host-
    store single-chip ceiling is ~20M rows at cap 2.5 (~24M at 1.5) on
    16 GB — not the tier-only 30M the round-4 note implied.

    Layout: residual r = x - centroid[assign] quantized symmetrically at
    4 bits with a PER-ROW scale (one f16/row is free next to 384 B of
    codes and beats a global scale by the row-amax spread), two codes per
    byte (even dim -> low nibble). Stays replicated under dp-sharded
    listings — shortlist ids are global.

    Reference analog: faiss refine-from-storage with a scalar-quantized
    refine index (reference faiss_store.py:96-100 precomputed-table tier).
    """

    centroids: jax.Array  # [nlist, D] f32 (replicated, ~12 MB at 4096)
    codes: jax.Array  # [N, D//2] uint8, two int4 residual codes per byte
    row_scale: jax.Array  # [N] f16 per-row dequant scale
    assign: jax.Array  # [N] i32 coarse list of each row


def build_int4_tier(
    x_host: np.ndarray,
    centroids: jax.Array,
    *,
    encode_chunk: int = 1_048_576,
) -> Int4ResidualTier:
    """Encode x as int4 residuals against existing coarse centroids.

    Streams `encode_chunk` rows so the f32 residual transient stays
    bounded next to whatever already lives in HBM.
    """
    from .kmeans import assign_clusters

    n, d = x_host.shape
    if d % 2 != 0:
        raise ValueError(f"int4 tier requires even dim, got {d}")
    cent = jnp.asarray(centroids, jnp.float32)

    @jax.jit
    def encode(xc):
        a = assign_clusters(xc, cent)
        r = xc - cent[a]
        amax = jnp.max(jnp.abs(r), axis=1)
        scale = jnp.maximum(amax / 7.0, 1e-8)
        q = jnp.clip(jnp.round(r / scale[:, None]), -8, 7).astype(jnp.int32)
        u = (q + 8).astype(jnp.uint8)
        packed = u[:, 0::2] | (u[:, 1::2] << 4)
        return a, packed, scale.astype(jnp.float16)

    codes = np.empty((n, d // 2), np.uint8)
    assign = np.empty(n, np.int32)
    row_scale = np.empty(n, np.float16)
    for lo in range(0, n, encode_chunk):
        xc = jnp.asarray(x_host[lo : lo + encode_chunk], jnp.float32)
        a, packed, scale = encode(xc)
        assign[lo : lo + encode_chunk] = np.asarray(a)
        codes[lo : lo + encode_chunk] = np.asarray(packed)
        row_scale[lo : lo + encode_chunk] = np.asarray(scale)
    return Int4ResidualTier(
        centroids=cent,
        codes=jnp.asarray(codes),
        row_scale=jnp.asarray(row_scale),
        assign=jnp.asarray(assign),
    )


@jax.jit
def int4_rescore_flat(
    queries: jax.Array, ids: jax.Array, tier: Int4ResidualTier
) -> jax.Array:
    """Re-score shortlist ids against the int4 residual tier.

    queries [B, D]; ids [B, S] i32 (-1 = invalid) -> scores [B, S] f32.
    score = q . centroid[assign[id]]  (exact, from the replicated f32
    centroids) + q . dequant(codes[id])  (int4 residual term) — the same
    reconstruction identity as the PQ tier at 2x the bits/dim.
    """
    qf = queries.astype(jnp.float32)
    b, s = ids.shape
    safe = jnp.clip(ids, 0)
    codes_g = jnp.take(tier.codes, safe, axis=0)  # [B, S, D/2] u8
    a_g = jnp.take(tier.assign, safe, axis=0)  # [B, S]
    scale_g = jnp.take(tier.row_scale, safe, axis=0).astype(jnp.float32)
    coarse = jnp.dot(
        qf, tier.centroids.T, preferred_element_type=jnp.float32
    )  # [B, nlist]
    coarse_term = jnp.take_along_axis(coarse, a_g, axis=1)  # [B, S]
    low = (codes_g & jnp.uint8(0x0F)).astype(jnp.int32) - 8
    high = (codes_g >> 4).astype(jnp.int32) - 8
    # (dim 2i -> low nibble, 2i+1 -> high) — inverse of build's packing
    r_q = jnp.stack([low, high], axis=-1).reshape(b, s, -1)
    resid_term = (
        jnp.einsum(
            "bsd,bd->bs",
            r_q.astype(jnp.bfloat16),
            queries.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        * scale_g
    )
    return jnp.where(ids >= 0, coarse_term + resid_term, NEG_INF)


def int4_tier_rescore_topk(
    queries: jax.Array,
    adc_scores: jax.Array,
    ids: jax.Array,
    tier: Int4ResidualTier,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Shortlist (from any ADC search) -> int4-tier-rescored top-k."""
    del adc_scores  # replaced entirely by the finer reconstruction
    scores = int4_rescore_flat(queries, ids, tier)
    top_s, sel = jax.lax.top_k(scores, min(k, scores.shape[1]))
    return top_s, jnp.take_along_axis(ids, sel, axis=1)
