#!/usr/bin/env python
"""Ablation ladder for the fused scan kernel: find where the bandwidth goes.

Each stage adds one component; the deltas attribute the cost:
  A. DMA-only stream (sum-reduce each chunk)         -> raw pipeline ceiling
  B. + matmul (max-score only, no ids)               -> MXU cost
  C. + bin update (compare + 2 selects, ids)         -> VPU update cost
  D. C with scratch accumulators (outputs written once at end)
  E. full fused_topk_int8 (D + final lax.top_k)      -> XLA tail cost
  F. E + rescore64                                   -> gather/rescore cost
"""

from __future__ import annotations

import argparse
import functools
import os
import time

os.environ.pop("JAX_PLATFORMS", None)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_inference_pipeline_tpu.ops.topk import NEG_INF, fused_topk_int8

CP = pltpu.CompilerParams(dimension_semantics=("arbitrary",))


def kern_dma_only(db_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # touch every byte: int8 sum onto an [8,128] accumulator
    x = db_ref[:].astype(jnp.int32)
    out_ref[:] += jnp.sum(x.reshape(-1, 8, 128 * 6), axis=0)[:, :128]


def kern_matmul_max(q_ref, db_ref, out_ref, *, nbins, chunk):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, NEG_INF)

    for j in range(chunk // nbins):
        s = jax.lax.dot_general(
            q_ref[:], db_ref[j * nbins:(j + 1) * nbins, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        out_ref[:] = jnp.maximum(out_ref[:], s)


def kern_binmax_scratch(
    q_ref, db_ref, nrows_ref, vals_ref, idxs_ref, acc_v, acc_i, *, nbins, chunk
):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_v[:] = jnp.full_like(acc_v, NEG_INF)
        acc_i[:] = jnp.full_like(acc_i, -1)

    b = acc_v.shape[0]
    nrows = nrows_ref[0, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, nbins), 1)
    for j in range(chunk // nbins):
        s = jax.lax.dot_general(
            q_ref[:], db_ref[j * nbins:(j + 1) * nbins, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        gid = (i * chunk + j * nbins) + col
        s = jnp.where(gid < nrows, s, NEG_INF)
        better = s > acc_v[:]
        acc_v[:] = jnp.where(better, s, acc_v[:])
        acc_i[:] = jnp.where(better, gid, acc_i[:])

    @pl.when(i == n - 1)
    def _():
        vals_ref[:] = acc_v[:]
        idxs_ref[:] = acc_i[:]


def bench(name, fn, inputs, rounds=3):
    out = fn(inputs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for _ in range(rounds):
        for q in inputs:
            outs.append(fn(q))
    jax.block_until_ready(outs[-1])
    ms = (time.perf_counter() - t0) / (rounds * len(inputs)) * 1e3
    print(f"{name:52s} {ms:8.3f} ms")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--nbins", type=int, default=2048)
    ap.add_argument("--stages", default="ABCDEF")
    args = ap.parse_args()
    n, b, d, chunk, nbins = args.n, args.b, 768, args.chunk, args.nbins

    rng = np.random.default_rng(0)
    db = rng.standard_normal((n, d), dtype=np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    maxabs = np.maximum(np.abs(db).max(axis=1), 1e-9)
    scales = (maxabs / 127.0).astype(np.float32)
    db_i8 = np.clip(np.round(db / scales[:, None]), -127, 127).astype(np.int8)
    d_db_i8 = jax.device_put(jnp.asarray(db_i8))
    d_db_bf16 = jax.device_put(jnp.asarray(db, jnp.bfloat16))
    d_scales = jax.device_put(jnp.asarray(scales))
    qs = rng.standard_normal((8, b, d), dtype=np.float32)
    qs /= np.linalg.norm(qs, axis=2, keepdims=True)
    q_f = [jax.device_put(jnp.asarray(q)) for q in qs]
    q_i8 = [
        jax.device_put(
            jnp.clip(jnp.round(jnp.asarray(q) * 127), -127, 127).astype(jnp.int8)
        )
        for q in qs
    ]
    n_chunks = n // chunk
    nrows = jnp.array([[n]], jnp.int32)

    print(f"n={n} b={b} chunk={chunk} nbins={nbins}  "
          f"int8 SoL={n*d/819e9*1e3:.2f} ms")

    stages = set(args.stages.upper())

    # A: DMA only
    a_fn = jax.jit(lambda db: pl.pallas_call(
        kern_dma_only,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((chunk, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        compiler_params=CP,
    )(db))
    if "A" in stages:
        bench("A: DMA-only int8 stream", lambda q: a_fn(d_db_i8), q_i8)

    # B: + matmul max
    kb = functools.partial(kern_matmul_max, nbins=nbins, chunk=chunk)
    b_fn = jax.jit(lambda q: pl.pallas_call(
        kb,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, nbins), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nbins), jnp.float32),
        compiler_params=CP,
    )(q, d_db_i8))
    if "B" in stages:
        bench("B: + int8 matmul, running max", b_fn, q_i8)

    # C: current in-output accumulator binmax (via public API, no topk tail)
    from rag_inference_pipeline_tpu.ops.topk import binmax_partial_topk_int8
    c_fn = jax.jit(lambda q: binmax_partial_topk_int8(
        q, d_db_i8, d_scales, nbins=nbins, chunk=chunk))
    if "C" in stages:
        bench("C: full binmax (output accumulators)", c_fn, q_i8)

    # D: scratch accumulators
    kd = functools.partial(kern_binmax_scratch, nbins=nbins, chunk=chunk)
    d_fn = jax.jit(lambda q: pl.pallas_call(
        kd,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, nbins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, nbins), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nbins), jnp.float32),
            jax.ShapeDtypeStruct((b, nbins), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, nbins), jnp.float32),
            pltpu.VMEM((b, nbins), jnp.int32),
        ],
        compiler_params=CP,
    )(q, d_db_i8, nrows))
    if "D" in stages:
        bench("D: binmax w/ scratch accumulators", d_fn, q_i8)

    # E: full fused (no rescore)
    e_fn = lambda q: fused_topk_int8(
        q, d_db_i8, d_scales, 10, nbins=nbins, chunk=chunk)
    if "E" in stages:
        bench("E: fused_topk_int8 (no rescore)", e_fn, q_f)

    # F: + rescore
    f_fn = lambda q: fused_topk_int8(
        q, d_db_i8, d_scales, 10, nbins=nbins, chunk=chunk,
        rescore_db=d_db_bf16, rescore_k=64)
    if "F" in stages:
        bench("F: fused_topk_int8 + rescore64", f_fn, q_f)


if __name__ == "__main__":
    main()
