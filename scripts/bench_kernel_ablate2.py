#!/usr/bin/env python
"""Round-2 ablation: is the 4.1 ms int8 scan DMA-bound or MXU-bound?

Variants at 1M x 768, B=128:
  A. pure-stream int8: kernel only reads DB chunks, one max per chunk
     -> effective HBM GB/s ceiling for this grid shape
  B. pure-stream bf16 (2x bytes)
  C. int8 DB, convert-to-bf16 + bf16 matmul binmax (tests the "int8
     dot_general runs at f32 rate" hypothesis)
  D. MXU-only: same matmul shapes looped over a VMEM-resident block, no
     HBM stream -> raw matmul rate for int8->int32 vs bf16->f32
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


def bench(name, fn, inputs, rounds=1, inner=None):
    # EVERY call must see a distinct input — the axon tunnel dedupes
    # identical (executable, args) calls and reports impossible rates
    # (PERF_NOTES.md "Measurement reliability")
    inner = inner or len(inputs)
    out = fn(inputs[-1])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for r in range(rounds):
        for i in range(inner):
            outs.append(fn(inputs[(r * inner + i) % len(inputs)]))
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / (rounds * inner) * 1e3
    print(f"{name:52s} {ms:9.3f} ms", flush=True)
    return ms


def stream_kernel(q_ref, db_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = q_ref[:].astype(jnp.int32)  # varying input -> no dedup

    # the BlockSpec DMA streams the whole chunk HBM->VMEM regardless of what
    # compute reads; touch only a corner so VPU cost ~ 0 (pure-DMA probe)
    out_ref[:] = out_ref[:] + db_ref[0:8, 0:128].astype(jnp.int32)


def make_stream(db, chunk):
    n, d = db.shape
    grid = (n // chunk,)
    return pl.pallas_call(
        stream_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )


def binmax_bf16conv_kernel(q_ref, db_ref, vals_ref, idxs_ref, *, nbins, chunk):
    """int8 DB streamed, converted to bf16 in VMEM, bf16 matmul."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        vals_ref[:] = jnp.full_like(vals_ref, -3.0e38)
        idxs_ref[:] = jnp.full_like(idxs_ref, -1)

    sub = chunk // nbins
    for j in range(sub):
        blk = db_ref[j * nbins : (j + 1) * nbins, :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q_ref[:], blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        better = s > vals_ref[:]
        vals_ref[:] = jnp.where(better, s, vals_ref[:])
        idxs_ref[:] = jnp.where(better, i * sub + j, idxs_ref[:])


def make_bf16conv(q, db_i8, nbins, chunk):
    n, d = db_i8.shape
    b = q.shape[0]
    kern = functools.partial(binmax_bf16conv_kernel, nbins=nbins, chunk=chunk)
    call = pl.pallas_call(
        kern,
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, nbins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, nbins), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nbins), jnp.float32),
            jax.ShapeDtypeStruct((b, nbins), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )
    return call


def mxu_loop_kernel(q_ref, blk_ref, out_ref, *, reps, out_dtype):
    acc = jnp.zeros(out_ref.shape, out_dtype)
    for r in range(reps):
        acc = acc + jax.lax.dot_general(
            q_ref[:], blk_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=out_dtype,
        )
    out_ref[:] = acc


def make_mxu(q, blk, reps, out_dtype):
    b, d = q.shape
    nb = blk.shape[0]
    kern = functools.partial(mxu_loop_kernel, reps=reps, out_dtype=out_dtype)
    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nb), out_dtype),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--d", type=int, default=768)
    args = ap.parse_args()
    n, b, d = args.n, args.b, args.d

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    db8 = rng.integers(-127, 127, (n, d), dtype=np.int8)
    d_db8 = jax.device_put(jnp.asarray(db8))
    d_db16 = jax.device_put(jnp.asarray(db8, jnp.bfloat16))
    qs8 = [jax.device_put(jnp.asarray(
        rng.integers(-127, 127, (b, d), dtype=np.int8))) for _ in range(48)]
    qs16 = [q.astype(jnp.bfloat16) for q in qs8]
    qcorner8 = [q[:8, :128] for q in qs8]
    jax.block_until_ready(qs16)
    del db8

    chunk = 8192
    n_pad = (n // chunk) * chunk  # drop tail for the ablation
    d_db8t = d_db8[:n_pad]
    d_db16t = d_db16[:n_pad]

    # A/B: pure stream
    sa = make_stream(d_db8t, chunk)
    ms = bench("A: pure-stream int8 (0.77 GB)", lambda q: sa(q, d_db8t), qcorner8)
    print(f"{'':52s} -> {n_pad*d/ms*1e3/1e9:8.1f} GB/s", flush=True)
    sb = make_stream(d_db16t, chunk // 2)
    ms = bench("B: pure-stream bf16 (1.54 GB)", lambda q: sb(q, d_db16t), qcorner8)
    print(f"{'':52s} -> {2*n_pad*d/ms*1e3/1e9:8.1f} GB/s", flush=True)

    # C: int8 stream + bf16-convert matmul binmax
    nbins = 1024
    call = make_bf16conv(qs16[0], d_db8t, nbins, chunk)
    ms = bench("C: int8 stream + bf16 matmul binmax", lambda q: call(q, d_db8t), qs16)
    print(f"{'':52s} -> {n_pad*d/ms*1e3/1e9:8.1f} GB/s eff", flush=True)

    # D: MXU-only rates (VMEM-resident, 256 matmuls of [b,d]x[d,2048])
    blk8 = d_db8[:2048]
    blk16 = d_db16[:2048]
    reps = 256
    flops = 2 * b * d * 2048 * reps
    m8 = make_mxu(qs8[0], blk8, reps, jnp.int32)
    ms = bench("D1: MXU int8->int32 x256", lambda q: m8(q, blk8), qs8)
    print(f"{'':52s} -> {flops/ms*1e3/1e12:8.1f} TOP/s", flush=True)
    m16 = make_mxu(qs16[0], blk16, reps, jnp.float32)
    ms = bench("D2: MXU bf16->f32 x256", lambda q: m16(q, blk16), qs16)
    print(f"{'':52s} -> {flops/ms*1e3/1e12:8.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
