#!/usr/bin/env python
"""Round-2 ablation v3 (sweep2's validated protocol: pipelined + fetch-RTT
cross-check, >= 16 distinct inputs). Hypotheses for the 4.1 ms int8 scan:
  H1 pure-DMA ceiling: stream-only kernel, same grid -> GB/s
  H2 int8 dot_general runs at f32 MXU rate: binmax variant that upcasts the
     DB block to bf16 in VMEM before the matmul (bf16 MXU = 4x f32 rate;
     if H2 holds this runs ~2x faster despite the extra VPU converts)
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

from rag_inference_pipeline_tpu.ops.topk import (
    INT32_MIN,
    binmax_partial_topk_int8gs,
)


def measure_rtt(dev_arr) -> float:
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(dev_arr[:1, :1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_variant(name, fn, inputs, rounds, rtt):
    out0 = fn(inputs[0])
    jax.block_until_ready(out0)
    t0 = time.perf_counter()
    outs = []
    for r in range(rounds):
        for q in inputs:
            outs.append(fn(q))
    jax.block_until_ready(outs)
    ms_pipe = (time.perf_counter() - t0) / (rounds * len(inputs)) * 1e3
    t0 = time.perf_counter()
    for q in inputs:
        out = fn(q)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)
    ms_fetch = ((time.perf_counter() - t0) / len(inputs) - rtt) * 1e3
    print(f"{name:52s} pipelined {ms_pipe:8.3f} | fetch-RTT {ms_fetch:8.3f} ms",
          flush=True)
    return ms_pipe, ms_fetch


def stream_kernel(q_ref, db_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = q_ref[:]

    out_ref[:] = out_ref[:] + db_ref[0:8, 0:128].astype(jnp.int32)


def make_stream(db, chunk):
    n, d = db.shape
    return pl.pallas_call(
        stream_kernel,
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )


def _binmax_bf16mm_kernel(q_ref, db_ref, nrows_ref, vals_ref, steps_ref,
                          *, nbins, chunk, nsteps):
    """int8 DB streamed; block upcast to bf16 in VMEM; bf16 matmul."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, -3.0e38)
        steps_ref[:] = jnp.full_like(steps_ref, -1)

    b = vals_ref.shape[0]
    sub = chunk // nbins

    def scores(j):
        blk = db_ref[j * nbins : (j + 1) * nbins, :].astype(jnp.bfloat16)
        return jax.lax.dot_general(
            q_ref[:], blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def update(j, s):
        better = s > vals_ref[:]
        vals_ref[:] = jnp.where(better, s, vals_ref[:])
        steps_ref[:] = jnp.where(better, i * sub + j, steps_ref[:])

    @pl.when(i < nsteps - 1)
    def _body():
        for j in range(sub):
            update(j, scores(j))

    @pl.when(i == nsteps - 1)
    def _last():
        nrows = nrows_ref[0, 0]
        col = jax.lax.broadcasted_iota(jnp.int32, (b, nbins), 1)
        for j in range(sub):
            s = scores(j)
            gid = (i * chunk + j * nbins) + col
            s = jnp.where(gid < nrows, s, -3.0e38)
            update(j, s)


def binmax_bf16mm(queries_bf16, db_i8, *, nbins, chunk):
    n, d = db_i8.shape
    b = queries_bf16.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        db_i8 = jnp.pad(db_i8, ((0, n_pad - n), (0, 0)))
    n_chunks = n_pad // chunk
    nrows = jnp.array([[n]], dtype=jnp.int32)
    kern = functools.partial(
        _binmax_bf16mm_kernel, nbins=nbins, chunk=chunk, nsteps=n_chunks
    )
    return pl.pallas_call(
        kern,
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
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(queries_bf16, db_i8, nrows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    n, b, d = args.n, args.b, args.d

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    db8 = rng.integers(-127, 127, (n, d), dtype=np.int8)
    d_db8 = jax.device_put(jnp.asarray(db8))
    del db8

    chunk = 8192
    n_pad = (n // chunk) * chunk
    d_db8t = d_db8[:n_pad]
    jax.block_until_ready(d_db8t)
    rtt = measure_rtt(d_db8t)
    print(f"tunnel RTT ~ {rtt*1e3:.1f} ms", flush=True)

    qcorner = [jax.device_put(jnp.asarray(
        rng.integers(-100, 100, (8, 128), dtype=np.int32))) for _ in range(16)]
    sa = make_stream(d_db8t, chunk)
    ms = bench_variant("H1: pure-stream int8 (0.73 GB)",
                       lambda q: sa(q, d_db8t), qcorner, args.rounds, rtt)
    for m in ms:
        print(f"{'':52s} -> {n_pad*d/m*1e3/1e9:8.1f} GB/s", flush=True)

    qs8 = [jax.device_put(jnp.asarray(
        rng.integers(-127, 127, (b, d), dtype=np.int8))) for _ in range(16)]
    # MUST be jitted: an eager pallas_call pays per-call tracing + remote
    # compile-cache lookups (~3 s/call through the tunnel)
    c_fn = jax.jit(functools.partial(
        binmax_partial_topk_int8gs, nbins=1024, chunk=chunk))
    ms = bench_variant(
        "C:  int8/gs binmax (sanity, expect ~4.1)",
        lambda q: c_fn(q, d_db8t), qs8, args.rounds, rtt)

    qs16 = [q.astype(jnp.bfloat16) for q in qs8]
    jax.block_until_ready(qs16)
    h2_fn = jax.jit(lambda q, db: binmax_bf16mm(q, db, nbins=1024, chunk=chunk))
    ms = bench_variant(
        "H2: int8 DB + bf16-upcast matmul binmax",
        lambda q: h2_fn(q, d_db8t), qs16, args.rounds, rtt)

    # H2b: PRODUCTION kernel with mm_bf16=True (bit-exact int scores via
    # bf16 MXU; includes last-chunk masking) — the flag we'd actually ship
    h2b_fn = jax.jit(functools.partial(
        binmax_partial_topk_int8gs, nbins=1024, chunk=chunk, mm_bf16=True))
    ms = bench_variant(
        "H2b: production int8gs kernel, mm_bf16=True",
        lambda q: h2b_fn(q, d_db8t), qs8, args.rounds, rtt)

    # sweep chunk sizes for the winner direction
    for ch in (4096, 16384):
        f1 = jax.jit(functools.partial(
            binmax_partial_topk_int8gs, nbins=1024, chunk=ch))
        ms = bench_variant(
            f"C/chunk={ch}: int8gs int-dot",
            lambda q: f1(q, d_db8[: (n // ch) * ch]), qs8, args.rounds, rtt)
        f2 = jax.jit(functools.partial(
            binmax_partial_topk_int8gs, nbins=1024, chunk=ch, mm_bf16=True))
        ms = bench_variant(
            f"C/chunk={ch}: int8gs mm_bf16",
            lambda q: f2(q, d_db8[: (n // ch) * ch]), qs8, args.rounds, rtt)


if __name__ == "__main__":
    main()
