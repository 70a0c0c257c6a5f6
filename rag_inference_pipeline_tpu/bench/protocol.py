"""Measurement-protocol helpers for the (axon-tunneled) TPU.

Every rule here was paid for in PERF_NOTES.md "Measurement reliability":

- `block_until_ready` through the tunnel does NOT guarantee execution, so
  pipelined wall clocks are LOWER bounds; cross-check with per-iteration
  full fetches minus the median RTT.
- identical repeated calls get deduped somewhere in the stack — inputs must
  vary every iteration.
- the trustworthy number is the IN-PROGRAM protocol: N searches inside one
  jitted lax.scan with a tiny fetched reduction — a single dispatch that
  neither tunnel dispatch overhead nor phantom completions can touch.

The reference's benchmarking analog is scripts/profile_pipeline.py's
wall-clock loop (no device asynchrony to lie about on CPU); these helpers
are what that becomes on an asynchronous accelerator.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def measure_rtt(dev_arr: jax.Array, n: int = 7) -> float:
    """Median host<->device round-trip (seconds) via tiny fetches."""
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(dev_arr[:1, :1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_pipelined(
    fn: Callable, inputs: Sequence[jax.Array], rounds: int = 2
) -> float:
    """ms/call, pipelined submission + one sync. LOWER bound on device cost
    (block_until_ready optimism); use with time_fetch + time_inprogram."""
    jax.block_until_ready(fn(inputs[0]))  # warm/compile
    t0 = time.perf_counter()
    outs = []
    for _ in range(rounds):
        for q in inputs:
            outs.append(fn(q))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / (rounds * len(inputs)) * 1e3


def time_fetch(
    fn: Callable, inputs: Sequence[jax.Array], rtt: float
) -> float:
    """ms/call with per-iteration FULL result fetches, minus RTT. UPPER
    bound (serialized dispatch) that forces real execution."""
    t0 = time.perf_counter()
    for q in inputs:
        for leaf in jax.tree_util.tree_leaves(fn(q)):
            np.asarray(leaf)
    return ((time.perf_counter() - t0) / len(inputs) - rtt) * 1e3


def time_inprogram(
    body: Callable,  # body(q, *extra) -> pytree of arrays
    variants: Sequence[jax.Array],  # each [S, ...q-shape]: S stacked inputs
    extra: tuple = (),
    reps: int = 3,
) -> float:
    """ms/call via the single-dispatch lax.scan protocol (the trustworthy
    one). `variants` supplies `reps` DISTINCT stacked input sets so the
    repeated dispatches cannot be deduped upstream."""

    @jax.jit
    def scanner(qstk, *ex):
        def step(_, q):
            out = body(q, *ex)
            leaves = jax.tree_util.tree_leaves(out)
            red = jnp.float32(0)
            for l in leaves:
                red = red + l.sum().astype(jnp.float32)
            return None, red
        _, sums = jax.lax.scan(step, None, qstk)
        return sums

    # warm/compile on a DISTINCT input (row-reversed copy of the last
    # variant): when reps == len(variants) the old variants[-1] warm call
    # was byte-identical to one timed dispatch, which the dedup rule in
    # the module header says may then be served without executing
    warm = variants[-1][::-1]
    np.asarray(scanner(warm, *extra))
    s = variants[0].shape[0]
    t0 = time.perf_counter()
    for r in range(reps):
        np.asarray(scanner(variants[r % len(variants)], *extra))
    return (time.perf_counter() - t0) / (reps * s) * 1e3
