"""Probe: can int4 weight storage beat int8 on the B=1 decode wall?

The B=1 decode step is weight-stream-bound (PERF_NOTES "int8 decode":
1.338 ms/step at int8 ~ 0.47 GB over ~550 GB/s effective + fixed). int4
halves the bytes again IF the unpack/convert fuses into the dot's operand
read instead of materializing a full-size intermediate in HBM. This probe
times matvec variants at the two shapes that dominate the Qwen2.5-0.5B
step (the tied lm head [896, 151936] and an MLP projection [896, 4864])
and reports achieved GB/s per mechanism:

  bf16      : x @ W                      (2 bytes/param baseline)
  int8      : W8A8-dynamic (models/layers._qdense — the shipped path)
  int4pack  : two nibbles packed in uint8 [in/2, out], unpack via
              shift/mask on the VPU, dequant post-dot
  int4group : int4pack with PRE-dot group scales (the accuracy-bearing
              form, grouped over the in-dim) via a batched per-group dot
  int4cvt   : packed uint8 [in, out/2] bitcast to native s4 in-jit,
              convert->bf16, bf16 dot (native int4 as jit ARGUMENTS
              trips an axon-plugin "Recursively calling jit" bug, so
              the bitcast carries the s4 into the program)
  int4dot   : same bitcast, s8 x s4 -> s32 dot_general (MXU int4 path?)

MEASURED VERDICT (artifacts/round3/quant4_probe.json, v5e via axon):
every int4 mechanism lands at ~25 GB/s effective — software emulation —
vs ~700 GB/s bf16/int8 streaming at the lm-head shape. int4 decode is a
NEGATIVE result on this stack; see PERF_NOTES "int4 decode probe".

Usage: python scripts/bench_quant4_probe.py
Writes artifacts/round3/quant4_probe.json.
"""

from __future__ import annotations

try:  # repo-root import without pip install; scripts/ is sys.path[0]
    # only when run as a script — harmless to skip when imported as a
    # module by tests (the package is importable there already)
    import _pathfix  # noqa: F401
except ImportError:
    pass

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rag_inference_pipeline_tpu.bench.protocol import time_inprogram  # noqa: E402
from rag_inference_pipeline_tpu.models.layers import (  # noqa: E402
    QuantizedLinear,
    _qdense,
    quantize_act_rows,
    quantize_linear,
)

GROUP = 128


def pack_int4(w32: np.ndarray, group: int = GROUP):
    """Group-wise symmetric int4: returns packed uint8 [in//2, out],
    scales f32 [in//group, out], and the dequantized reference [in, out]."""
    din, dout = w32.shape
    assert din % group == 0 and din % 2 == 0
    wg = w32.reshape(din // group, group, dout)
    s = np.maximum(np.abs(wg).max(axis=1), 1e-8) / 7.0  # [G, out]
    q = np.clip(np.round(wg / s[:, None, :]), -7, 7).astype(np.int8)
    deq = (q * s[:, None, :]).reshape(din, dout).astype(np.float32)
    qf = q.reshape(din, dout)
    lo = qf[0::2] + 8  # [din/2, out] in 0..15
    hi = qf[1::2] + 8
    packed = (lo.astype(np.uint8) | (hi.astype(np.uint8) << 4))
    return packed, s.astype(np.float32), deq


def unpack_int4(packed: jax.Array) -> jax.Array:
    """uint8 [in/2, out] -> int8 [in, out] in [-7, 7] (interleaved rows)."""
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    din2, dout = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(din2 * 2, dout)


def pack_out_cols(q4: np.ndarray) -> np.ndarray:
    """int8 [in, out] in [-8, 7] -> uint8 [in, out/2], adjacent columns in
    one byte (low nibble = even col) so the in-jit bitcast to s4 needs no
    transpose: bitcast gives [in, out/2, 2] with the minor dim unpacking
    adjacent columns."""
    lo = (q4[:, 0::2] & 0xF).astype(np.uint8)
    hi = (q4[:, 1::2] & 0xF).astype(np.uint8)
    return lo | (hi << 4)


def bitcast_s4(p: jax.Array) -> jax.Array:
    """uint8 [in, out/2] -> s4 [in, out] via bitcast (in-jit only)."""
    s4 = jax.lax.bitcast_convert_type(p, jnp.int4)
    return s4.reshape(p.shape[0], p.shape[1] * 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="896x151936,896x4864")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scan", type=int, default=64)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    # tunnel-health probe: tiny novel jit
    t0 = time.perf_counter()
    probe = jax.jit(lambda a: (a * 3.7).sum())(
        jnp.arange(17.0) + time.time() % 100
    )
    np.asarray(probe)
    print(f"novel-jit probe: {time.perf_counter() - t0:.1f}s")

    rows = {}
    rng = np.random.default_rng(0)
    for shp in args.shapes.split(","):
        din, dout = (int(v) for v in shp.split("x"))
        w32 = rng.standard_normal((din, dout), dtype=np.float32) * 0.02
        w_bf16 = jax.device_put(jnp.asarray(w32, jnp.bfloat16))
        ql = quantize_linear(w32)
        ql = QuantizedLinear(jax.device_put(ql.q), jax.device_put(ql.s))
        packed_n, s4_n, _ = pack_int4(w32)
        packed = jax.device_put(jnp.asarray(packed_n))
        s4 = jax.device_put(jnp.asarray(s4_n))  # [G, out]
        s4col = jax.device_put(jnp.asarray(s4_n.mean(axis=0)))  # [out] probe-only
        q4cols = np.clip(np.round(w32 / s4_n.mean()), -7, 7).astype(np.int8)
        packed_cols = jax.device_put(jnp.asarray(pack_out_cols(q4cols)))

        b = args.batch
        variants = [
            jnp.asarray(
                rng.standard_normal((args.scan, b, din), dtype=np.float32),
                jnp.bfloat16,
            )
            for _ in range(args.reps)
        ]

        def t(body, *extra):
            return time_inprogram(body, variants, extra=tuple(extra),
                                  reps=args.reps)

        res = {}
        res["bf16"] = t(lambda x, w: jnp.dot(x, w), w_bf16)
        res["int8"] = t(lambda x, q, s: _qdense(x, QuantizedLinear(q, s)),
                        ql.q, ql.s)
        res["int4pack"] = t(
            lambda x, p, sc: jnp.dot(
                x, unpack_int4(p).astype(jnp.bfloat16)) * sc,
            packed, s4col,
        )
        res["int4cvt"] = t(
            lambda x, p, sc: jnp.dot(
                x, bitcast_s4(p).astype(jnp.bfloat16)) * sc,
            packed_cols, s4col,
        )

        def s8xs4_dot(x, p, sc):
            xq, xs = quantize_act_rows(x)
            acc = jax.lax.dot_general(
                xq, bitcast_s4(p), (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc.astype(jnp.float32) * xs * sc

        res["int4dot"] = t(s8xs4_dot, packed_cols, s4col)

        def group_dot(x, p, sc):
            wq = unpack_int4(p).astype(jnp.bfloat16)  # [in, out]
            g = sc.shape[0]
            wg = wq.reshape(g, din // g, dout)
            xg = x.reshape(b, g, din // g)
            z = jnp.einsum("bgi,gio->bgo", xg, wg,
                           preferred_element_type=jnp.float32)
            return (z * sc[None]).sum(axis=1)

        res["int4group"] = t(group_dot, packed, s4)

        nbytes = {"bf16": din * dout * 2, "int8": din * dout,
                  "int4cvt": din * dout // 2, "int4dot": din * dout // 2,
                  "int4pack": din * dout // 2,
                  "int4group": din * dout // 2 + s4_n.nbytes}
        print(f"\n[{shp}] B={b} (ms/call, achieved GB/s of stored weight)")
        for k, ms in res.items():
            gbs = nbytes[k] / (ms * 1e-3) / 1e9
            print(f"  {k:10s} {ms:8.3f} ms   {gbs:7.1f} GB/s")
        rows[shp] = {k: {"ms": v, "gbs": nbytes[k] / (v * 1e-3) / 1e9}
                     for k, v in res.items()}

    out = Path("artifacts/round3/quant4_probe.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(
        {"batch": args.batch, "rows": rows,
         "device": str(jax.devices()[0])}, indent=2))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
