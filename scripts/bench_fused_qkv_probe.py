#!/usr/bin/env python
"""Probe: would fusing QKV (and gate|up) matmuls speed B=1 decode?

The corrected decode fit (PERF_NOTES "int8 decode", RE-MEASURED) leaves
~0.22 ms/step over the weight-stream floor. Candidate: dispatch overhead
of 7 small matmuls x 24 layers per step. This probe mimics the decode
step's matmul skeleton (no attention/rope — just the weight-streaming
dense chain) in two shapes:

- split:  y@q_w, y@k_w, y@v_w, a@o_w, h@gate_w, h@up_w, f@down_w
- fused:  y@qkv_w (one [H, (h+2kv)dh] dot), a@o_w, h@gateup_w, f@down_w

Same bytes from HBM either way; only the dispatch count changes
(7/layer -> 4/layer). Run as an in-program lax.scan over `--length`
iterations at B=1, bf16 and int8 (W8A8-dynamic, per-column scales —
scales concatenate along columns exactly like the weights). If fused
wins >10% here, wire cfg.fuse_qkv into models/qwen.py.

Writes artifacts/round3/fused_qkv_probe.json.
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
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--length", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.smoke:
        os.environ.setdefault("DEVICE_PLATFORM", "cpu")
    from rag_inference_pipeline_tpu.core.bootstrap import bootstrap

    bootstrap()
    import jax
    import jax.numpy as jnp

    # Qwen2.5-0.5B decode shapes
    if args.smoke:
        layers, h, kv_dh, inter, length = 2, 64, 32, 128, 4
    else:
        layers, h, kv_dh, inter, length = 24, 896, 128, 4864, args.length
    dev = jax.devices()[0]
    print(f"device={dev.platform} layers={layers} h={h} L={length}")

    rng = np.random.default_rng(0)

    def w(*shape):
        return jnp.asarray(
            rng.standard_normal(shape, np.float32) * 0.02, jnp.bfloat16
        )

    split = [
        dict(
            q=w(h, h), k=w(h, kv_dh), v=w(h, kv_dh), o=w(h, h),
            gate=w(h, inter), up=w(h, inter), down=w(inter, h),
        )
        for _ in range(layers)
    ]
    fused = [
        dict(
            qkv=jnp.concatenate([lp["q"], lp["k"], lp["v"]], axis=1),
            o=lp["o"],
            gateup=jnp.concatenate([lp["gate"], lp["up"]], axis=1),
            down=lp["down"],
        )
        for lp in split
    ]

    def quant(m):
        # per-column int8 with f32 scales (same scheme as quantize_qwen_params)
        s = jnp.max(jnp.abs(m.astype(jnp.float32)), axis=0) / 127.0
        q = jnp.round(m.astype(jnp.float32) / s).astype(jnp.int8)
        return q, s

    split_q = [{k: quant(v) for k, v in lp.items()} for lp in split]
    fused_q = [{k: quant(v) for k, v in lp.items()} for lp in fused]

    def dot_bf16(x, m):
        return jax.lax.dot(x, m, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16
        )

    def dot_i8(x, qs):
        q, s = qs
        xs = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        xq = jnp.round(x.astype(jnp.float32) / (xs / 127.0)).astype(jnp.int8)
        acc = jax.lax.dot(xq, q, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (xs / 127.0) * s).astype(
            jnp.bfloat16
        )

    def body_split(dot, ws, x):
        for lp in ws:
            q = dot(x, lp["q"])
            k = dot(x, lp["k"])
            v = dot(x, lp["v"])
            a = q + jnp.pad(k + v, ((0, 0), (0, h - kv_dh)))
            x = x + dot(a, lp["o"])
            f = jax.nn.silu(dot(x, lp["gate"])) * dot(x, lp["up"])
            x = x + dot(f, lp["down"])
        return x

    def body_fused(dot, ws, x):
        for lp in ws:
            qkv = dot(x, lp["qkv"])
            q, k, v = qkv[:, :h], qkv[:, h:h + kv_dh], qkv[:, h + kv_dh:]
            a = q + jnp.pad(k + v, ((0, 0), (0, h - kv_dh)))
            x = x + dot(a, lp["o"])
            gu = dot(x, lp["gateup"])
            f = jax.nn.silu(gu[:, :inter]) * gu[:, inter:]
            x = x + dot(f, lp["down"])
        return x

    def make_loop(body, dot, ws):
        @jax.jit
        def loop(ws, x0):
            def step(x, _):
                x = body(dot, ws, x)
                # keep magnitudes bounded so the scan can't overflow
                x = x / jnp.maximum(
                    jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1.0
                )
                return x, ()

            x, _ = jax.lax.scan(step, x0, None, length=length)
            return x

        return loop

    x0 = jnp.asarray(rng.standard_normal((1, h), np.float32), jnp.bfloat16)
    out: dict = {"device": dev.platform, "length": length, "ms_per_step": {}}
    cases = [
        ("bf16_split", body_split, dot_bf16, split),
        ("bf16_fused", body_fused, dot_bf16, fused),
        ("int8_split", body_split, dot_i8, split_q),
        ("int8_fused", body_fused, dot_i8, fused_q),
    ]
    for name, body, dot, ws in cases:
        loop = make_loop(body, dot, ws)
        np.asarray(loop(ws, x0))  # compile
        t0 = time.perf_counter()
        for r in range(args.reps):
            np.asarray(loop(ws, x0 + jnp.bfloat16(r * 1e-3)))
        ms = (time.perf_counter() - t0) / (args.reps * length) * 1e3
        out["ms_per_step"][name] = ms
        print(f"{name}: {ms:.3f} ms/step")

    for p in ("bf16", "int8"):
        s, f = out["ms_per_step"][f"{p}_split"], out["ms_per_step"][f"{p}_fused"]
        out[f"{p}_fused_speedup"] = s / f
        print(f"{p}: fused speedup {s / f:.3f}x")

    os.makedirs("artifacts/round3", exist_ok=True)
    with open("artifacts/round3/fused_qkv_probe.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote artifacts/round3/fused_qkv_probe.json")


if __name__ == "__main__":
    main()
