#!/usr/bin/env python
"""Host refine-gather microbench (native cs_rescore_{f16,i8}).

The >=30M host-refine path gathers `B x rescore_k` random rows from a
multi-GB host store; at B=32 it is memory-LATENCY-bound (row-start cache
miss + 4 KB TLB walk per random row, one core on this host). Measures
ms per call across B for a given store size, so gather-order / huge-page
changes in native/cpuscan.cc are judged by numbers, not vibes.

Pure host (no TPU). Writes artifacts/round3/rescore_host.json.
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

from rag_inference_pipeline_tpu.utils import cpuscan


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--s", type=int, default=4096, help="shortlist size")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--kind", choices=["f16", "i8", "both"], default="both")
    ap.add_argument("--hugepage", action="store_true",
                    help="madvise the stores onto 2 MB pages first (the "
                    "load-time call index/flat.py makes in production)")
    ap.add_argument("--out", default="artifacts/round3/rescore_host.json")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    print(f"building stores: n={args.n} d={args.d} ...", flush=True)
    # fill via int16 view (random f16 through astype is slow at this size)
    store_f16 = np.empty((args.n, args.d), np.float16)
    store_f16.view(np.int16)[:] = rng.integers(
        -2000, 2000, (args.n, args.d), dtype=np.int16
    )
    store_i8 = store_f16.view(np.int16).astype(np.int8)

    hp = False
    if args.hugepage:
        t0 = time.perf_counter()
        hp = cpuscan.madvise_hugepage(store_f16) and cpuscan.madvise_hugepage(
            store_i8
        )
        print(f"madvise_hugepage: {hp} ({time.perf_counter() - t0:.1f}s)")
    out: dict = {
        "n": args.n, "d": args.d, "s": args.s, "hugepage": hp,
        "threads": cpuscan.hw_threads(), "rows": [],
    }
    for b in args.batches:
        q = rng.standard_normal((b, args.d)).astype(np.float32)
        for kind in ("f16", "i8"):
            if args.kind not in (kind, "both"):
                continue
            fn = cpuscan.rescore_f16 if kind == "f16" else (
                lambda q_, st, ids_: cpuscan.rescore_i8(
                    q_, st, 1.0, ids_, args.k
                )
            )
            store = store_f16 if kind == "f16" else store_i8
            # warm (touch pages along one shortlist)
            ids = rng.integers(
                0, args.n, (b, args.s), dtype=np.int32
            )
            if kind == "f16":
                cpuscan.rescore_f16(q, store, ids, args.k)
            else:
                cpuscan.rescore_i8(q, store, 1.0, ids, args.k)
            t_total = 0.0
            for _ in range(args.reps):
                ids = rng.integers(0, args.n, (b, args.s), dtype=np.int32)
                t0 = time.perf_counter()
                if kind == "f16":
                    cpuscan.rescore_f16(q, store, ids, args.k)
                else:
                    cpuscan.rescore_i8(q, store, 1.0, ids, args.k)
                t_total += time.perf_counter() - t0
            ms = t_total / args.reps * 1e3
            row = {
                "batch": b, "kind": kind, "ms": round(ms, 2),
                "ns_per_row": round(ms * 1e6 / (b * args.s), 1),
            }
            out["rows"].append(row)
            print(row, flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
