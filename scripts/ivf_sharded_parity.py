#!/usr/bin/env python
"""Sharded-IVF recall parity at non-toy scale (round-3 VERDICT #7).

Builds a clustered corpus (default 120k rows), trains ONE IVF (and one
IVF-PQ) index, searches it unsharded and dp=8-sharded on the virtual CPU
mesh, and reports recall@10 vs the exact oracle while sweeping the
per-shard scan-slot budget `nprobe_local`.

With round-4's GLOBAL probe selection (ops/ivf.py::sharded_ivf_search:
all-gather the [B, nlist] coarse table, every shard scans only owned
lists clearing the global nprobe-th score) the scanned union equals the
unsharded search by construction — any residual gap is scan-slot skew
(a shard owning more winners than slots), which the sweep quantifies.

Writes artifacts/round4/ivf_sharded_parity.json.

Usage:
  DEVICE_PLATFORM=cpu RAGTPU_CPU_DEVICES=8 python scripts/ivf_sharded_parity.py \
      [--rows 120000] [--dim 128] [--nlist 512] [--nprobe 64]
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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("DEVICE_PLATFORM", "cpu")
os.environ.setdefault("RAGTPU_CPU_DEVICES", "8")

from rag_inference_pipeline_tpu.core import bootstrap  # noqa: E402

bootstrap.bootstrap()

import numpy as np  # noqa: E402


def clustered(rng, n, d, n_clusters):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    asg = rng.integers(0, n_clusters, n)
    x = centers[asg] + 0.25 * rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def recall(ids, oracle, k):
    return float(
        np.mean(
            [
                len(set(ids[i, :k].tolist()) & set(oracle[i, :k].tolist())) / k
                for i in range(len(ids))
            ]
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=120_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--nlist", type=int, default=512)
    ap.add_argument("--nprobe", type=int, default=64)
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--pq", action="store_true", help="also run IVF-PQ")
    ap.add_argument("--out", default="artifacts/round4/ivf_sharded_parity.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rag_inference_pipeline_tpu.core import make_mesh
    from rag_inference_pipeline_tpu.index.ivf_flat import IVFFlatIndex

    rng = np.random.default_rng(0)
    x = clustered(rng, args.rows, args.dim, n_clusters=args.nlist)
    q = clustered(np.random.default_rng(7), args.queries, args.dim, args.nlist)
    oracle = np.argsort(-(q @ x.T), axis=1)[:, : args.k]
    qj = jnp.asarray(q)

    print(f"corpus {args.rows}x{args.dim}, nlist={args.nlist}, "
          f"nprobe={args.nprobe}, dp=8", flush=True)

    # ONE build, searched two ways: train unsharded, then attach the mesh
    idx = IVFFlatIndex(
        args.dim, args.nlist, nprobe=args.nprobe, mesh=None, cap_factor=2.5
    )
    t0 = time.time()
    idx.train_add(x, train_size=min(args.rows, 65536), iters=10)
    print(f"built in {time.time() - t0:.1f}s", flush=True)
    _, ids_u = idx.search(qj, args.k)
    r_unsharded = recall(np.asarray(ids_u), oracle, args.k)

    mesh = make_mesh(dp=8, tp=1)
    from rag_inference_pipeline_tpu.ops.ivf import (
        shard_ivf_listing,
        sharded_ivf_search,
    )

    listing_sh = shard_ivf_listing(mesh, idx._listing)
    dp = 8
    auto = -(-args.nprobe // dp)
    sweep = sorted({auto, 2 * auto, 4 * auto, args.nprobe})
    rows = []
    for npl in sweep:
        _, ids_s = sharded_ivf_search(
            mesh, listing_sh, qj, args.k,
            nprobe=args.nprobe, nprobe_local=npl,
        )
        r = recall(np.asarray(ids_s), oracle, args.k)
        rows.append({"nprobe_local": npl, "recall": r,
                     "scan_slots_total": npl * dp})
        print(f"  sharded nprobe_local={npl:4d} "
              f"(total slots {npl * dp:4d}): recall@{args.k} {r:.4f} "
              f"(unsharded {r_unsharded:.4f})", flush=True)

    out = {
        "rows": args.rows, "dim": args.dim, "nlist": args.nlist,
        "nprobe": args.nprobe, "dp": dp, "k": args.k,
        "recall_unsharded": r_unsharded,
        "sharded": rows,
        "design": "global probe selection (coarse all-gather + threshold)",
    }

    if args.pq:
        from rag_inference_pipeline_tpu.index.ivf_pq import IVFPQIndex
        from rag_inference_pipeline_tpu.ops.pq import (
            shard_ivfpq_listing,
            sharded_ivfpq_search,
        )

        m = args.dim // 8
        pq = IVFPQIndex(
            args.dim, args.nlist, m, nprobe=args.nprobe,
            rescore_k=0, mesh=None,
        )
        pq.train_add(x, train_size=min(args.rows, 65536),
                     kmeans_iters=10, pq_iters=8)
        _, ids_up = pq.search(qj, args.k)
        r_up = recall(np.asarray(ids_up), oracle, args.k)
        listing_pq = shard_ivfpq_listing(mesh, pq._listing)
        pq_rows = []
        for npl in sweep:
            _, ids_sp = sharded_ivfpq_search(
                mesh, listing_pq, qj, args.k,
                nprobe=args.nprobe, nprobe_local=npl, interpret=True,
            )
            r = recall(np.asarray(ids_sp), oracle, args.k)
            pq_rows.append({"nprobe_local": npl, "recall": r})
            print(f"  pq sharded nprobe_local={npl:4d}: {r:.4f} "
                  f"(unsharded {r_up:.4f})", flush=True)
        out["pq_recall_unsharded"] = r_up
        out["pq_sharded"] = pq_rows

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
