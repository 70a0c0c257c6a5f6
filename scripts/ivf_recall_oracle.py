#!/usr/bin/env python
"""IVF recall root-cause decomposition (round-2 VERDICT #5).

Measured IVF recall@10 was 0.80-0.90 at 1M/nprobe=64 against a >=0.95
target, blamed on "nprobe-bound" without proof. This script separates the
three suspects with a matched-centroid oracle (same centroids as the
production index, exact numpy scans):

  recall(ideal)   probe top-nprobe centroids, candidates = every row whose
                  NEAREST centroid is probed (faiss IndexIVFFlat semantics,
                  no capacity cap) -> the true nprobe/centroid-quality bound
  recall(actual)  candidates = rows in the probed lists of the production
                  capacity-cascade layout (ops/ivf.py::layout_inverted_lists)
                  -> ideal minus this = displacement loss from the cap
  recall(kernel)  the shipped search path on the same listing
                  -> actual minus this = kernel loss (positional collapse
                  etc.)

plus a k-means-quality sweep (iters / train_size) over recall(ideal).

Usage: python scripts/ivf_recall_oracle.py [--n 200000 --d 128 --nlist 1024]
Writes artifacts/round3/ivf_oracle.json.

Reference semantics target: faiss IndexIVFFlat nprobe search
(src/pipeline/components/faiss_store.py:84-92,152).
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


def clustered_corpus(rng, n, d, n_clusters, spread=0.15, rel=False):
    """Mixture-of-Gaussians corpus, normalized.

    rel=False: `spread` is the PER-COORDINATE sigma (round-2 bench corpus
    semantics). Note ||noise|| = spread*sqrt(d): at spread 0.3 / d=768 the
    noise is ~8x the unit center, i.e. an effectively RANDOM corpus —
    nearest neighbors spread uniformly over lists and any IVF's recall is
    probing-bound (the 1M oracle run proves exactly this: kernel and
    layout losses are zero, ideal recall ~ 0.15 at nprobe=64/4096).

    rel=True: `spread` is the RELATIVE noise norm (sigma = spread/sqrt(d)),
    intra-cluster cosine ~ 1/sqrt(1+spread^2) — the ANN-realistic topical
    embedding shape where IVF probing actually concentrates."""
    import numpy as np

    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = rng.integers(0, n_clusters, n)
    sigma = spread / np.sqrt(d) if rel else spread
    x = centers[which] + sigma * rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--nq", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cap-factor", type=float, default=1.5)
    ap.add_argument("--train-size", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--nprobes", default="16,32,64,128")
    ap.add_argument("--spread", type=float, default=0.3,
                    help="cluster spread (0.3 = round-2 bench corpus)")
    ap.add_argument("--rel-spread", action="store_true",
                    help="treat --spread as RELATIVE noise norm (the "
                    "ANN-realistic corpus; see clustered_corpus)")
    ap.add_argument("--qnoise", type=float, default=0.02)
    ap.add_argument("--out", default="artifacts/round3/ivf_oracle.json")
    ap.add_argument("--kmeans-sweep", action="store_true",
                    help="also sweep iters/train_size on recall(ideal)")
    args = ap.parse_args()

    from rag_inference_pipeline_tpu.core.bootstrap import bootstrap

    bootstrap()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rag_inference_pipeline_tpu.ops.ivf import (
        build_ivf_listing,
        ivf_search,
    )
    from rag_inference_pipeline_tpu.ops.kmeans import assign_clusters, kmeans

    rng = np.random.default_rng(0)
    n, d, k = args.n, args.d, args.k
    x = clustered_corpus(
        rng, n, d, n_clusters=2048, spread=args.spread, rel=args.rel_spread
    )
    q_rows = rng.integers(0, n, args.nq)
    q = x[q_rows] + args.qnoise * rng.standard_normal((args.nq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    # ground truth (exact IP top-k, numpy blocked)
    gt = np.zeros((args.nq, k), np.int64)
    blk = 100_000
    best_s = np.full((args.nq, k), -1e30, np.float32)
    best_i = np.zeros((args.nq, k), np.int64)
    for s0 in range(0, n, blk):
        s = q @ x[s0 : s0 + blk].T
        cand_i = np.argsort(-s, axis=1)[:, :k]
        cand_s = np.take_along_axis(s, cand_i, axis=1)
        all_s = np.concatenate([best_s, cand_s], axis=1)
        all_i = np.concatenate([best_i, cand_i + s0], axis=1)
        sel = np.argsort(-all_s, axis=1)[:, :k]
        best_s = np.take_along_axis(all_s, sel, axis=1)
        best_i = np.take_along_axis(all_i, sel, axis=1)
    gt = best_i

    def recall_from_sets(cand_sets):
        return float(np.mean([
            len(set(gt[i]) & cand_sets[i] if isinstance(cand_sets[i], set)
                else set(cand_sets[i])) / k
            for i in range(args.nq)
        ]))

    def recall_ideal(centroids, assign, nprobe):
        """Exact scan over rows whose nearest centroid is probed."""
        coarse = q @ centroids.T
        probe = np.argsort(-coarse, axis=1)[:, :nprobe]
        hits = []
        for i in range(args.nq):
            probed = set(probe[i].tolist())
            hit = sum(1 for g in gt[i] if assign[g] in probed)
            hits.append(hit / k)
        return float(np.mean(hits))

    def recall_actual(centroids, ids, nprobe):
        """Rows reachable through the capacity-cascade layout's lists."""
        coarse = q @ centroids.T
        probe = np.argsort(-coarse, axis=1)[:, :nprobe]
        hits = []
        for i in range(args.nq):
            cand = set()
            for c in probe[i]:
                lst = ids[c]
                cand.update(int(v) for v in lst[lst >= 0])
            hits.append(len(set(int(g) for g in gt[i]) & cand) / k)
        return float(np.mean(hits))

    def run_once(iters, train_size, tag):
        sel = rng.choice(n, size=min(train_size, n), replace=False)
        cj, _ = kmeans(
            jax.random.key(0), jnp.asarray(x[sel]), args.nlist, iters=iters
        )
        centroids = np.asarray(cj)
        assign = np.asarray(assign_clusters(jnp.asarray(x), cj))
        listing = build_ivf_listing(
            x, centroids, assign, cap_factor=args.cap_factor,
            storage_dtype=jnp.float32,
        )
        ids_np = np.asarray(listing.ids)
        sizes = np.asarray(listing.list_sizes)
        displaced = int(
            np.sum(assign != _owner_of(ids_np, n))
        )
        rows = []
        for nprobe in (int(v) for v in args.nprobes.split(",")):
            r_ideal = recall_ideal(centroids, assign, nprobe)
            r_actual = recall_actual(centroids, ids_np, nprobe)
            # chunk the kernel check: the XLA gather path materializes
            # [B, nprobe, cap, D] — B=256 at 1M/768d would OOM
            ik_parts = []
            for s0 in range(0, args.nq, 32):
                _, ik_c = ivf_search(
                    listing, jnp.asarray(q[s0 : s0 + 32]), k, nprobe=nprobe
                )
                ik_parts.append(np.asarray(ik_c))
            ik = np.concatenate(ik_parts)
            r_kernel = float(np.mean([
                len(set(ik[i]) & set(int(g) for g in gt[i])) / k
                for i in range(args.nq)
            ]))
            rows.append({
                "nprobe": nprobe,
                "recall_ideal": round(r_ideal, 4),
                "recall_actual_layout": round(r_actual, 4),
                "recall_kernel": round(r_kernel, 4),
                "displacement_loss": round(r_ideal - r_actual, 4),
                "kernel_loss": round(r_actual - r_kernel, 4),
            })
            print(
                f"[{tag}] nprobe={nprobe:4d} ideal {r_ideal:.3f} | "
                f"layout {r_actual:.3f} | kernel {r_kernel:.3f} | "
                f"displaced rows {displaced}/{n} "
                f"imbalance {sizes.max() / max(sizes.mean(), 1):.2f}",
                flush=True,
            )
        return {
            "iters": iters, "train_size": int(min(train_size, n)),
            "displaced_rows": displaced,
            "imbalance": round(float(sizes.max() / max(sizes.mean(), 1)), 2),
            "sweep": rows,
        }

    def _owner_of(ids_np, n):
        owner = np.full(n, -1, np.int64)
        nlist, cap = ids_np.shape
        for c in range(nlist):
            lst = ids_np[c]
            owner[lst[lst >= 0]] = c
        return owner

    results = {"config": vars(args) | {"nq": args.nq}, "runs": []}
    results["runs"].append(run_once(args.iters, args.train_size, "base"))
    if args.kmeans_sweep:
        results["runs"].append(run_once(40, args.train_size, "iters40"))
        results["runs"].append(run_once(args.iters, args.n, "train-all"))

    os.makedirs("artifacts/round3", exist_ok=True)
    out = args.out
    results["config"].pop("kmeans_sweep", None)
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
