#!/usr/bin/env python
"""Corpus + index builder (reference scripts/create_test_docs.py: 4.5M
synthetic docs into SQLite + IVF-Flat FAISS index of random vectors).

TPU-native differences: documents go into the native mmap store (or
sqlite with --backend sqlite), vectors can be REAL embeddings from the
configured embedder (--embed; the reference indexed random vectors so its
recall was unmeasurable — SURVEY.md section 6 note), and index build
(k-means train/assign) runs on the TPU.

Usage:
  python scripts/create_test_docs.py --out-dir artifacts/corpus \
      --num-docs 100000 --kind ivf_flat --embed
"""

from __future__ import annotations

try:  # repo-root import without pip install; scripts/ is sys.path[0]
    # only when run as a script — harmless to skip when imported as a
    # module by tests (the package is importable there already)
    import _pathfix  # noqa: F401
except ImportError:
    pass

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rag_inference_pipeline_tpu.core.bootstrap import bootstrap  # noqa: E402

bootstrap()


def synth_doc(i: int, rng: np.random.Generator) -> tuple[int, str, str]:
    topics = [
        "climate", "medicine", "finance", "space", "history", "sports",
        "music", "cooking", "travel", "physics", "biology", "law",
    ]
    t = topics[i % len(topics)]
    words = rng.choice(
        ["analysis", "report", "study", "overview", "data", "results",
         "method", "review", "survey", "facts", "notes", "summary"],
        size=24,
    )
    content = f"A {t} document. " + " ".join(words) + f" Reference item {i}."
    return i, f"{t.title()} document {i}", content


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out-dir", default="artifacts/corpus")
    p.add_argument("--num-docs", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--kind", choices=["flat", "ivf_flat", "ivf_pq"], default="flat")
    p.add_argument("--nlist", type=int, default=1024)
    p.add_argument("--pq-m", type=int, default=96)
    p.add_argument(
        "--dtype", choices=["bfloat16", "int8"], default="bfloat16",
        help="flat index storage (int8 = SQ8 scan + bf16 rescore copy, "
        "the headline serving config)",
    )
    p.add_argument(
        "--embed", action="store_true",
        help="embed docs with the configured embedder (else random vectors, "
        "matching the reference's random index)",
    )
    p.add_argument("--backend", choices=["native", "sqlite"], default="native")
    p.add_argument(
        "--tokens", action="store_true",
        help="also write doc_tokens.npy (decoder token space) for the fused "
        "device pipeline (USE_FUSED_PIPELINE=1)",
    )
    p.add_argument("--doc-tok-len", type=int, default=48)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    t0 = time.time()
    docs = [synth_doc(i, rng) for i in range(args.num_docs)]
    if args.backend == "native":
        from rag_inference_pipeline_tpu.utils.docstore import build_native_store

        db_path = os.path.join(args.out_dir, "documents.ragdoc")
        build_native_store(db_path, docs)
    else:
        from rag_inference_pipeline_tpu.utils.docstore import build_sqlite_store

        db_path = os.path.join(args.out_dir, "documents.db")
        build_sqlite_store(db_path, docs)
    print(f"doc store: {db_path} ({time.time() - t0:.1f}s)")

    t0 = time.time()
    if args.embed:
        from rag_inference_pipeline_tpu.core import get_settings
        from rag_inference_pipeline_tpu.models.components import EmbedderComponent

        emb = EmbedderComponent(get_settings())
        emb.load()
        vectors = np.concatenate(
            [
                emb.encode([d[2] for d in docs[s : s + 256]])
                for s in range(0, len(docs), 256)
            ]
        )
        dim = vectors.shape[1]
        print(f"embedded {len(docs)} docs ({time.time() - t0:.1f}s)")
    else:
        dim = args.dim
        vectors = rng.standard_normal((args.num_docs, dim)).astype(np.float32)
        vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
        print(f"random vectors {vectors.shape}")

    t0 = time.time()
    if args.kind == "flat":
        from rag_inference_pipeline_tpu.index import FlatIndex

        idx = FlatIndex(
            dim, dtype=args.dtype,
            rescore_k=64 if args.dtype == "int8" else 0,
        )
        idx.add(vectors)
    elif args.kind == "ivf_flat":
        from rag_inference_pipeline_tpu.index import IVFFlatIndex

        idx = IVFFlatIndex(dim, nlist=args.nlist)
        idx.train_add(vectors)
    else:
        from rag_inference_pipeline_tpu.index import IVFPQIndex

        idx = IVFPQIndex(dim, nlist=args.nlist, m=args.pq_m, rescore_k=100)
        idx.train_add(vectors)
    index_path = os.path.join(args.out_dir, "index.npz")
    idx.save(index_path)
    print(f"index ({args.kind}): {index_path} ({time.time() - t0:.1f}s)")

    if args.tokens:
        from rag_inference_pipeline_tpu.core import get_settings
        from rag_inference_pipeline_tpu.models.components import LLMComponent

        llm = LLMComponent(get_settings())
        # tokenizer only — no weights needed for the token store
        llm.tokenizer = __import__(
            "rag_inference_pipeline_tpu.models.tokenizer", fromlist=["make_tokenizer"]
        ).make_tokenizer(
            llm.model_name, get_settings().model_weights_dir,
            vocab_size=llm.cfg.vocab_size, pad_id=0, eos_id=2,
        )
        tok_ids, tok_mask = llm.tokenizer.encode_batch(
            [d[2] for d in docs], args.doc_tok_len
        )
        tok_path = os.path.join(args.out_dir, "doc_tokens.npy")
        np.save(tok_path, tok_ids.astype(np.int32))
        # explicit validity mask: token id 0 can be a real vocab token under
        # a real tokenizer, so `ids > 0` is not a safe pad test downstream
        mask_path = os.path.join(args.out_dir, "doc_tokens_mask.npy")
        np.save(mask_path, tok_mask.astype(np.uint8))
        print(f"doc token store: {tok_path} {tok_ids.shape} (+mask)")
    print(
        "\nServe with:\n"
        f"  INDEX_PATH={index_path} DOCUMENT_DB_PATH={db_path} "
        f"DOC_STORE_BACKEND={args.backend} INDEX_DIM={dim} "
        "python -m rag_inference_pipeline_tpu.serve.runtime"
    )


if __name__ == "__main__":
    main()
