"""Fused serving executor: the whole RAG hot path as one device program.

The BASELINE.json north star made concrete: when a node hosts embedder +
flat index + LLM and `USE_FUSED_PIPELINE=1`, queries run through
engine/device_pipeline._rag_step — embed -> ANN -> on-device context-token
gather -> KV-cache greedy decode in ONE jit. Retrieved documents never exist
on the host; only final token ids come back. Sentiment/toxicity classify the
decoded text host-side to keep the reference's response contract.

Requires a document *token* store (doc_tokens.npy, decoder token space)
built by scripts/create_test_docs.py --tokens.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import numpy as np

from ..core.config import Settings
from ..utils.shapes import pad_rows, pick_bucket
from .device_pipeline import DeviceRAGPipeline

logger = logging.getLogger(__name__)


class FusedExecutor:
    def __init__(
        self,
        settings: Settings,
        *,
        mesh_ctx,
        embedder,  # loaded EmbedderComponent
        index,  # loaded FlatIndex (provides raw vectors)
        llm,  # loaded LLMComponent
        sentiment=None,
        toxicity=None,
    ) -> None:
        self.settings = settings
        self.embedder = embedder
        self.llm = llm
        self.sentiment = sentiment
        self.toxicity = toxicity
        from ..telemetry.profiling import SampledStageProfiler

        self.profiler = SampledStageProfiler(settings, "fused")
        # ONE pipeline: jax.jit specializes per input shape internally, and a
        # per-bucket pipeline would duplicate the HBM-resident corpus/params
        self._pipe: Optional[DeviceRAGPipeline] = None
        # sentiment + toxicity as ONE device dispatch (they were two serial
        # ~30 ms tunnel RTTs — the top serving-p50 line after the fused step)
        self._joint_fwd = None
        self.mesh_ctx = mesh_ctx
        self.index = index
        self.doc_tokens: Optional[np.ndarray] = None

    @property
    def is_loaded(self) -> bool:
        return self.doc_tokens is not None

    def load(self) -> None:
        s = self.settings
        if not s.doc_tokens_path:
            raise ValueError("use_fused_pipeline requires doc_tokens_path")
        self.doc_tokens = np.load(s.doc_tokens_path).astype(np.int32)
        # explicit validity mask written by create_test_docs --tokens; with a
        # real tokenizer `ids > 0` is wrong (id 0 can be a vocab token)
        mask_path = s.doc_tokens_path.replace(".npy", "_mask.npy")
        if os.path.exists(mask_path):
            self.doc_token_mask = np.load(mask_path).astype(np.int32)
        else:
            logger.warning(
                "no %s — falling back to `token id > 0` as the pad test "
                "(only safe for the hash tokenizer)", mask_path,
            )
            self.doc_token_mask = (self.doc_tokens > 0).astype(np.int32)
        inner = getattr(self.index, "index", self.index)
        if inner.kind != "flat":
            raise ValueError("fused pipeline requires a flat index")
        n = inner.ntotal
        if self.doc_tokens.shape[0] < n:
            raise ValueError(
                f"doc token store has {self.doc_tokens.shape[0]} rows, "
                f"index has {n}"
            )
        # raw vectors: bf16/f32 store, or the int8 index's bf16 rescore copy
        # (falling back to dequantized codes when rescore is off) — the fused
        # step re-quantizes with ONE global scale so every dp shard agrees
        self._index_dtype = (
            "int8" if getattr(inner, "dtype_name", "") == "int8" else "bfloat16"
        )
        # device fast path: an int8 index with a device-resident bf16
        # rescore copy already holds exactly the arrays the fused step
        # scans — reuse them instead of re-uploading the corpus as f32
        # (3 GB / minutes through the tunnel at 1M rows) and duplicating
        # 2.3 GB in HBM
        self._dev_arrays = None
        self._db_host = None
        if (
            self._index_dtype == "int8"
            and getattr(inner, "_db_i8", None) is not None
            and getattr(inner, "_db", None) is not None
        ):
            self._dev_arrays = (inner._db_i8, inner._db_gscale, inner._db)
        elif getattr(inner, "_db", None) is not None:
            self._db_host = np.asarray(inner._db[:n], np.float32)
        elif self._index_dtype == "int8" and inner._db_i8 is not None:
            self._db_host = np.asarray(
                inner._db_i8[:n].astype(np.float32)
                * float(inner._db_gscale),
                np.float32,
            )
        else:
            raise ValueError("fused pipeline: index holds no vectors")
        self._ntotal = n
        logger.info(
            "fused pipeline ready: %d docs, %d ctx tokens/doc, %s scan%s",
            n, self.doc_tokens.shape[1], self._index_dtype,
            " (device-array reuse)" if self._dev_arrays else "",
        )
        if self.settings.warmup_buckets:
            # pre-compile the fused step for every batch bucket so no
            # /query ever pays a 20-40 s in-band XLA compile
            dp = self.mesh_ctx.dp
            buckets = sorted({
                -(-b // dp) * dp for b in self.settings.shape_buckets
            })
            for b in buckets:
                self._run_chunk(
                    [{"query": f"warmup {i}"} for i in range(b)],
                    tuple(buckets),
                )
                logger.info("fused warmup: bucket=%d done", b)
            if (
                self.sentiment is not None and self.sentiment.is_loaded
                and self.toxicity is not None and self.toxicity.is_loaded
            ):
                for b in self.settings.shape_buckets:
                    self._classify_joint([f"warmup {i}" for i in range(b)])
                logger.info("fused warmup: joint classifier buckets done")

    def unload(self) -> None:
        self._pipe = None
        self.doc_tokens = None
        self.doc_token_mask = None

    def _get_pipe(self) -> DeviceRAGPipeline:
        if self._pipe is None:
            s = self.settings
            pipe = DeviceRAGPipeline(
                mesh=self.mesh_ctx,
                bert_cfg=self.embedder.cfg,
                qwen_cfg=self.llm.cfg,
                k=s.retrieval_k,
                ctx_docs=s.llm_context_docs,
                doc_tok_len=self.doc_tokens.shape[1],
                max_new_tokens=s.max_tokens,
                use_fused_topk=False,  # exact scan for the bf16 path
                index_dtype=getattr(self, "_index_dtype", "bfloat16"),
                # strictly greater than k: the kernel's `rescore_k > k` gate
                # would otherwise silently disable the exact bf16 re-score
                # whenever retrieval_k >= 64 (recall 0.998 -> ~0.975)
                rescore_k=s.retrieval_k + 64,
                # per-lane n-gram speculation inside the fused step (round-3
                # VERDICT #5): token-identical to greedy unless the
                # benchmark-only acceptance injection is set
                speculative=s.use_speculative_decoding,
                spec_gamma=s.speculative_gamma,
                inject_accept_p=s.speculative_inject_p,
            )
            if self._dev_arrays is not None:
                db_i8, gscale, db_bf16 = self._dev_arrays
                pipe.build(
                    self.embedder.params, self.llm.params,
                    None, self.doc_tokens, self.doc_token_mask,
                    db_i8=db_i8, db_scale=gscale, db_rescore=db_bf16,
                    ntotal=self._ntotal,
                )
            else:
                pipe.build(
                    self.embedder.params, self.llm.params,
                    self._db_host, self.doc_tokens, self.doc_token_mask,
                )
            self._pipe = pipe
        return self._pipe

    def _query_len(self) -> int:
        """Query token budget: truncate_length capped by the embedder's
        positions and the decoder's context headroom."""
        s = self.settings
        lm_budget = (
            self.llm.cfg.max_len
            - s.max_tokens
            - s.llm_context_docs * self.doc_tokens.shape[1]
        )
        return max(16, min(
            s.truncate_length, self.embedder.cfg.max_positions, lm_budget
        ))

    def process_batch(self, items: Sequence[dict]) -> list[dict]:
        """Batch -> chunks -> pipelined device dispatches.

        Saturation structure (round-4 VERDICT #2 — at conc 50 the old
        fetch-then-dispatch loop serialized every chunk's ~30 ms tunnel
        fetch and all host work against an idle device, and classify ran
        only after ALL device steps):

        1. dispatch EVERY chunk's fused step up front (jax dispatch is
           async; the device queue runs them back-to-back while the host
           is still tokenizing later chunks),
        2. then per chunk in order: fetch tokens (blocks only on that
           chunk's step — later steps keep running), decode text, and
           immediately dispatch its joint classify, so chunk N's classify
           is enqueued while chunk N+1's step executes,
        3. fetch all classify verdicts last.

        Host work (tokenize/decode/classify-encode) now overlaps device
        work instead of gating it, and concurrent `process_batch` calls
        from other gateway batches interleave at the device queue rather
        than behind a host bubble."""
        if not items:
            return []
        s = self.settings
        # batch buckets must be dp multiples (the step shards batch over dp)
        dp = self.mesh_ctx.dp
        buckets = tuple(
            -(-b // dp) * dp for b in s.shape_buckets
        )
        prof = self.profiler.maybe_start()
        max_chunk = max(buckets)
        if s.fused_chunk_lanes > 0:
            # sub-bucket chunking: no device-time cost while per-request
            # step cost is flat across these bucket sizes, and chunk N's
            # host work overlaps chunk N+1's device step (core/config.py)
            max_chunk = min(max_chunk, -(-s.fused_chunk_lanes // dp) * dp)
        spans = [
            (a, min(a + max_chunk, len(items)))
            for a in range(0, len(items), max_chunk)
        ]
        sent_on = self.sentiment is not None and self.sentiment.is_loaded
        tox_on = self.toxicity is not None and self.toxicity.is_loaded
        joint = sent_on and tox_on
        with prof.track("device_dispatch"):
            pend = [
                self._dispatch_chunk(items[a:b], buckets) for a, b in spans
            ]
        texts: list[str] = []
        cls_pend = []
        for (a, b), out in zip(spans, pend):
            with prof.track("device_step"):
                chunk_texts = self._fetch_texts(out, b - a)
            texts.extend(chunk_texts)
            if joint:
                with prof.track("classify_dispatch"):
                    cls_pend.append(self._dispatch_classify(chunk_texts))
        if joint:
            with prof.track("classify"):
                sentiments, tox = [], []
                for cp in cls_pend:
                    lab, ver = self._fetch_classify(cp)
                    sentiments.extend(lab)
                    tox.extend(ver)
        else:
            with prof.track("sentiment"):
                sentiments = (
                    self.sentiment.analyze_batch(texts)
                    if sent_on
                    else ["neutral"] * len(texts)
                )
            with prof.track("toxicity"):
                tox = (
                    self.toxicity.check_batch(texts)
                    if tox_on
                    else [(False, 0.0)] * len(texts)
                )
        prof.finish()
        from ..serve.schemas import TOXIC_PLACEHOLDER

        return [
            {
                "generated_response": TOXIC_PLACEHOLDER if t else text,
                "sentiment": sent,
                "is_toxic": t,
            }
            for text, sent, (t, _) in zip(texts, sentiments, tox)
        ]

    def _dispatch_classify(self, texts: Sequence[str]) -> list:
        """Both post-processing classifiers in ONE jit dispatch.

        The standalone path (`SentimentComponent.analyze_batch` then
        `ToxicityComponent.check_batch`) serializes two device calls — each
        ~4 ms of encoder compute behind ~30 ms of tunnel RTT (PERF_NOTES
        "Fused SERVING" latency budget). Running both BERT heads inside one
        jitted function keeps the reference's response contract
        (components/sentiment.py:139-190 + components/toxicity.py:130-231)
        at a single dispatch. Label/threshold semantics are identical to the
        standalone methods (argmax 5-star map; multi-label sigmoid max vs
        0.5).

        The verdict reduction (argmax / sigmoid-max) also runs ON DEVICE and
        the two heads' outputs come back as ONE [B, 2] f32 array: fetching
        the raw logit pair with two `np.asarray` calls costs two tunnel
        round trips (~30 ms each — measured 72 ms/classify in
        `fused_serving_1m_20260820_011335`, no better than the serial
        dispatches it replaced). One dispatch + one tiny fetch is the floor
        for this stage.

        Returns pending (device_out, n) pairs — no host sync; pair with
        `_fetch_classify` (split so process_batch can overlap chunk N's
        classify with chunk N+1's device step, round-4 VERDICT #2)."""
        import jax
        import jax.numpy as jnp
        from functools import partial

        from ..models.bert import bert_classify
        from ..utils.shapes import chunk_spans

        sent, tox = self.sentiment, self.toxicity
        if self._joint_fwd is None:
            s_fwd = partial(bert_classify, cfg=sent.cfg)
            t_fwd = partial(bert_classify, cfg=tox.cfg)

            def joint(sp, tp, ids_s, mask_s, ids_t, mask_t):
                ls = s_fwd(sp, input_ids=ids_s, attn_mask=mask_s)
                lt = t_fwd(tp, input_ids=ids_t, attn_mask=mask_t)
                star = jnp.argmax(ls, axis=1).astype(jnp.float32)
                worst = jax.nn.sigmoid(lt.astype(jnp.float32)).max(axis=1)
                return jnp.stack([star, worst], axis=1)

            self._joint_fwd = jax.jit(joint)
        clipped = [t[:512] for t in texts]  # char-truncate, reference :157
        ids_s, mask_s = sent.tokenizer.encode_batch(clipped, sent.max_len)
        ids_t, mask_t = tox.tokenizer.encode_batch(clipped, tox.max_len)
        buckets = self.settings.shape_buckets
        pend = []
        for cs, ce in chunk_spans(len(clipped), max(buckets)):
            bucket = pick_bucket(ce - cs, buckets)
            pend.append((
                self._joint_fwd(
                    sent.params,
                    tox.params,
                    *(
                        jnp.asarray(pad_rows(a[cs:ce], bucket))
                        for a in (ids_s, mask_s, ids_t, mask_t)
                    ),
                ),
                ce - cs,
            ))
        return pend

    def _fetch_classify(
        self, pend
    ) -> tuple[list[str], list[tuple[bool, float]]]:
        """Block on dispatched joint-classify outputs -> labels/verdicts."""
        from ..models.components import _SENTIMENT_LABELS

        tox = self.toxicity
        labels: list[str] = []
        verdicts: list[tuple[bool, float]] = []
        for dev_out, n in pend:
            out = np.asarray(dev_out)[:n]
            labels.extend(_SENTIMENT_LABELS[int(i)] for i in out[:, 0])
            verdicts.extend(
                (bool(w >= tox.THRESHOLD), float(w)) for w in out[:, 1]
            )
        return labels, verdicts

    def _classify_joint(
        self, texts: Sequence[str]
    ) -> tuple[list[str], list[tuple[bool, float]]]:
        return self._fetch_classify(self._dispatch_classify(texts))

    def _dispatch_chunk(self, items: Sequence[dict], buckets):
        """Tokenize + enqueue one chunk's fused step; returns the pending
        device output (no host sync — jax dispatch is async)."""
        queries = [it.get("query", "") for it in items]
        qlen = self._query_len()
        emb_ids, emb_mask = self.embedder.tokenizer.encode_batch(queries, qlen)
        lm_ids, lm_mask = self.llm.tokenizer.encode_batch(queries, qlen)
        bucket = pick_bucket(len(items), buckets)
        emb_ids, emb_mask, lm_ids, lm_mask = (
            pad_rows(a, bucket) for a in (emb_ids, emb_mask, lm_ids, lm_mask)
        )
        emb_mask[len(items):, 0] = 1  # keep padded lanes position-valid
        lm_mask[len(items):, 0] = 1
        return self._get_pipe().step(emb_ids, emb_mask, lm_ids, lm_mask)

    def _fetch_texts(self, out, n: int) -> list[str]:
        """Block on one dispatched chunk's tokens and decode to text."""
        toks = np.asarray(out.tokens)[:n]
        eos = self.llm.tokenizer.eos_id
        texts = []
        for row in toks:
            stop = np.where(row == eos)[0]
            end = int(stop[0]) if len(stop) else len(row)
            texts.append(self.llm.tokenizer.decode(row[:end]))
        return texts

    def _run_chunk(self, items: Sequence[dict], buckets) -> list[str]:
        return self._fetch_texts(
            self._dispatch_chunk(items, buckets), len(items)
        )
