"""Round-4 additions.

- Joint sentiment+toxicity classifier dispatch (engine/fused_executor.py::
  _classify_joint) must be decision-identical to the standalone component
  paths it replaces (reference components/sentiment.py:139-190 and
  components/toxicity.py:130-231 semantics).
"""

import numpy as np
import pytest

from tests.test_serve import tiny_settings


class TestJointClassifier:
    @pytest.fixture(scope="class")
    def stack(self):
        from rag_inference_pipeline_tpu.engine.fused_executor import (
            FusedExecutor,
        )
        from rag_inference_pipeline_tpu.models.components import (
            SentimentComponent,
            ToxicityComponent,
        )

        s = tiny_settings(use_fused_pipeline=True)
        sent = SentimentComponent(s)
        sent.load()
        tox = ToxicityComponent(s)
        tox.load()

        class _Mesh:
            dp = 1
            tp = 1

        ex = FusedExecutor(
            s, mesh_ctx=_Mesh(), embedder=None, index=None, llm=None,
            sentiment=sent, toxicity=tox,
        )
        return ex, sent, tox

    def test_joint_matches_standalone(self, stack):
        ex, sent, tox = stack
        texts = [
            "the results were wonderful and everyone was happy",
            "terrible, broken, a disaster of a product",
            "the quarterly report is attached",
            "",
            "x" * 2000,  # exercises the 512-char truncation
        ]
        labels_j, verdicts_j = ex._classify_joint(texts)
        labels_s = sent.analyze_batch(texts)
        verdicts_s = tox.check_batch(texts)
        assert labels_j == labels_s
        assert [v[0] for v in verdicts_j] == [v[0] for v in verdicts_s]
        np.testing.assert_allclose(
            [v[1] for v in verdicts_j],
            [v[1] for v in verdicts_s],
            rtol=2e-5, atol=2e-6,
        )

    def test_joint_chunks_over_max_bucket(self, stack):
        ex, sent, tox = stack
        n = max(ex.settings.shape_buckets) + 3  # forces a second chunk
        texts = [f"sample text number {i}" for i in range(n)]
        labels_j, verdicts_j = ex._classify_joint(texts)
        assert len(labels_j) == n and len(verdicts_j) == n
        assert labels_j == sent.analyze_batch(texts)


class TestPipelinedProcessBatch:
    """Round-5 saturation restructure (round-4 VERDICT #2): process_batch
    dispatches every chunk's device step before fetching any, and overlaps
    chunk N's classify with chunk N+1's step. The pipelining must not
    change WHAT comes back: one well-formed, correctly-ordered response
    per item across multiple chunks."""

    def test_multi_chunk_order_and_contract(self):
        from rag_inference_pipeline_tpu.engine.device_pipeline import (
            RAGStepOutput,
        )
        from rag_inference_pipeline_tpu.engine.fused_executor import (
            FusedExecutor,
        )
        from rag_inference_pipeline_tpu.models.components import (
            EmbedderComponent,
            LLMComponent,
            SentimentComponent,
            ToxicityComponent,
        )
        from tests.test_serve import tiny_settings

        s = tiny_settings(use_fused_pipeline=True)
        emb = EmbedderComponent(s)
        emb.load()
        llm = LLMComponent(s)
        llm.load()
        sent = SentimentComponent(s)
        sent.load()
        tox = ToxicityComponent(s)
        tox.load()

        class _Mesh:
            dp = 1
            tp = 1

        ex = FusedExecutor(
            s, mesh_ctx=_Mesh(), embedder=emb, index=None, llm=llm,
            sentiment=sent, toxicity=tox,
        )
        ex.doc_tokens = np.ones((8, 4), np.int32)

        dispatched_batches = []

        class _EchoPipe:
            """Encodes the GLOBAL item counter into each lane's tokens so
            cross-chunk ordering mistakes are visible in the output."""

            def __init__(self):
                self.counter = 0

            def step(self, emb_ids, emb_mask, lm_ids, lm_mask):
                b = emb_ids.shape[0]
                dispatched_batches.append(b)
                toks = np.zeros((b, 4), np.int64)
                for lane in range(b):
                    toks[lane, :] = 10 + self.counter
                    self.counter += 1
                return RAGStepOutput(
                    tokens=toks,
                    doc_ids=np.zeros((b, 5), np.int32),
                    scores=np.zeros((b, 5), np.float32),
                )

        ex._pipe = _EchoPipe()
        n = max(s.shape_buckets) * 2 + 3  # 3 chunks at the max bucket
        out = ex.process_batch([{"query": f"q{i}"} for i in range(n)])
        assert len(out) == n
        assert len(dispatched_batches) == 3
        decode_one = llm.tokenizer.decode
        for i, item in enumerate(out):
            assert {"generated_response", "sentiment", "is_toxic"} <= set(item)
            expect = decode_one(np.full(4, 10 + i, np.int64))
            if not item["is_toxic"]:
                assert item["generated_response"] == expect, i

    def test_classify_dispatch_fetch_split_matches_joint(self):
        """_dispatch_classify + _fetch_classify == _classify_joint (the
        warmup/serial entry point) on the same texts."""
        from rag_inference_pipeline_tpu.engine.fused_executor import (
            FusedExecutor,
        )
        from rag_inference_pipeline_tpu.models.components import (
            SentimentComponent,
            ToxicityComponent,
        )
        from tests.test_serve import tiny_settings

        s = tiny_settings(use_fused_pipeline=True)
        sent = SentimentComponent(s)
        sent.load()
        tox = ToxicityComponent(s)
        tox.load()

        class _Mesh:
            dp = 1
            tp = 1

        ex = FusedExecutor(
            s, mesh_ctx=_Mesh(), embedder=None, index=None, llm=None,
            sentiment=sent, toxicity=tox,
        )
        texts = [f"text {i} with mixed feelings" for i in range(6)]
        got = ex._fetch_classify(ex._dispatch_classify(texts))
        assert got == ex._classify_joint(texts)

    def test_fused_chunk_lanes_split(self):
        """fused_chunk_lanes=K splits a flush into ceil(n/K) pipelined
        device chunks (results identical to whole-bucket chunking)."""
        from rag_inference_pipeline_tpu.engine.device_pipeline import (
            RAGStepOutput,
        )
        from rag_inference_pipeline_tpu.engine.fused_executor import (
            FusedExecutor,
        )
        from rag_inference_pipeline_tpu.models.components import (
            EmbedderComponent,
            LLMComponent,
        )
        from tests.test_serve import tiny_settings

        s = tiny_settings(use_fused_pipeline=True, fused_chunk_lanes=2)
        emb = EmbedderComponent(s)
        emb.load()
        llm = LLMComponent(s)
        llm.load()

        class _Mesh:
            dp = 1
            tp = 1

        ex = FusedExecutor(
            s, mesh_ctx=_Mesh(), embedder=emb, index=None, llm=llm,
        )
        ex.doc_tokens = np.ones((8, 4), np.int32)
        sizes = []

        class _Pipe:
            def step(self, emb_ids, emb_mask, lm_ids, lm_mask):
                b = emb_ids.shape[0]
                sizes.append(b)
                return RAGStepOutput(
                    tokens=np.full((b, 4), 7, np.int64),
                    doc_ids=np.zeros((b, 5), np.int32),
                    scores=np.zeros((b, 5), np.float32),
                )

        ex._pipe = _Pipe()
        out = ex.process_batch([{"query": f"q{i}"} for i in range(7)])
        assert len(out) == 7
        assert sizes == [2, 2, 2, 1]  # 4 chunks of <=2; tail picks bucket 1
