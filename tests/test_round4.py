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
