"""int8 weight-quantized BERT encoders (W8A8-dynamic, encoder_weight_quant).

The encoder at serving shapes (B>=8, T=512) is MXU-compute-bound; the v5e
MXU runs s8xs8->s32 at twice the bf16 rate, so quantizing the matmul
weights buys throughput rather than bandwidth (the opposite regime from
B=1 decode — see test_quant_llm.py). These tests pin (a) embedding /
classification accuracy of the quantized forward vs f32, (b) rerank
ordering stability, (c) TP-sharded numerics over quantized leaves, and
(d) the Settings knob wiring across all four BERT-family components.
The reference serves these models as fp32 torch (components/embedding.py,
reranker.py, sentiment.py, toxicity.py) with no quantization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_inference_pipeline_tpu.core import Settings
from rag_inference_pipeline_tpu.models.bert import (
    BertConfig,
    bert_classify,
    bert_embed,
    init_bert_params,
    quantize_bert_params,
)
from rag_inference_pipeline_tpu.models.layers import QuantizedLinear
from rag_inference_pipeline_tpu.parallel.sharding import (
    bert_param_sharding,
    shard_params,
)

CFG = BertConfig.tiny()
CFG_CLS = BertConfig.tiny(num_labels=5)
PARAMS = init_bert_params(jax.random.key(0), CFG)
QPARAMS = quantize_bert_params(PARAMS)
PARAMS_CLS = init_bert_params(jax.random.key(1), CFG_CLS)
QPARAMS_CLS = quantize_bert_params(PARAMS_CLS)


def _ids(rng, b=4, t=16):
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (b, t)), jnp.int32)
    return ids, jnp.ones_like(ids)


class TestQuantBertAccuracy:
    def test_param_tree_quantized(self):
        lp = QPARAMS["layers"][0]
        for k in ("q_w", "k_w", "v_w", "o_w", "ffn_in_w", "ffn_out_w"):
            assert isinstance(lp[k], QuantizedLinear)
        assert isinstance(QPARAMS["pooler"]["w"], QuantizedLinear)
        assert isinstance(QPARAMS_CLS["classifier"]["w"], QuantizedLinear)
        # embeddings are gathers, not matmuls — untouched
        assert QPARAMS["embeddings"]["word"] is PARAMS["embeddings"]["word"]
        # norms/biases untouched
        assert lp["attn_ln_w"] is PARAMS["layers"][0]["attn_ln_w"]

    def test_embedding_cosine_close_to_f32(self, rng):
        ids, mask = _ids(rng)
        ef = np.asarray(bert_embed(PARAMS, CFG, ids, mask))
        eq = np.asarray(bert_embed(QPARAMS, CFG, ids, mask))
        # both already L2-normalized — cosine is just the dot
        cos = (ef * eq).sum(-1)
        assert cos.min() > 0.995

    def test_embedding_search_ordering_preserved(self, rng):
        """The embedder's job is ANN search: quantization must not scramble
        nearest-neighbor ordering among distinct inputs."""
        ids, mask = _ids(rng, b=8)
        ef = np.asarray(bert_embed(PARAMS, CFG, ids, mask))
        eq = np.asarray(bert_embed(QPARAMS, CFG, ids, mask))
        q = ef[0]
        rank_f = np.argsort(-(ef[1:] @ q))
        rank_q = np.argsort(-(eq[1:] @ np.asarray(eq[0])))
        assert (rank_f[:3] == rank_q[:3]).mean() >= 2 / 3

    def test_classify_logits_close_to_f32(self, rng):
        ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (3, 12)), jnp.int32)
        mask = jnp.ones_like(ids)
        lf = np.asarray(bert_classify(PARAMS_CLS, CFG_CLS, ids, mask))
        lq = np.asarray(bert_classify(QPARAMS_CLS, CFG_CLS, ids, mask))
        # logits live on an arbitrary scale; pin relative agreement
        cos = (lf * lq).sum(-1) / (
            np.linalg.norm(lf, axis=-1) * np.linalg.norm(lq, axis=-1) + 1e-9
        )
        assert cos.min() > 0.99
        # argmax (the served label) must agree on a clear majority
        assert (lf.argmax(-1) == lq.argmax(-1)).mean() >= 2 / 3


class TestQuantBertSharding:
    def test_tp_sharded_quant_matches_single(self, rng, mesh8):
        shardings = bert_param_sharding(mesh8, QPARAMS)
        sharded = shard_params(mesh8, QPARAMS, shardings)
        lp = sharded["layers"][0]
        assert "tp" in str(lp["q_w"].q.sharding.spec)
        assert "tp" in str(lp["q_w"].s.sharding.spec)
        # row-split weights keep replicated scales (dequant after the psum)
        assert lp["o_w"].s.sharding.spec == jax.sharding.PartitionSpec()
        ids, mask = _ids(rng)
        solo = np.asarray(bert_embed(QPARAMS, CFG, ids, mask))
        tp = np.asarray(bert_embed(sharded, CFG, ids, mask))
        np.testing.assert_allclose(tp, solo, atol=2e-5)


class TestQuantBertConfigWiring:
    def test_validator_rejects_unknown(self):
        with pytest.raises(ValueError):
            Settings(encoder_weight_quant="fp4")

    def test_all_four_components_load_quantized(self):
        from rag_inference_pipeline_tpu.models.components import (
            EmbedderComponent,
            RerankerComponent,
            SentimentComponent,
            ToxicityComponent,
        )

        s = Settings(
            embedding_model="tiny-embed",
            reranker_model="tiny-rerank",
            sentiment_model="tiny-sentiment",
            toxicity_model="tiny-toxicity",
            param_dtype="float32",
            encoder_weight_quant="int8",
            shape_buckets=[2],
            warmup_buckets=False,
        )
        emb = EmbedderComponent(s)
        emb.load()
        assert isinstance(emb.params["layers"][0]["q_w"], QuantizedLinear)
        vecs = emb.encode(["hello", "world"])
        assert vecs.shape == (2, emb.dim)
        np.testing.assert_allclose(
            np.linalg.norm(vecs, axis=-1), 1.0, atol=1e-5
        )
        emb.unload()

        rr = RerankerComponent(s)
        rr.load()
        assert isinstance(rr.params["pooler"]["w"], QuantizedLinear)
        ranked = rr.rerank("q", [{"id": 1, "content": "a"}, {"id": 2, "content": "b"}])
        assert len(ranked) == 2 and "rerank_score" in ranked[0]
        rr.unload()

        for cls in (SentimentComponent, ToxicityComponent):
            c = cls(s)
            c.load()
            assert isinstance(
                c.params["classifier"]["w"], QuantizedLinear
            )
            c.unload()
