"""Model tests on tiny configs: numerics, cache-consistency, component
semantics. The reference tests models with mocked HF classes (SURVEY.md
section 4 item 3); here tiny real models run the actual compute path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_inference_pipeline_tpu.core import Settings
from rag_inference_pipeline_tpu.models import (
    BertConfig,
    EmbedderComponent,
    LLMComponent,
    QwenConfig,
    RerankerComponent,
    SentimentComponent,
    ToxicityComponent,
    bert_classify,
    bert_embed,
    bert_encode,
    greedy_generate,
    init_bert_params,
    init_qwen_params,
    qwen_forward,
)
from rag_inference_pipeline_tpu.models.tokenizer import HashTokenizer


@pytest.fixture()
def tiny_settings(tmp_path):
    return Settings(
        embedding_model="tiny-embed",
        reranker_model="tiny-rerank",
        llm_model="tiny-llm",
        sentiment_model="tiny-sentiment",
        toxicity_model="tiny-toxicity",
        batch_shape_buckets="1,2,4,8",
        prefill_buckets="16,32",
        max_tokens=8,
        truncate_length=64,
        param_dtype="float32",
    )


class TestBert:
    def test_encode_shapes_and_padding_invariance(self):
        cfg = BertConfig.tiny()
        params = init_bert_params(jax.random.key(0), cfg)
        ids = jnp.asarray([[101, 5, 6, 102, 0, 0, 0, 0]], jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]], jnp.int32)
        h = bert_encode(params, cfg, ids, mask)
        assert h.shape == (1, 8, cfg.hidden)
        # garbage in the padded tail must not change valid outputs
        ids2 = ids.at[0, 5].set(999)
        h2 = bert_encode(params, cfg, ids2, mask)
        np.testing.assert_allclose(
            np.asarray(h[:, :4]), np.asarray(h2[:, :4]), atol=1e-5
        )

    def test_embed_normalized(self):
        cfg = BertConfig.tiny()
        params = init_bert_params(jax.random.key(0), cfg)
        ids = jnp.asarray([[101, 5, 6, 102]], jnp.int32)
        mask = jnp.ones_like(ids)
        e = bert_embed(params, cfg, ids, mask)
        assert e.dtype == jnp.float32
        np.testing.assert_allclose(float(jnp.linalg.norm(e)), 1.0, rtol=1e-5)

    def test_classify_shape(self):
        cfg = BertConfig.tiny(num_labels=5)
        params = init_bert_params(jax.random.key(0), cfg)
        ids = jnp.asarray([[101, 5, 102], [101, 7, 102]], jnp.int32)
        logits = bert_classify(params, cfg, ids, jnp.ones_like(ids))
        assert logits.shape == (2, 5)


class TestQwen:
    def test_cache_decode_matches_full_forward(self):
        """KV-cache greedy path must agree with the no-cache forward."""
        cfg = QwenConfig.tiny()
        params = init_qwen_params(jax.random.key(0), cfg)
        ids = jnp.asarray([[3, 5, 7, 9, 0, 0], [4, 6, 0, 0, 0, 0]], jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0]], jnp.int32)

        toks = greedy_generate(params, cfg, ids, mask, 4, eos_token_id=-1)
        assert toks.shape == (2, 4)

        # manual no-cache greedy rollout
        cur_ids, cur_mask = np.asarray(ids), np.asarray(mask)
        expect = []
        for step in range(4):
            logits = qwen_forward(params, cfg, jnp.asarray(cur_ids), jnp.asarray(cur_mask))
            lengths = cur_mask.sum(axis=1)
            last = np.asarray(logits)[np.arange(2), lengths - 1]
            nxt = last.argmax(-1).astype(np.int32)
            expect.append(nxt)
            new_ids = np.zeros((2, cur_ids.shape[1] + 1), np.int32)
            new_mask = np.zeros_like(new_ids)
            for b in range(2):
                L = lengths[b]
                new_ids[b, :L] = cur_ids[b, :L]
                new_ids[b, L] = nxt[b]
                new_mask[b, : L + 1] = 1
            cur_ids, cur_mask = new_ids, new_mask
        np.testing.assert_array_equal(np.asarray(toks), np.stack(expect, axis=1))

    def test_eos_stops_and_pads(self):
        cfg = QwenConfig.tiny()
        params = init_qwen_params(jax.random.key(1), cfg)
        ids = jnp.asarray([[3, 5, 7]], jnp.int32)
        mask = jnp.ones_like(ids)
        logits = qwen_forward(params, cfg, ids, mask)
        eos = int(jnp.argmax(logits[0, -1]))  # force eos = the argmax token
        toks = np.asarray(
            greedy_generate(params, cfg, ids, mask, 5, eos_token_id=eos)
        )
        assert (toks == eos).all()


class TestHashTokenizer:
    def test_deterministic_and_padded(self):
        tk = HashTokenizer(vocab_size=1024)
        a1, m1 = tk.encode("hello world", 16)
        a2, _ = tk.encode("hello world", 16)
        np.testing.assert_array_equal(a1, a2)
        assert m1.sum() == 4  # cls + 2 words + sep
        assert a1[m1 == 0].sum() == 0

    def test_pair_batch_token_types(self):
        tk = HashTokenizer(vocab_size=1024)
        ids, mask, tt = tk.encode_pair_batch([("a b", "c d e")], 16)
        assert tt[0, mask[0] == 0].sum() == 0
        assert tt.max() == 1


class TestComponents:
    def test_embedder_cache_and_shapes(self, tiny_settings):
        emb = EmbedderComponent(tiny_settings)
        emb.load()
        assert emb.random_weights  # offline mode
        v1 = emb.encode(["alpha beta", "gamma"])
        assert v1.shape == (2, 64)
        np.testing.assert_allclose(np.linalg.norm(v1, axis=1), 1.0, rtol=1e-4)
        v2 = emb.encode(["gamma", "alpha beta"])  # cache-hit order flip
        np.testing.assert_allclose(v1[0], v2[1], atol=1e-6)
        emb.unload()
        assert not emb.is_loaded

    def test_reranker_orders_and_batches(self, tiny_settings):
        rr = RerankerComponent(tiny_settings)
        rr.load()
        docs = [{"id": i, "content": f"doc number {i}"} for i in range(5)]
        top = rr.rerank("some query", docs, top_n=3)
        assert len(top) == 3
        scores = [d["rerank_score"] for d in top]
        assert scores == sorted(scores, reverse=True)
        batch = rr.rerank_batch(["q1", "q2"], [docs, docs[:2]], top_n=2)
        assert len(batch) == 2 and len(batch[1]) == 2
        assert rr.rerank("q", []) == []

    def test_llm_generates_strings(self, tiny_settings):
        llm = LLMComponent(tiny_settings)
        llm.load()
        docs = [{"content": "context document"}]
        outs = llm.generate_batch(["what?", "why?"], [docs, docs])
        assert len(outs) == 2 and all(isinstance(o, str) for o in outs)
        one = llm.generate("what?", docs)
        assert isinstance(one, str)

    def test_prompt_truncates_docs(self, tiny_settings):
        llm = LLMComponent(tiny_settings)
        docs = [{"content": "x" * 1000}] * 5
        p = llm.build_prompt("q", docs)
        # top-3 docs only, 200 chars each (reference llm.py:277-279)
        assert p.count("Document") == 3
        assert "x" * 201 not in p

    def test_sentiment_labels(self, tiny_settings):
        s = SentimentComponent(tiny_settings)
        s.load()
        out = s.analyze_batch(["great stuff", "terrible stuff"])
        valid = {"very negative", "negative", "neutral", "positive", "very positive"}
        assert set(out) <= valid
        assert s.analyze("fine") in valid

    def test_toxicity_threshold(self, tiny_settings):
        t = ToxicityComponent(tiny_settings)
        t.load()
        out = t.check_batch(["hello there"])
        assert len(out) == 1
        is_toxic, score = out[0]
        assert isinstance(is_toxic, bool) and 0.0 <= score <= 1.0
        assert is_toxic == (score >= 0.5)

    def test_unloaded_raises(self, tiny_settings):
        emb = EmbedderComponent(tiny_settings)
        with pytest.raises(RuntimeError):
            emb.encode(["x"])


class TestBucketWarmup:
    def test_warmup_buckets_precompiles(self, tmp_path):
        from rag_inference_pipeline_tpu.core import Settings
        from rag_inference_pipeline_tpu.models import EmbedderComponent, LLMComponent

        s = Settings(
            embedding_model="tiny-embed", llm_model="tiny-llm",
            param_dtype="float32", batch_shape_buckets="1,2",
            prefill_buckets="16", max_tokens=4, truncate_length=32,
            warmup_buckets=True,
        )
        emb = EmbedderComponent(s)
        emb.load()  # must not raise; compiles buckets 1 and 2
        assert emb.encode(["a", "b"]).shape == (2, 64)
        llm = LLMComponent(s)
        llm.load()
        # generate programs for both buckets already compiled
        assert set(llm._gen) == {(1, 16, 4), (2, 16, 4)}


class TestEmptyInputs:
    def test_batch_apis_accept_empty(self, tiny_settings):
        from rag_inference_pipeline_tpu.models import (
            EmbedderComponent, LLMComponent, RerankerComponent,
            SentimentComponent, ToxicityComponent,
        )

        emb = EmbedderComponent(tiny_settings); emb.load()
        assert emb.encode([]).shape == (0, 64)
        rr = RerankerComponent(tiny_settings); rr.load()
        assert rr.score_pairs([]).shape == (0,)
        s = SentimentComponent(tiny_settings); s.load()
        assert s.analyze_batch([]) == []
        t = ToxicityComponent(tiny_settings); t.load()
        assert t.check_batch([]) == []
        llm = LLMComponent(tiny_settings); llm.load()
        assert llm.generate_batch([], []) == []
