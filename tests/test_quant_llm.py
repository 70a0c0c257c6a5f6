"""int8 weight-quantized LLM decode (W8A8-dynamic, llm_weight_quant="int8").

Decode at B=1 is a weight-stream problem (PERF_NOTES: 1.70 ms/step = the
0.92 GB bf16 read); quantizing matmul weights to int8 halves the bytes per
step. These tests pin (a) accuracy of the quantized forward vs the f32
model, (b) token identity between every decode path (static greedy, engine,
speculative, TP-sharded) over the SAME quantized params, and (c) the
Settings knob wiring. The reference has no quantized inference
(components/llm.py loads fp32 torch weights); this is a TPU-first addition
using the same s8xs8->s32 MXU dot as the index kernels.
"""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_inference_pipeline_tpu.core import Settings
from rag_inference_pipeline_tpu.engine.decode_engine import DecodeEngine
from rag_inference_pipeline_tpu.models.layers import (
    QuantizedEmbed,
    QuantizedLinear,
    quantize_linear,
)
from rag_inference_pipeline_tpu.models.qwen import (
    QwenConfig,
    greedy_generate,
    init_qwen_params,
    ngram_speculative_generate,
    param_compute_dtype,
    quantize_qwen_params,
    qwen_forward,
)
from rag_inference_pipeline_tpu.parallel.sharding import (
    qwen_param_sharding,
    shard_params,
)

CFG = QwenConfig.tiny()
PARAMS = init_qwen_params(jax.random.key(0), CFG)
QPARAMS = quantize_qwen_params(PARAMS)
EOS = CFG.vocab_size - 1


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


class TestQuantization:
    def test_quantize_linear_roundtrip(self, rng):
        w = rng.standard_normal((64, 48)).astype(np.float32)
        q = quantize_linear(jnp.asarray(w))
        assert q.q.dtype == jnp.int8 and q.s.shape == (48,)
        deq = np.asarray(q.q, np.float32) * np.asarray(q.s)[None, :]
        # symmetric per-column abs-max: max error <= scale/2 per element
        np.testing.assert_allclose(deq, w, atol=float(np.asarray(q.s).max()) / 2 + 1e-6)

    def test_param_tree_quantized(self):
        assert isinstance(QPARAMS["embed"], QuantizedEmbed)
        lp = QPARAMS["layers"][0]
        for k in ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w"):
            assert isinstance(lp[k], QuantizedLinear)
        # norms/biases untouched
        assert lp["in_ln"].dtype == PARAMS["layers"][0]["in_ln"].dtype
        assert param_compute_dtype(QPARAMS) == jnp.float32

    def test_quantized_logits_close_to_f32(self, rng):
        ids = jnp.asarray(rng.integers(1, 400, (2, 8)), jnp.int32)
        mask = jnp.ones_like(ids)
        lf = np.asarray(qwen_forward(PARAMS, CFG, ids, mask)[:, -1])
        lq = np.asarray(qwen_forward(QPARAMS, CFG, ids, mask)[:, -1])
        cos = (lf * lq).sum(-1) / (
            np.linalg.norm(lf, axis=-1) * np.linalg.norm(lq, axis=-1)
        )
        assert cos.min() > 0.999

    def test_untied_lm_head_quantized_logits(self, rng):
        """Non-tied path: lm_head becomes QuantizedLinear and _logits takes
        the untied int8 branch (Qwen2.5 ties embeddings, so the tied branch
        is what every other test exercises)."""
        import dataclasses

        cfg = dataclasses.replace(CFG, tie_embeddings=False)
        params = init_qwen_params(jax.random.key(1), cfg)
        qp = quantize_qwen_params(params)
        assert isinstance(qp["lm_head"], QuantizedLinear)
        ids = jnp.asarray(rng.integers(1, 400, (2, 6)), jnp.int32)
        mask = jnp.ones_like(ids)
        lf = np.asarray(qwen_forward(params, cfg, ids, mask)[:, -1])
        lq = np.asarray(qwen_forward(qp, cfg, ids, mask)[:, -1])
        cos = (lf * lq).sum(-1) / (
            np.linalg.norm(lf, axis=-1) * np.linalg.norm(lq, axis=-1)
        )
        assert cos.min() > 0.999

    def test_greedy_tokens_mostly_agree_with_f32(self, rng):
        ids = jnp.asarray(rng.integers(1, 400, (2, 8)), jnp.int32)
        mask = jnp.ones_like(ids)
        tf = np.asarray(greedy_generate(PARAMS, CFG, ids, mask, 8))
        tq = np.asarray(greedy_generate(QPARAMS, CFG, ids, mask, 8))
        assert (tf == tq).mean() >= 0.75  # quantization may flip rare argmaxes


class TestQuantDecodePaths:
    """All decode paths must be token-IDENTICAL over the same quantized params."""

    def _greedy(self, prompts, mask, max_new):
        return np.asarray(
            greedy_generate(
                QPARAMS, CFG, jnp.asarray(prompts), jnp.asarray(mask), max_new,
                eos_token_id=EOS, cache_len=prompts.shape[1] + max_new,
            )
        )

    def test_speculative_matches_greedy(self, rng):
        prompts = rng.integers(1, 400, (2, 8)).astype(np.int32)
        mask = np.ones_like(prompts)
        solo = self._greedy(prompts, mask, 10)
        spec, mpc = ngram_speculative_generate(
            QPARAMS, CFG, jnp.asarray(prompts), jnp.asarray(mask), 10,
            eos_token_id=EOS, gamma=4,
        )
        np.testing.assert_array_equal(np.asarray(spec), solo)
        assert float(mpc) >= 1.0

    def test_engine_matches_greedy(self, rng):
        prompts = [rng.integers(1, 400, n).astype(np.int32) for n in (5, 9)]

        async def collect():
            eng = DecodeEngine(
                QPARAMS, CFG, lanes=4, cache_len=64, segment_steps=4,
                eos_token_id=EOS, admit_buckets=(1, 2, 4),
                prefill_buckets=(8, 16),
            )
            await eng.start()
            outs = await asyncio.gather(*[eng.submit(p, 10) for p in prompts])
            await eng.stop()
            return outs

        outs = run(collect())
        for p, got in zip(prompts, outs):
            padded = p[None, :]
            solo = self._greedy(padded, np.ones_like(padded), 10)[0]
            n = min(len(got), len(solo))
            np.testing.assert_array_equal(np.asarray(got[:n]), solo[:n])

    def test_tp_sharded_quant_token_identical(self, rng, mesh8):
        sharded = shard_params(
            mesh8, QPARAMS, qwen_param_sharding(mesh8, QPARAMS)
        )
        # int8 block follows the column split; its scale vector rides along
        lp = sharded["layers"][0]
        assert "tp" in str(lp["q_w"].q.sharding.spec)
        assert "tp" in str(lp["q_w"].s.sharding.spec)
        # row-split weights keep replicated scales (dequant after the psum)
        assert lp["o_w"].s.sharding.spec == jax.sharding.PartitionSpec()
        prompts = rng.integers(1, 400, (4, 8)).astype(np.int32)
        mask = np.ones_like(prompts)
        solo = self._greedy(prompts, mask, 6)
        tp = np.asarray(
            greedy_generate(
                sharded, CFG, jnp.asarray(prompts), jnp.asarray(mask), 6,
                eos_token_id=EOS, cache_len=prompts.shape[1] + 6,
            )
        )
        np.testing.assert_array_equal(tp, solo)


class TestQuantConfigWiring:
    def test_validator_rejects_unknown(self):
        with pytest.raises(ValueError):
            Settings(llm_weight_quant="fp4")

    def test_component_loads_quantized(self):
        from rag_inference_pipeline_tpu.models.components import LLMComponent

        s = Settings(
            llm_model="tiny", param_dtype="float32", llm_weight_quant="int8",
        )
        comp = LLMComponent(s)
        comp.load()
        assert isinstance(comp.params["layers"][0]["q_w"], QuantizedLinear)
        out = comp.generate_batch(
            ["hello world"], [[{"content": "doc one"}]], max_new_tokens=4,
        )
        assert len(out) == 1 and isinstance(out[0], str)
        comp.unload()


class TestQuantFusedPipeline:
    def test_device_pipeline_builds_and_steps_quantized(self, rng, mesh8):
        """The fused RAG step over QUANTIZED decoder params on a dp x tp
        mesh — the production fused-serving combination (USE_FUSED_PIPELINE
        + llm_weight_quant=int8)."""
        from rag_inference_pipeline_tpu.engine.device_pipeline import (
            DeviceRAGPipeline,
        )
        from rag_inference_pipeline_tpu.models.bert import (
            BertConfig,
            init_bert_params,
        )

        bert_cfg = BertConfig.tiny()
        n_docs = 64 * mesh8.dp
        db = rng.standard_normal((n_docs, bert_cfg.hidden)).astype(np.float32)
        doc_tokens = rng.integers(1, 400, (n_docs, 8)).astype(np.int32)
        pipe = DeviceRAGPipeline(
            mesh=mesh8, bert_cfg=bert_cfg, qwen_cfg=CFG, k=4, ctx_docs=2,
            doc_tok_len=8, max_new_tokens=4, index_dtype="int8",
            rescore_k=16, shard_doc_tokens=True,
        )
        pipe.build(
            init_bert_params(jax.random.key(1), bert_cfg),
            QPARAMS,  # int8-quantized decoder
            db, doc_tokens,
        )
        q_toks = rng.integers(1, 400, (4, 8)).astype(np.int32)
        out = pipe.step(q_toks, np.ones_like(q_toks))
        assert out.tokens.shape == (4, 4)
        assert (np.asarray(out.doc_ids) >= 0).all()
