"""Numerical parity vs HuggingFace torch implementations.

Tiny random-weight torch models are built from config (no downloads), saved
as safetensors, loaded through our weight mappers, and outputs compared —
validating the exact load path used for the real BGE / Qwen2.5 checkpoints
(reference loads these very architectures via HF torch: embedding.py:80,
reranker.py:87, llm.py:102).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from rag_inference_pipeline_tpu.models.bert import (
    BertConfig,
    bert_classify,
    bert_encode,
)
from rag_inference_pipeline_tpu.models.qwen import QwenConfig, qwen_forward
from rag_inference_pipeline_tpu.models.weights import (
    bert_params_from_hf,
    qwen_params_from_hf,
)


def torch_state_to_np(model) -> dict:
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TestBertParity:
    @pytest.fixture(scope="class")
    def models(self):
        cfg_hf = transformers.BertConfig(
            vocab_size=512,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            max_position_embeddings=96,
            type_vocab_size=2,
            hidden_act="gelu",
            attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0,
        )
        torch.manual_seed(0)
        hf = transformers.BertModel(cfg_hf).eval()
        cfg = BertConfig(
            vocab_size=512, hidden=64, layers=2, heads=4,
            intermediate=128, max_positions=96,
        )
        params = bert_params_from_hf(torch_state_to_np(hf), cfg)
        return hf, cfg, params

    def test_hidden_states_match(self, models):
        hf, cfg, params = models
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 512, (2, 12)).astype(np.int64)
        mask = np.ones((2, 12), np.int64)
        mask[1, 8:] = 0
        with torch.no_grad():
            out_t = hf(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
            ).last_hidden_state.numpy()
        out_j = np.asarray(
            bert_encode(
                params, cfg, jnp.asarray(ids, jnp.int32),
                jnp.asarray(mask, jnp.int32),
            )
        )
        # compare only non-padded positions
        np.testing.assert_allclose(out_j[0], out_t[0], atol=2e-4)
        np.testing.assert_allclose(out_j[1, :8], out_t[1, :8], atol=2e-4)

    def test_classifier_head_match(self, models):
        _, _, _ = models
        cfg_hf = transformers.BertConfig(
            vocab_size=512, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=96, num_labels=5,
            attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        )
        torch.manual_seed(1)
        hf = transformers.BertForSequenceClassification(cfg_hf).eval()
        cfg = BertConfig(
            vocab_size=512, hidden=64, layers=2, heads=4,
            intermediate=128, max_positions=96, num_labels=5,
        )
        params = bert_params_from_hf(torch_state_to_np(hf), cfg)
        rng = np.random.default_rng(2)
        ids = rng.integers(0, 512, (3, 10)).astype(np.int64)
        mask = np.ones_like(ids)
        with torch.no_grad():
            logits_t = hf(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).logits.numpy()
        logits_j = np.asarray(
            bert_classify(
                params, cfg, jnp.asarray(ids, jnp.int32),
                jnp.asarray(mask, jnp.int32),
            )
        )
        np.testing.assert_allclose(logits_j, logits_t, atol=3e-4)


class TestQwenParity:
    def test_causal_lm_logits_match(self):
        cfg_hf = transformers.Qwen2Config(
            vocab_size=512,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            intermediate_size=128,
            max_position_embeddings=256,
            rope_theta=10000.0,
            rms_norm_eps=1e-6,
            tie_word_embeddings=True,
            attention_dropout=0.0,
        )
        torch.manual_seed(0)
        hf = transformers.Qwen2ForCausalLM(cfg_hf).eval()
        cfg = QwenConfig(
            vocab_size=512, hidden=64, layers=2, heads=4, kv_heads=2,
            head_dim=16, intermediate=128, rope_theta=10000.0,
            tie_embeddings=True, max_len=256,
        )
        params = qwen_params_from_hf(torch_state_to_np(hf), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(3)
        ids = rng.integers(0, 512, (2, 9)).astype(np.int64)
        mask = np.ones((2, 9), np.int64)
        with torch.no_grad():
            logits_t = hf(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).logits.numpy()
        logits_j = np.asarray(
            qwen_forward(
                params, cfg, jnp.asarray(ids, jnp.int32),
                jnp.asarray(mask, jnp.int32),
            )
        )
        np.testing.assert_allclose(logits_j, logits_t, atol=3e-3, rtol=1e-3)
        # greedy next-token agreement is what generation actually needs
        np.testing.assert_array_equal(
            logits_j[:, -1].argmax(-1), logits_t[:, -1].argmax(-1)
        )

    def test_safetensors_file_roundtrip(self, tmp_path):
        """Full path: torch model -> safetensors file -> our loader."""
        from safetensors.torch import save_file

        from rag_inference_pipeline_tpu.models.weights import (
            load_safetensors_dict,
            resolve_model_dir,
        )

        cfg_hf = transformers.Qwen2Config(
            vocab_size=256, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=2, num_key_value_heads=1,
            intermediate_size=64, tie_word_embeddings=True,
        )
        torch.manual_seed(1)
        hf = transformers.Qwen2ForCausalLM(cfg_hf).eval()
        mdir = tmp_path / "weights" / "tiny__qwen"
        mdir.mkdir(parents=True)
        # clone: tied embeddings share storage, which safetensors rejects
        state = {k: v.clone().contiguous() for k, v in hf.state_dict().items()}
        save_file(state, str(mdir / "model.safetensors"))

        found = resolve_model_dir(str(tmp_path / "weights"), "tiny/qwen")
        assert found == str(mdir)
        raw = load_safetensors_dict(found)
        cfg = QwenConfig(
            vocab_size=256, hidden=32, layers=1, heads=2, kv_heads=1,
            head_dim=16, intermediate=64, tie_embeddings=True,
        )
        params = qwen_params_from_hf(raw, cfg, dtype=jnp.float32)
        ids = np.arange(6)[None].astype(np.int64)
        with torch.no_grad():
            lt = hf(input_ids=torch.tensor(ids)).logits.numpy()
        lj = np.asarray(
            qwen_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                         jnp.ones((1, 6), jnp.int32))
        )
        np.testing.assert_allclose(lj, lt, atol=3e-3, rtol=1e-3)


class TestRobertaParity:
    def test_xlmroberta_classifier_match(self):
        """bge-reranker-base is XLM-RoBERTa: offset positions + roberta
        classification head (reference reranker.py:87)."""
        cfg_hf = transformers.XLMRobertaConfig(
            vocab_size=512, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=98, type_vocab_size=1,
            pad_token_id=1, num_labels=1, layer_norm_eps=1e-5,
            attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
            classifier_dropout=0.0,
        )
        torch.manual_seed(4)
        hf = transformers.XLMRobertaForSequenceClassification(cfg_hf).eval()
        cfg = BertConfig(
            vocab_size=512, hidden=64, layers=2, heads=4, intermediate=128,
            max_positions=98, type_vocab=1, eps=1e-5,
            roberta_positions=True, pad_token_id=1, num_labels=1,
        )
        params = bert_params_from_hf(torch_state_to_np(hf), cfg)
        rng = np.random.default_rng(5)
        ids = rng.integers(2, 512, (2, 11)).astype(np.int64)
        mask = np.ones((2, 11), np.int64)
        ids[1, 7:] = 1  # pad token
        mask[1, 7:] = 0
        with torch.no_grad():
            lt = hf(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).logits.numpy()
        lj = np.asarray(
            bert_classify(
                params, cfg, jnp.asarray(ids, jnp.int32),
                jnp.asarray(mask, jnp.int32), use_pooler=True,
            )
        )
        np.testing.assert_allclose(lj, lt, atol=3e-4)
