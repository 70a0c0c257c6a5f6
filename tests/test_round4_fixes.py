"""Round-4 fixes: advisor findings + VERDICT #8/#9.

- models/qwen.py one-hot KV insert clamps out-of-bounds positions to the
  last slot (dynamic_update_slice semantics) instead of dropping the write
- utils/hbm derives a safe LLM bucket ladder from the HBM budget, killing
  the hand-set BATCH_SHAPE_BUCKETS footgun for 8B on a 16 GB chip
- serving runtime defaults warmup_buckets ON (library use keeps it off)
- LLM preset names match case-insensitively; base (non-Instruct) llama
  names get end-of-text eos + a plain completion prompt
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_inference_pipeline_tpu.core.config import Settings
from rag_inference_pipeline_tpu.models.qwen import (
    KVCache,
    QwenConfig,
    init_qwen_params,
    qwen_decode_step,
)
from rag_inference_pipeline_tpu.utils import hbm


class TestKVInsertClamp:
    def test_oob_position_writes_last_slot(self):
        """A lane decoding past its cache must overwrite slot S-1 (the old
        dynamic_update_slice clamp), not silently drop the newest k/v."""
        cfg = QwenConfig.tiny()
        params = init_qwen_params(jax.random.key(0), cfg, jnp.float32)
        b, s = 2, 8
        cache = KVCache.zeros(
            cfg.layers, b, s, cfg.kv_heads, cfg.head_dim, dtype=jnp.float32
        )
        # lane 0 in bounds (pos 3), lane 1 out of bounds (pos == S)
        cache = KVCache(k=cache.k, v=cache.v, length=jnp.array([3, s]))
        toks = jnp.array([5, 7], jnp.int32)
        _, new_cache = qwen_decode_step(params, cfg, toks, cache)
        k0 = np.asarray(new_cache.k[0])  # layer 0 [B, S, kvh, hd]
        # lane 0: slot 3 written, slot S-1 untouched (still zero)
        assert np.any(k0[0, 3] != 0)
        assert np.all(k0[0, s - 1] == 0)
        # lane 1: OOB position clamps to the last slot — it must be written
        assert np.any(k0[1, s - 1] != 0)


class TestHBMBudgetLadder:
    def setup_method(self):
        hbm.reset()

    def teardown_method(self):
        hbm.reset()

    def _settings(self, **kw):
        return Settings(
            truncate_length=512, max_tokens=64,
            batch_shape_buckets="1,2,4,8,16,32,64", **kw,
        )

    def test_8b_int8_with_index_clamps(self):
        """8B int8 params (~8 GB) + a 3.5 GB index on 16 GB: the measured
        footgun — 32-lane warmup OOMs, 8 lanes fit (round-3 notes)."""
        cfg = QwenConfig.llama31_8b()
        hbm.reserve("index", int(3.5 * 2**30))
        hbm.reserve("encoders", int(1.3 * 2**30))
        pbytes = hbm.llm_param_bytes(cfg, "int8")
        assert 7.0 * 2**30 < pbytes < 9.5 * 2**30
        ladder = hbm.derive_llm_bucket_ladder(
            cfg, self._settings(), pbytes, (1, 2, 4, 8, 16, 32, 64)
        )
        assert max(ladder) <= 8
        assert ladder[0] == 1

    def test_05b_bf16_keeps_full_ladder(self):
        cfg = QwenConfig.qwen25_05b()
        hbm.reserve("index", int(3.5 * 2**30))
        hbm.reserve("encoders", int(1.5 * 2**30))
        pbytes = hbm.llm_param_bytes(cfg, "none")
        ladder = hbm.derive_llm_bucket_ladder(
            cfg, self._settings(), pbytes, (1, 2, 4, 8, 16, 32, 64)
        )
        assert max(ladder) == 64

    def test_never_empty(self):
        cfg = QwenConfig.llama31_8b()
        hbm.reserve("index", int(14 * 2**30))
        ladder = hbm.derive_llm_bucket_ladder(
            cfg, self._settings(), hbm.llm_param_bytes(cfg, "int8"),
            (4, 8, 16),
        )
        assert ladder == (4,)

    def test_reservation_ledger(self):
        hbm.reserve("a", 100)
        hbm.reserve("b", 50)
        assert hbm.reserved_bytes() == 150
        hbm.reserve("a", 70)  # idempotent per tag: replaces
        assert hbm.reserved_bytes() == 120
        hbm.release("b")
        assert hbm.reserved_bytes() == 70

    def test_llm_component_derives_ladder(self, tmp_path):
        """End-to-end: an LLMComponent.load() on the tiny preset keeps the
        configured ladder (tiny fits everything) and records a reservation."""
        from rag_inference_pipeline_tpu.models.components import LLMComponent

        s = Settings(
            llm_model="tiny-qwen", allow_random_weights=True,
            batch_shape_buckets="1,2,4",
        )
        comp = LLMComponent(s)
        comp.load()
        assert comp.ladder == (1, 2, 4)
        assert hbm.reservations().get("llm_params", 0) > 0
        comp.unload()
        assert "llm_params" not in hbm.reservations()


class TestWarmupDefault:
    def test_field_default_is_none(self):
        assert Settings().warmup_buckets is None

    def test_serving_entry_defaults_on(self):
        from rag_inference_pipeline_tpu.serve.runtime import (
            resolve_serving_settings,
        )

        assert resolve_serving_settings(Settings()).warmup_buckets is True
        s_off = Settings(warmup_buckets=False)
        assert resolve_serving_settings(s_off).warmup_buckets is False
        s_on = Settings(warmup_buckets=True)
        assert resolve_serving_settings(s_on).warmup_buckets is True

    def test_env_opt_out(self):
        from rag_inference_pipeline_tpu.core.config import load_settings

        s = load_settings(env={"WARMUP_BUCKETS": "0"})
        assert s.warmup_buckets is False


class TestLLMPresetNames:
    def test_case_insensitive_qwen(self):
        from rag_inference_pipeline_tpu.models.components import LLMComponent

        s = Settings(llm_model="qwen/qwen2.5-0.5b-instruct")
        comp = LLMComponent(s)
        assert comp.cfg.hidden == 896
        assert comp.is_instruct

    def test_base_llama_plain_prompt_and_eos(self):
        from rag_inference_pipeline_tpu.models.components import LLMComponent

        s = Settings(
            llm_model="meta-llama/Llama-3.2-1B", allow_random_weights=True
        )
        comp = LLMComponent(s)
        assert not comp.is_instruct
        comp.load()
        prompt = comp.build_prompt("q?", [{"content": "doc"}])
        assert "<|start_header_id|>" not in prompt
        assert prompt.endswith("Answer:")
        # hash-fallback tokenizer still records the requested eos token text
        assert comp.tokenizer.eos_token == "<|end_of_text|>"
        comp.unload()

    def test_instruct_llama_keeps_chat_template(self):
        from rag_inference_pipeline_tpu.models.components import LLMComponent

        s = Settings(
            llm_model="meta-llama/Llama-3.2-1B-Instruct",
            allow_random_weights=True,
        )
        comp = LLMComponent(s)
        assert comp.is_instruct
        prompt = comp.build_prompt("q?", [{"content": "doc"}])
        assert "<|start_header_id|>" in prompt

    def test_unknown_model_raises(self):
        from rag_inference_pipeline_tpu.models.components import LLMComponent

        with pytest.raises(ValueError):
            LLMComponent(Settings(llm_model="mistral/mistral-7b"))
