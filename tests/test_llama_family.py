"""Llama-3.x model family: numerical parity + generation paths.

The reference serves exactly one LLM (Qwen2.5-0.5B, llm.py:102); a user
switching frameworks reasonably expects the sibling Llama family to load
too. HF's Qwen2 block *is* the Llama block + qkv bias, so the family
rides the same pure-JAX decoder (models/qwen.py): presets llama32_1b /
llama31_8b differ in dims, no qkv bias, untied head (8B), and the
llama3 rope frequency remap (layers.rope_frequencies `scaling`).

Oracle: transformers.LlamaForCausalLM on the same random weights — the
exact protocol of tests/test_hf_parity.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp  # noqa: E402

from rag_inference_pipeline_tpu.models.layers import KVCache  # noqa: E402
from rag_inference_pipeline_tpu.models.qwen import (  # noqa: E402
    QwenConfig,
    greedy_generate,
    init_qwen_params,
    quantize_qwen_params,
    qwen_forward,
    qwen_prefill,
)
from rag_inference_pipeline_tpu.models.weights import (  # noqa: E402
    qwen_params_from_hf,
)


def torch_state_to_np(model) -> dict:
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _tiny_llama_cfgs(tie: bool, rope_scaling: bool):
    """Matched (HF LlamaConfig, our QwenConfig) tiny pair."""
    scaling = None
    hf_scaling = None
    if rope_scaling:
        # llama3 remap with a tiny original_max so all three wavelength
        # bands (keep / interpolate / divide) are exercised at dh=16
        scaling = (4.0, 1.0, 2.0, 16)
        hf_scaling = {
            "rope_type": "llama3",
            "factor": 4.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 2.0,
            "original_max_position_embeddings": 16,
        }
    cfg_hf = transformers.LlamaConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        tie_word_embeddings=tie,
        attention_dropout=0.0,
        attention_bias=False,
        mlp_bias=False,
        rope_scaling=hf_scaling,
    )
    cfg = QwenConfig(
        vocab_size=512, hidden=64, layers=2, heads=4, kv_heads=2,
        head_dim=16, intermediate=128, rope_theta=10000.0, eps=1e-5,
        qkv_bias=False, tie_embeddings=tie, max_len=256,
        rope_scaling=scaling,
    )
    return cfg_hf, cfg


class TestLlamaParity:
    @pytest.mark.parametrize(
        "tie,rope_scaling",
        [(True, True), (False, True), (True, False)],
        ids=["tied+llama3rope", "untied+llama3rope", "tied+plain"],
    )
    def test_causal_lm_logits_match(self, tie, rope_scaling):
        cfg_hf, cfg = _tiny_llama_cfgs(tie, rope_scaling)
        torch.manual_seed(0)
        hf = transformers.LlamaForCausalLM(cfg_hf).eval()
        params = qwen_params_from_hf(
            torch_state_to_np(hf), cfg, dtype=jnp.float32
        )
        rng = np.random.default_rng(7)
        ids = rng.integers(0, 512, (2, 21)).astype(np.int64)
        mask = np.ones((2, 21), np.int64)
        with torch.no_grad():
            lt = hf(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
            ).logits.numpy()
        lj = np.asarray(
            qwen_forward(
                params, cfg, jnp.asarray(ids, jnp.int32),
                jnp.asarray(mask, jnp.int32),
            )
        )
        np.testing.assert_allclose(lj, lt, atol=3e-3, rtol=1e-3)
        np.testing.assert_array_equal(
            lj[:, -1].argmax(-1), lt[:, -1].argmax(-1)
        )

    def test_rope_scaling_matters(self):
        """Guard that the scaled table actually diverges from the plain
        one (so the parity above isn't trivially passing on a no-op)."""
        from rag_inference_pipeline_tpu.models.layers import rope_frequencies

        cos_p, _ = rope_frequencies(16, 64, 10000.0, None)
        cos_s, _ = rope_frequencies(16, 64, 10000.0, (4.0, 1.0, 2.0, 16))
        assert not np.allclose(np.asarray(cos_p), np.asarray(cos_s))

    def test_greedy_matches_hf_generate(self):
        cfg_hf, cfg = _tiny_llama_cfgs(True, True)
        torch.manual_seed(2)
        hf = transformers.LlamaForCausalLM(cfg_hf).eval()
        params = qwen_params_from_hf(
            torch_state_to_np(hf), cfg, dtype=jnp.float32
        )
        rng = np.random.default_rng(11)
        ids = rng.integers(1, 512, (1, 12)).astype(np.int64)
        n_new = 8
        with torch.no_grad():
            out_t = hf.generate(
                torch.tensor(ids), max_new_tokens=n_new, do_sample=False,
                pad_token_id=0,
            ).numpy()[:, ids.shape[1]:]
        toks = greedy_generate(
            params, cfg,
            jnp.asarray(ids, jnp.int32), jnp.ones((1, 12), jnp.int32),
            max_new_tokens=n_new, cache_len=32,
        )
        np.testing.assert_array_equal(np.asarray(toks), out_t)

    def test_quantized_greedy_token_agreement(self):
        """int8 W8A8 path composes with the llama config (no biases,
        llama3 rope): >=90% greedy-token agreement vs f32 on random
        weights, same bar as tests/test_quant_llm.py."""
        cfg = _tiny_llama_cfgs(True, True)[1]
        params = init_qwen_params(jax.random.key(5), cfg, jnp.float32)
        qparams = quantize_qwen_params(params)
        rng = np.random.default_rng(3)
        ids = jnp.asarray(rng.integers(1, 512, (2, 10)), jnp.int32)
        mask = jnp.ones_like(ids)
        t_f = greedy_generate(
            params, cfg, ids, mask, max_new_tokens=8, cache_len=32
        )
        t_q = greedy_generate(
            qparams, cfg, ids, mask, max_new_tokens=8, cache_len=32
        )
        agree = float(np.mean(np.asarray(t_f) == np.asarray(t_q)))
        assert agree >= 0.9, agree

    def test_presets_shape_sanity(self):
        """Preset dims multiply out to the published parameter counts."""
        def n_params(cfg):
            h, qd = cfg.hidden, cfg.heads * cfg.head_dim
            kvd = cfg.kv_heads * cfg.head_dim
            per_layer = (
                h * qd + 2 * h * kvd + qd * h + 3 * h * cfg.intermediate
                + 2 * h
                + (qd + 2 * kvd if cfg.qkv_bias else 0)
            )
            total = cfg.vocab_size * h + cfg.layers * per_layer + h
            if not cfg.tie_embeddings:
                total += h * cfg.vocab_size
            return total

        assert abs(n_params(QwenConfig.llama32_1b()) / 1.236e9 - 1) < 0.02
        assert abs(n_params(QwenConfig.llama31_8b()) / 8.03e9 - 1) < 0.02
        assert abs(n_params(QwenConfig.qwen25_05b()) / 0.494e9 - 1) < 0.02

    def test_component_name_mapping(self):
        from rag_inference_pipeline_tpu.core.config import Settings
        from rag_inference_pipeline_tpu.models.components import LLMComponent

        s = Settings(
            llm_model="meta-llama/Llama-3.2-1B-Instruct", index_dim=64,
            index_pq_m=8,
        )
        c = LLMComponent(s)
        assert c.cfg.vocab_size == 128256 and not c.cfg.qkv_bias

    def test_prefill_decode_cache_path(self):
        """prefill -> cache is consistent with the one-shot forward on
        the llama tiny config (positions/rope table shared)."""
        cfg = _tiny_llama_cfgs(True, True)[1]
        params = init_qwen_params(jax.random.key(9), cfg, jnp.float32)
        rng = np.random.default_rng(5)
        ids = jnp.asarray(rng.integers(1, 512, (2, 9)), jnp.int32)
        mask = jnp.ones_like(ids)
        full = qwen_forward(params, cfg, ids, mask)
        cache = KVCache.zeros(cfg.layers, 2, 16, cfg.kv_heads, cfg.head_dim,
                              dtype=jnp.float32)
        logits, _ = qwen_prefill(params, cfg, ids, mask, cache)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, -1]), atol=1e-4, rtol=1e-4
        )

    def test_tp_sharded_llama_token_identical(self, mesh8=None):
        """Megatron TP over the llama config (no biases, GQA kv split,
        llama3 rope) is token-identical to the unsharded decode."""
        from rag_inference_pipeline_tpu.core import make_mesh
        from rag_inference_pipeline_tpu.parallel.sharding import (
            qwen_param_sharding,
            shard_params,
        )

        cfg = _tiny_llama_cfgs(True, True)[1]
        params = init_qwen_params(jax.random.key(13), cfg, jnp.float32)
        mesh = make_mesh(dp=4, tp=2)
        sharded = shard_params(
            mesh, params, qwen_param_sharding(mesh, params)
        )
        assert "layers" in sharded and "q_b" not in sharded["layers"][0]
        rng = np.random.default_rng(17)
        ids = jnp.asarray(rng.integers(1, 512, (2, 8)), jnp.int32)
        mask = jnp.ones_like(ids)
        solo = np.asarray(greedy_generate(
            params, cfg, ids, mask, max_new_tokens=6, cache_len=16
        ))
        tp = np.asarray(greedy_generate(
            sharded, cfg, ids, mask, max_new_tokens=6, cache_len=16
        ))
        np.testing.assert_array_equal(tp, solo)

    def test_incremental_int8_init_bitwise_identical(self):
        """init_qwen_params_int8 == quantize(init) leaf-for-leaf, on both
        the biased/tied (qwen tiny) and unbiased/llama tiny configs —
        the 8B single-chip capacity path depends on this equivalence."""
        from rag_inference_pipeline_tpu.models.qwen import (
            init_qwen_params_int8,
        )

        for cfg in (QwenConfig.tiny(), _tiny_llama_cfgs(False, True)[1]):
            key = jax.random.key(21)
            ref = quantize_qwen_params(
                init_qwen_params(key, cfg, jnp.bfloat16)
            )
            inc = init_qwen_params_int8(key, cfg, jnp.bfloat16)
            ref_leaves = jax.tree_util.tree_leaves(ref)
            inc_leaves = jax.tree_util.tree_leaves(inc)
            assert len(ref_leaves) == len(inc_leaves)
            for a, b in zip(ref_leaves, inc_leaves):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_llama_chat_template(self):
        """Llama deployments get the Llama-3 header chat format, not the
        Qwen im_start one (reference prompt semantics: llm.py:264-290)."""
        from rag_inference_pipeline_tpu.core.config import Settings
        from rag_inference_pipeline_tpu.models.components import LLMComponent

        docs = [{"content": "alpha " * 50}, {"content": "beta"}]
        s_l = Settings(
            llm_model="meta-llama/Llama-3.2-1B-Instruct", index_dim=64,
            index_pq_m=8,
        )
        p_l = LLMComponent(s_l).build_prompt("why?", docs)
        assert "<|start_header_id|>" in p_l and "<|im_start|>" not in p_l
        assert p_l.endswith("<|end_header_id|>\n\n")
        s_q = Settings(llm_model="tiny-llm", index_dim=64, index_pq_m=8)
        p_q = LLMComponent(s_q).build_prompt("why?", docs)
        assert "<|im_start|>" in p_q and "<|start_header_id|>" not in p_q

    def test_hf_quantize_on_load_equivalent(self):
        """qwen_params_from_hf(quantize=True) == quantize_qwen_params(
        qwen_params_from_hf(...)) leaf-for-leaf (the capacity-safe real-
        weights load path for 8B)."""
        cfg_hf, cfg = _tiny_llama_cfgs(False, True)
        torch.manual_seed(4)
        hf = transformers.LlamaForCausalLM(cfg_hf).eval()
        raw = torch_state_to_np(hf)
        ref = quantize_qwen_params(
            qwen_params_from_hf(raw, cfg, dtype=jnp.bfloat16)
        )
        inc = qwen_params_from_hf(
            raw, cfg, dtype=jnp.bfloat16, quantize=True
        )
        ra = jax.tree_util.tree_leaves(ref)
        rb = jax.tree_util.tree_leaves(inc)
        assert len(ra) == len(rb)
        for a, b in zip(ra, rb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_tp_sharded_quantized_llama_token_identical(self):
        """The 8B production shape in miniature: leaf-incremental int8
        init + Megatron TP on the llama config — token-identical to the
        unsharded quantized decode."""
        from rag_inference_pipeline_tpu.core import make_mesh
        from rag_inference_pipeline_tpu.models.qwen import (
            init_qwen_params_int8,
        )
        from rag_inference_pipeline_tpu.parallel.sharding import (
            qwen_param_sharding,
            shard_params,
        )

        cfg = _tiny_llama_cfgs(True, True)[1]
        qparams = init_qwen_params_int8(jax.random.key(23), cfg, jnp.float32)
        mesh = make_mesh(dp=4, tp=2)
        sharded = shard_params(
            mesh, qparams, qwen_param_sharding(mesh, qparams)
        )
        rng = np.random.default_rng(29)
        ids = jnp.asarray(rng.integers(1, 512, (2, 8)), jnp.int32)
        mask = jnp.ones_like(ids)
        solo = np.asarray(greedy_generate(
            qparams, cfg, ids, mask, max_new_tokens=6, cache_len=16
        ))
        tp = np.asarray(greedy_generate(
            sharded, cfg, ids, mask, max_new_tokens=6, cache_len=16
        ))
        np.testing.assert_array_equal(tp, solo)
