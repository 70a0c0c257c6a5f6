"""n-gram speculative decoding: the committed tokens must be EXACTLY the
greedy tokens for any prompt/weights (acceptance only affects speed).
Reference decode hot loop: llm.py:343-350 (one token per forward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_inference_pipeline_tpu.models import (
    QwenConfig,
    greedy_generate,
    init_qwen_params,
    ngram_speculative_generate,
    qwen_decode_step,
    qwen_extend,
)
from rag_inference_pipeline_tpu.models.qwen import KVCache, qwen_prefill


@pytest.fixture(scope="module")
def tiny():
    cfg = QwenConfig.tiny()
    params = init_qwen_params(jax.random.key(0), cfg, jnp.float32)
    return cfg, params


def _prompts(rng, cfg, b, t, min_len=8):
    ids = rng.integers(1, cfg.vocab_size, (b, t)).astype(np.int32)
    lens = rng.integers(min_len, t + 1, b)
    mask = (np.arange(t)[None] < lens[:, None]).astype(np.int32)
    return jnp.asarray(ids * mask), jnp.asarray(mask)


class TestQwenExtend:
    def test_matches_sequential_decode_steps(self, tiny, rng):
        cfg, params = tiny
        b, t, g = 2, 12, 4
        ids, mask = _prompts(rng, cfg, b, t)
        cache = KVCache.zeros(
            cfg.layers, b, t + 8, cfg.kv_heads, cfg.head_dim,
            dtype=jnp.float32,
        )
        logits0, cache0 = qwen_prefill(params, cfg, ids, mask, cache)
        toks = rng.integers(1, cfg.vocab_size, (b, g)).astype(np.int32)
        # sequential decode steps
        c = cache0
        seq_logits = []
        for j in range(g):
            lg, c = qwen_decode_step(params, cfg, jnp.asarray(toks[:, j]), c)
            seq_logits.append(lg)
        # one extend call
        ext_logits, c2 = qwen_extend(params, cfg, jnp.asarray(toks), cache0)
        for j in range(g):
            np.testing.assert_allclose(
                np.asarray(ext_logits[:, j]), np.asarray(seq_logits[j]),
                rtol=2e-4, atol=2e-4,
            )
        np.testing.assert_array_equal(
            np.asarray(c2.length), np.asarray(c.length)
        )


class TestSpeculativeIdentity:
    @pytest.mark.parametrize("gamma", [2, 4, 7])
    def test_token_identity_vs_greedy(self, tiny, rng, gamma):
        cfg, params = tiny
        b, t, max_new = 3, 24, 18
        ids, mask = _prompts(rng, cfg, b, t)
        g = greedy_generate(params, cfg, ids, mask, max_new, eos_token_id=5)
        s, mpc = ngram_speculative_generate(
            params, cfg, ids, mask, max_new, gamma=gamma, eos_token_id=5
        )
        np.testing.assert_array_equal(np.asarray(g), np.asarray(s))
        assert float(mpc) >= 1.0  # every call commits at least one token

    def test_eos_truncation_identity(self, tiny, rng):
        """Force eos to be a likely token so early-stop paths are hit."""
        cfg, params = tiny
        b, t, max_new = 4, 16, 12
        ids, mask = _prompts(rng, cfg, b, t)
        # pick eos = the most common greedy token so lanes finish early
        g_probe = np.asarray(
            greedy_generate(params, cfg, ids, mask, max_new, eos_token_id=-1)
        )
        eos = int(np.bincount(g_probe.ravel()).argmax())
        g = greedy_generate(params, cfg, ids, mask, max_new, eos_token_id=eos)
        s, _ = ngram_speculative_generate(
            params, cfg, ids, mask, max_new, gamma=4, eos_token_id=eos
        )
        np.testing.assert_array_equal(np.asarray(g), np.asarray(s))

    def test_single_token(self, tiny, rng):
        cfg, params = tiny
        ids, mask = _prompts(rng, cfg, 2, 10)
        g = greedy_generate(params, cfg, ids, mask, 1, eos_token_id=5)
        s, _ = ngram_speculative_generate(
            params, cfg, ids, mask, 1, gamma=4, eos_token_id=5
        )
        np.testing.assert_array_equal(np.asarray(g), np.asarray(s))

    def test_component_spec_flag_matches_greedy(self, rng, tmp_path):
        from rag_inference_pipeline_tpu.core.config import Settings
        from rag_inference_pipeline_tpu.models.components import LLMComponent

        base = dict(
            llm_model="tiny", allow_random_weights=True, max_tokens=12,
            shape_buckets=(2,), prefill_bucket_list=(32,),
        )
        c_greedy = LLMComponent(Settings(**base))
        c_greedy.load()
        c_spec = LLMComponent(
            Settings(**base, use_speculative_decoding=True, speculative_gamma=4)
        )
        c_spec.load()
        queries = ["what is jax?", "tell me about tpus"]
        docs = [[{"content": "jax is an array library"}],
                [{"content": "tpus multiply matrices"}]]
        out_g = c_greedy.generate_batch(queries, docs)
        out_s = c_spec.generate_batch(queries, docs)
        assert out_g == out_s


class TestSpeculativeEdges:
    def test_gamma_exceeds_max_new(self, tiny, rng):
        """gamma > max_new_tokens: draft windows overhang the budget but
        committed output must still be exactly the greedy tokens."""
        import jax

        from rag_inference_pipeline_tpu.models.qwen import (
            greedy_generate,
            ngram_speculative_generate,
        )

        cfg, params = tiny
        ids = jnp.asarray(rng.integers(1, 400, (2, 6)), jnp.int32)
        mask = jnp.ones_like(ids)
        ref = greedy_generate(
            params, cfg, ids, mask, 4, eos_token_id=-1, cache_len=16
        )
        got, _ = ngram_speculative_generate(
            params, cfg, ids, mask, 4, gamma=9, eos_token_id=-1, cache_len=16
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_repetitive_prompt_commits_multiple_per_call(self, tiny, rng):
        """A highly repetitive prompt should give the n-gram draft high
        acceptance — mean tokens/call must exceed 1 when the model itself
        falls into the prompt's loop, and output stays greedy-identical."""
        from rag_inference_pipeline_tpu.models.qwen import (
            greedy_generate,
            ngram_speculative_generate,
        )

        cfg, params = tiny
        pat = rng.integers(1, 50, 4)
        prompt = np.tile(pat, 6)[:20]
        ids = jnp.asarray(prompt[None, :], jnp.int32)
        mask = jnp.ones_like(ids)
        ref = greedy_generate(
            params, cfg, ids, mask, 8, eos_token_id=-1, cache_len=40
        )
        got, mean_per_call = ngram_speculative_generate(
            params, cfg, ids, mask, 8, gamma=4, eos_token_id=-1, cache_len=40
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        assert float(mean_per_call) >= 1.0  # never slower than greedy

    def test_batch_rows_independent(self, tiny, rng):
        """Speculation commits per-row: a row with high acceptance must not
        perturb a row with none (padding/rollback isolation)."""
        from rag_inference_pipeline_tpu.models.qwen import (
            greedy_generate,
            ngram_speculative_generate,
        )

        cfg, params = tiny
        rep = np.tile(rng.integers(1, 50, 3), 5)[:12]
        rnd = rng.integers(1, 400, 12)
        ids = jnp.asarray(np.stack([rep, rnd]), jnp.int32)
        mask = jnp.ones_like(ids)
        ref = greedy_generate(
            params, cfg, ids, mask, 6, eos_token_id=-1, cache_len=24
        )
        got, _ = ngram_speculative_generate(
            params, cfg, ids, mask, 6, gamma=3, eos_token_id=-1, cache_len=24
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


class TestAcceptanceInjection:
    """inject_accept_p benchmark mode (round-2 VERDICT #1b): the timing
    harness must emit the right NUMBER of tokens and show commits-per-call
    rising with p — the text itself is allowed to diverge (forced accepts
    keep draft-token KV; documented benchmark-only semantics)."""

    def test_injection_commits_scale_with_p(self, tiny, rng):
        cfg, params = tiny
        ids, mask = _prompts(rng, cfg, 2, 16, min_len=16)
        max_new = 24
        kbars = {}
        for p in (0.0, 0.9):
            toks, kbar = ngram_speculative_generate(
                params, cfg, ids, mask, max_new, gamma=4,
                eos_token_id=-1, cache_len=16 + max_new,
                inject_accept_p=p, inject_key=jax.random.key(3),
            )
            assert toks.shape == (2, max_new)
            kbars[p] = float(kbar)
        assert kbars[0.0] == pytest.approx(1.0)  # no accepts: 1 token/call
        assert kbars[0.9] > 2.0  # high accept rate commits multi-token

    def test_injection_p0_token_identical_to_greedy(self, tiny, rng):
        """p=0 never keeps a draft, so no cache pollution is possible and
        the output must equal greedy exactly."""
        cfg, params = tiny
        ids, mask = _prompts(rng, cfg, 2, 16, min_len=16)
        max_new = 16
        g = np.asarray(greedy_generate(
            params, cfg, ids, mask, max_new, eos_token_id=-1,
            cache_len=16 + max_new,
        ))
        s, _ = ngram_speculative_generate(
            params, cfg, ids, mask, max_new, gamma=4, eos_token_id=-1,
            cache_len=16 + max_new, inject_accept_p=0.0,
            inject_key=jax.random.key(3),
        )
        np.testing.assert_array_equal(np.asarray(s), g)
