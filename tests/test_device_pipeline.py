"""Fused device-resident RAG step on the virtual 8-device mesh, and the
driver entry points."""

import jax
import numpy as np
import pytest

from rag_inference_pipeline_tpu.core import make_mesh
from rag_inference_pipeline_tpu.engine.device_pipeline import DeviceRAGPipeline
from rag_inference_pipeline_tpu.models.bert import BertConfig, init_bert_params
from rag_inference_pipeline_tpu.models.qwen import QwenConfig, init_qwen_params
from rag_inference_pipeline_tpu.parallel.sharding import (
    qwen_param_sharding,
    shard_params,
)


class TestDevicePipeline:
    def test_fused_step_on_mesh(self, rng):
        ctx = make_mesh(dp=4, tp=2)
        bert_cfg, qwen_cfg = BertConfig.tiny(), QwenConfig.tiny()
        n, d = 256, bert_cfg.hidden
        db = rng.standard_normal((n, d)).astype(np.float32)
        doc_tokens = rng.integers(1, 400, (n, 8)).astype(np.int32)
        pipe = DeviceRAGPipeline(
            mesh=ctx, bert_cfg=bert_cfg, qwen_cfg=qwen_cfg,
            k=5, ctx_docs=2, doc_tok_len=8, max_new_tokens=3,
        )
        pipe.build(
            init_bert_params(jax.random.key(1), bert_cfg),
            init_qwen_params(jax.random.key(2), qwen_cfg),
            db, doc_tokens,
        )
        q = rng.integers(1, 400, (8, 8)).astype(np.int32)
        out = pipe.step(q, np.ones_like(q))
        assert out.tokens.shape == (8, 3)
        assert out.doc_ids.shape == (8, 5)
        # retrieval must match the host oracle: embed with the same params
        from rag_inference_pipeline_tpu.models.bert import bert_embed

        emb = np.asarray(
            bert_embed(
                pipe.bert_params, bert_cfg, q, np.ones_like(q)
            )
        )
        oracle = np.argsort(-(emb @ db.T), axis=1)[:, :5]
        np.testing.assert_array_equal(np.asarray(out.doc_ids), oracle)

    def test_tp_sharding_matches_replicated(self, rng):
        """TP-sharded qwen forward must equal single-device numerics."""
        import jax.numpy as jnp

        from rag_inference_pipeline_tpu.models.qwen import (
            init_qwen_params,
            qwen_forward,
        )

        cfg = QwenConfig.tiny()
        params = init_qwen_params(jax.random.key(0), cfg)
        ids = jnp.asarray(rng.integers(1, 400, (4, 8)), jnp.int32)
        mask = jnp.ones_like(ids)
        ref = np.asarray(qwen_forward(params, cfg, ids, mask))

        ctx = make_mesh(dp=1, tp=2)
        sharded = shard_params(ctx, params, qwen_param_sharding(ctx, params))
        out = np.asarray(qwen_forward(sharded, cfg, ids, mask))
        np.testing.assert_allclose(ref, out, atol=2e-4)


class TestFusedInt8AndShardedTokens:
    def _build(self, rng, ctx, **pipe_kw):
        bert_cfg, qwen_cfg = BertConfig.tiny(), QwenConfig.tiny()
        n, d = 256, bert_cfg.hidden
        db = rng.standard_normal((n, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        doc_tokens = rng.integers(1, 400, (n, 8)).astype(np.int32)
        pipe = DeviceRAGPipeline(
            mesh=ctx, bert_cfg=bert_cfg, qwen_cfg=qwen_cfg,
            k=5, ctx_docs=2, doc_tok_len=8, max_new_tokens=3, **pipe_kw,
        )
        pipe.build(
            init_bert_params(jax.random.key(1), bert_cfg),
            init_qwen_params(jax.random.key(2), qwen_cfg),
            db, doc_tokens,
        )
        return pipe, db, doc_tokens

    def test_int8_scan_matches_bf16_retrieval(self, rng):
        """int8+rescore fused step retrieves the same ids and generates the
        same tokens as the bf16 scan (rescore recovers quantization)."""
        ctx = make_mesh(dp=4, tp=2)
        pipe16, db, _ = self._build(rng, ctx)
        rng2 = np.random.default_rng(0)
        pipe8, _, _ = self._build(
            rng2, ctx, index_dtype="int8", rescore_k=32
        )
        q = rng.integers(1, 400, (8, 8)).astype(np.int32)
        out16 = pipe16.step(q, np.ones_like(q))
        out8 = pipe8.step(q, np.ones_like(q))
        ids16 = np.asarray(out16.doc_ids)
        ids8 = np.asarray(out8.doc_ids)
        overlap = np.mean(
            [len(set(ids16[i]) & set(ids8[i])) / 5 for i in range(8)]
        )
        assert overlap >= 0.95, overlap
        # decode consumes the same top ctx_docs -> identical tokens when the
        # top-2 ids agree
        agree = (ids16[:, :2] == ids8[:, :2]).all(axis=1)
        np.testing.assert_array_equal(
            np.asarray(out16.tokens)[agree], np.asarray(out8.tokens)[agree]
        )

    def test_sharded_token_store_matches_replicated(self, rng):
        ctx = make_mesh(dp=4, tp=2)
        pipe_rep, db, toks = self._build(rng, ctx, shard_doc_tokens=False)
        rng2 = np.random.default_rng(0)
        pipe_sh, _, _ = self._build(rng2, ctx, shard_doc_tokens=True)
        assert pipe_sh._tokens_sharded and not pipe_rep._tokens_sharded
        q = rng.integers(1, 400, (8, 8)).astype(np.int32)
        out_r = pipe_rep.step(q, np.ones_like(q))
        out_s = pipe_sh.step(q, np.ones_like(q))
        np.testing.assert_array_equal(
            np.asarray(out_r.doc_ids), np.asarray(out_s.doc_ids)
        )
        np.testing.assert_array_equal(
            np.asarray(out_r.tokens), np.asarray(out_s.tokens)
        )

    def test_sharded_token_gather_unit(self, rng):
        from rag_inference_pipeline_tpu.engine.device_pipeline import (
            sharded_token_gather,
        )
        import jax.numpy as jnp

        ctx = make_mesh(dp=8, tp=1)
        n, L = 64, 4
        toks = rng.integers(1, 100, (n, L)).astype(np.int32)
        mask = rng.integers(0, 2, (n, L)).astype(np.int32)
        ids = np.array([[0, 17, 63], [8, -1, 31]], np.int32)
        tok_d = ctx.put(jnp.asarray(toks), ctx.rows_dp)
        msk_d = ctx.put(jnp.asarray(mask), ctx.rows_dp)
        g, m = sharded_token_gather(ctx, tok_d, msk_d, jnp.asarray(ids))
        g, m = np.asarray(g), np.asarray(m)
        for b in range(2):
            for c in range(3):
                if ids[b, c] < 0:
                    assert (m[b, c] == 0).all()
                else:
                    np.testing.assert_array_equal(g[b, c], toks[ids[b, c]])
                    np.testing.assert_array_equal(m[b, c], mask[ids[b, c]])


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn).lower(*args).compile()
        assert out is not None

    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestSequenceParallel:
    def test_sp_encoder_matches_unsharded(self, rng, mesh_dp8):
        """Token-sharded encoder must be numerically exact vs the plain one
        (SP is an extension, not an approximation)."""
        import jax.numpy as jnp

        from rag_inference_pipeline_tpu.models.bert import (
            BertConfig,
            bert_encode,
            init_bert_params,
        )
        from rag_inference_pipeline_tpu.parallel import bert_encode_sp

        cfg = BertConfig.tiny()
        params = init_bert_params(jax.random.key(0), cfg)
        ids = jnp.asarray(rng.integers(1, 1000, (2, 64)), jnp.int32)
        mask = jnp.ones_like(ids)
        mask = mask.at[1, 40:].set(0)
        ref = np.asarray(bert_encode(params, cfg, ids, mask))
        out = np.asarray(
            bert_encode_sp(params, cfg, mesh_dp8, ids, mask, sp_axis="dp")
        )
        np.testing.assert_allclose(out[0], ref[0], atol=2e-4)
        np.testing.assert_allclose(out[1, :40], ref[1, :40], atol=2e-4)

    def test_sp_rejects_indivisible_seq(self, rng, mesh_dp8):
        import jax.numpy as jnp

        from rag_inference_pipeline_tpu.models.bert import (
            BertConfig,
            init_bert_params,
        )
        from rag_inference_pipeline_tpu.parallel import bert_encode_sp

        cfg = BertConfig.tiny()
        params = init_bert_params(jax.random.key(0), cfg)
        ids = jnp.ones((1, 30), jnp.int32)
        with pytest.raises(ValueError, match="divisible"):
            bert_encode_sp(params, cfg, mesh_dp8, ids, ids)


class TestFusedStepDecodeEquivalence:
    def test_fused_tokens_match_host_greedy(self, rng):
        """The fused step's on-device context build + compaction must produce
        exactly the tokens host-side greedy decoding yields for the same
        retrieved docs + prompt."""
        import jax.numpy as jnp

        from rag_inference_pipeline_tpu.core import make_mesh
        from rag_inference_pipeline_tpu.models.bert import (
            BertConfig,
            bert_embed,
            init_bert_params,
        )
        from rag_inference_pipeline_tpu.models.qwen import (
            QwenConfig,
            greedy_generate,
            init_qwen_params,
        )

        ctx = make_mesh(dp=1, tp=1)
        bert_cfg, qwen_cfg = BertConfig.tiny(), QwenConfig.tiny()
        bert_params = init_bert_params(jax.random.key(1), bert_cfg)
        qwen_params = init_qwen_params(jax.random.key(2), qwen_cfg)
        n, d = 64, bert_cfg.hidden
        db = rng.standard_normal((n, d)).astype(np.float32)
        doc_tokens = rng.integers(1, 400, (n, 6)).astype(np.int32)
        doc_tokens[:, 4:] = 0  # per-doc padding to exercise compaction

        pipe = DeviceRAGPipeline(
            mesh=ctx, bert_cfg=bert_cfg, qwen_cfg=qwen_cfg,
            k=4, ctx_docs=2, doc_tok_len=6, max_new_tokens=5,
        )
        pipe.build(bert_params, qwen_params, db, doc_tokens)
        q_emb = rng.integers(1, 400, (2, 8)).astype(np.int32)
        q_lm = rng.integers(1, 400, (2, 8)).astype(np.int32)
        mask = np.ones_like(q_emb)
        out = pipe.step(q_emb, mask, q_lm, mask)

        # host-side reference: same retrieval -> compacted prompt -> greedy
        emb = np.asarray(bert_embed(pipe.bert_params, bert_cfg, q_emb, mask))
        top = np.argsort(-(emb @ db.T), axis=1)[:, :2]
        for b in range(2):
            ctx_toks = doc_tokens[top[b]].reshape(-1)
            valid = ctx_toks[ctx_toks > 0]
            prompt = np.concatenate([valid, q_lm[b]])[None, :]
            pm = np.ones_like(prompt)
            ref = np.asarray(
                greedy_generate(
                    pipe.qwen_params, qwen_cfg, jnp.asarray(prompt),
                    jnp.asarray(pm), 5, eos_token_id=-1,
                    cache_len=prompt.shape[1] + 5,
                )
            )[0]
            np.testing.assert_array_equal(np.asarray(out.tokens)[b], ref)


class TestFusedSpeculative:
    def test_spec_fused_step_token_identical(self, rng):
        """speculative=True inside the fused step (one in-program
        while_loop — the whole RAG step stays ONE dispatch) must emit
        exactly the greedy fused step's tokens."""
        ctx = make_mesh(dp=4, tp=2)
        bert_cfg, qwen_cfg = BertConfig.tiny(), QwenConfig.tiny()
        n, d = 256, bert_cfg.hidden
        db = rng.standard_normal((n, d)).astype(np.float32)
        doc_tokens = rng.integers(1, 400, (n, 8)).astype(np.int32)
        kwargs = dict(
            mesh=ctx, bert_cfg=bert_cfg, qwen_cfg=qwen_cfg,
            k=5, ctx_docs=2, doc_tok_len=8, max_new_tokens=6,
        )
        bp = init_bert_params(jax.random.key(1), bert_cfg)
        qp = init_qwen_params(jax.random.key(2), qwen_cfg)
        greedy = DeviceRAGPipeline(**kwargs)
        greedy.build(bp, qp, db, doc_tokens)
        spec = DeviceRAGPipeline(speculative=True, spec_gamma=4, **kwargs)
        spec.build(bp, qp, db, doc_tokens)
        q = rng.integers(1, 400, (8, 8)).astype(np.int32)
        out_g = greedy.step(q, np.ones_like(q))
        out_s = spec.step(q, np.ones_like(q))
        np.testing.assert_array_equal(
            np.asarray(out_g.doc_ids), np.asarray(out_s.doc_ids)
        )
        np.testing.assert_array_equal(
            np.asarray(out_g.tokens), np.asarray(out_s.tokens)
        )


class TestDeviceArrayReuse:
    """Round-4: the fused pipeline reuses a loaded int8 FlatIndex's device
    arrays (db_i8/gscale/bf16 rescore) instead of re-uploading the corpus
    as f32 — must be token- and id-identical to the host build path."""

    def test_device_fast_path_matches_host_build(self, rng):
        from rag_inference_pipeline_tpu.index.flat import FlatIndex

        ctx = make_mesh(dp=4, tp=2)
        bert_cfg, qwen_cfg = BertConfig.tiny(), QwenConfig.tiny()
        n, d = 256, bert_cfg.hidden
        db = rng.standard_normal((n, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        doc_tokens = rng.integers(1, 400, (n, 8)).astype(np.int32)
        bp = init_bert_params(jax.random.key(1), bert_cfg)
        qp = init_qwen_params(jax.random.key(2), qwen_cfg)

        def mk():
            return DeviceRAGPipeline(
                mesh=ctx, bert_cfg=bert_cfg, qwen_cfg=qwen_cfg,
                k=5, ctx_docs=2, doc_tok_len=8, max_new_tokens=3,
                index_dtype="int8", rescore_k=32,
            )

        host_pipe = mk()
        host_pipe.build(bp, qp, db, doc_tokens)

        idx = FlatIndex(d, dtype="int8", mesh=ctx, rescore_k=32)
        idx.add(db)
        dev_pipe = mk()
        dev_pipe.build(
            bp, qp, None, doc_tokens,
            db_i8=idx._db_i8, db_scale=idx._db_gscale, db_rescore=idx._db,
            ntotal=idx.ntotal,
        )
        # the index store is chunk-pad-aligned — more rows than the corpus
        assert dev_pipe.db_i8.shape[0] >= n
        q = rng.integers(1, 400, (8, 8)).astype(np.int32)
        out_h = host_pipe.step(q, np.ones_like(q))
        out_d = dev_pipe.step(q, np.ones_like(q))
        np.testing.assert_array_equal(
            np.asarray(out_h.doc_ids), np.asarray(out_d.doc_ids)
        )
        np.testing.assert_array_equal(
            np.asarray(out_h.tokens), np.asarray(out_d.tokens)
        )
