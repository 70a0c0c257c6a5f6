"""Round-2 kernels: batch-deduped cluster-major IVF scan, PQ4 one-hot MXU
ADC, and the global-scale int8 flat scan. All Pallas paths run in interpret
mode on the CPU backend (conftest pins CPU + 8 fake devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_inference_pipeline_tpu.ops import (
    build_ivf,
    build_ivfpq,
    exact_topk,
    fused_topk_int8gs,
    ivf_search,
    ivfpq4_search_dedup,
    ivfpq_search,
    quantize_global_int8,
)
from rag_inference_pipeline_tpu.ops.ivf import dedup_probes, ivf_search_dedup


def _clustered(rng, n, d, nlist):
    centers = rng.standard_normal((nlist, d), dtype=np.float32) * 2
    x = centers[rng.integers(0, nlist, n)] + rng.standard_normal(
        (n, d), dtype=np.float32
    )
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def _recall(ids, oracle, k):
    return np.mean(
        [len(set(ids[i][:k]) & set(oracle[i][:k])) / k for i in range(len(ids))]
    )


class TestDedupProbes:
    def test_union_and_membership(self, rng):
        probe = jnp.asarray([[3, 1, 7], [1, 5, 3]], jnp.int32)
        slots, member = dedup_probes(probe, nlist=10, n_slots=6)
        slots = np.asarray(slots)
        member = np.asarray(member)
        # probed clusters first, ascending (top_k stability)
        assert list(slots[:4]) == [1, 3, 5, 7]
        for b, row in enumerate(np.asarray(probe)):
            for s, c in enumerate(slots):
                assert member[b, s] == (c in row)

    def test_more_probes_than_slots_keeps_all_probed(self, rng):
        probe = jnp.asarray([[0, 2, 4, 6]], jnp.int32)
        slots, member = dedup_probes(probe, nlist=8, n_slots=4)
        assert sorted(np.asarray(slots).tolist()) == [0, 2, 4, 6]
        assert np.asarray(member).all()


class TestIVFDedup:
    def test_matches_gather_path_exactly(self, rng):
        n, d, b, k, nlist, nprobe = 12000, 64, 5, 10, 48, 12
        x = _clustered(rng, n, d, nlist)
        listing = build_ivf(
            jax.random.key(0), x, nlist, train_size=4000, iters=5
        )
        q = x[rng.integers(0, n, b)] + 0.01 * rng.standard_normal(
            (b, d), dtype=np.float32
        )
        qj = jnp.asarray(q)
        s_ref, i_ref = ivf_search(listing, qj, k, nprobe=nprobe)
        s_new, i_new = ivf_search_dedup(
            listing, qj, k, nprobe=nprobe, interpret=True
        )
        i_ref, i_new = np.asarray(i_ref), np.asarray(i_new)
        assert _recall(i_new, i_ref, k) == 1.0
        np.testing.assert_allclose(
            np.asarray(s_new), np.asarray(s_ref), rtol=2e-2, atol=1e-3
        )

    def test_batch_one(self, rng):
        n, d, nlist = 6000, 64, 32
        x = _clustered(rng, n, d, nlist)
        listing = build_ivf(
            jax.random.key(0), x, nlist, train_size=3000, iters=5
        )
        q = jnp.asarray(x[:1])
        s_ref, i_ref = ivf_search(listing, q, 5, nprobe=8)
        s_new, i_new = ivf_search_dedup(listing, q, 5, nprobe=8, interpret=True)
        np.testing.assert_array_equal(np.asarray(i_new), np.asarray(i_ref))

    def test_max_slots_clamps(self, rng):
        n, d, nlist = 6000, 64, 32
        x = _clustered(rng, n, d, nlist)
        listing = build_ivf(
            jax.random.key(0), x, nlist, train_size=3000, iters=5
        )
        q = jnp.asarray(x[:4])
        # max_slots >= union size -> still exact vs gather path
        s, i = ivf_search_dedup(
            listing, q, 5, nprobe=4, max_slots=16, interpret=True
        )
        s_ref, i_ref = ivf_search(listing, q, 5, nprobe=4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


class TestIVFPQ4Dedup:
    def test_matches_gather_adc_path(self, rng):
        n, d, b, k, nlist, nprobe, m = 12000, 64, 4, 10, 48, 12, 16
        x = _clustered(rng, n, d, nlist)
        listing = build_ivfpq(
            jax.random.key(0), x, nlist, m,
            train_size=4000, kmeans_iters=5, pq_iters=5, ksub=16,
        )
        # PQ4 buckets are lane-padded
        assert listing.code_buckets.shape[2] % 128 == 0
        q = x[rng.integers(0, n, b)] + 0.01 * rng.standard_normal(
            (b, d), dtype=np.float32
        )
        qj = jnp.asarray(q)
        s_ref, i_ref = ivfpq_search(listing, qj, k, nprobe=nprobe)
        s_new, i_new = ivfpq4_search_dedup(
            listing, qj, k, nprobe=nprobe, interpret=True
        )
        i_ref, i_new = np.asarray(i_ref), np.asarray(i_new)
        assert _recall(i_new, i_ref, k) >= 0.95  # bf16 LUT vs f32 LUT ties
        np.testing.assert_allclose(
            np.asarray(s_new), np.asarray(s_ref), rtol=3e-2, atol=3e-2
        )

    def test_rejects_pq8_listing(self, rng):
        n, d, nlist, m = 4000, 32, 16, 8
        x = _clustered(rng, n, d, nlist)
        listing = build_ivfpq(
            jax.random.key(0), x, nlist, m,
            train_size=2000, kmeans_iters=4, pq_iters=4, ksub=256,
        )
        with pytest.raises(ValueError, match="ksub=16"):
            ivfpq4_search_dedup(
                listing, jnp.asarray(x[:2]), 5, nprobe=4, interpret=True
            )


class TestInt8GlobalScale:
    def test_recall_with_rescore(self, rng):
        n, d, b, k = 8000, 64, 6, 10
        x = _clustered(rng, n, d, 32)
        db_i8, scale = quantize_global_int8(jnp.asarray(x))
        dbj = jnp.asarray(x, jnp.bfloat16)
        q = x[rng.integers(0, n, b)] + 0.02 * rng.standard_normal(
            (b, d), dtype=np.float32
        )
        qj = jnp.asarray(q)
        es, ei = exact_topk(qj.astype(jnp.bfloat16), dbj, k)
        fs, fi = fused_topk_int8gs(
            qj, db_i8, scale, k, nbins=256, chunk=512, interpret=True,
            rescore_db=dbj, rescore_k=4 * k,
        )
        assert _recall(np.asarray(fi), np.asarray(ei), k) >= 0.9

    def test_scores_sorted_and_ids_valid(self, rng):
        n, d, b, k = 3000, 32, 3, 8
        x = rng.standard_normal((n, d), dtype=np.float32)
        db_i8, scale = quantize_global_int8(jnp.asarray(x))
        s, i = fused_topk_int8gs(
            jnp.asarray(x[:b]), db_i8, scale, k,
            nbins=128, chunk=256, interpret=True,
        )
        s, i = np.asarray(s), np.asarray(i)
        assert (np.diff(s, axis=1) <= 1e-5).all()
        assert i.min() >= 0 and i.max() < n
        # self-match: query rows are db rows
        assert all(i[r, 0] == r for r in range(b))

    def test_global_scale_clip_percentile(self, rng):
        x = rng.standard_normal((1000, 32), dtype=np.float32)
        x[0] *= 100.0  # outlier row must not crush everyone's resolution
        q, scale = quantize_global_int8(jnp.asarray(x))
        assert float(scale) < 1.0  # ~maxabs/127 of the non-outlier mass
        assert q.dtype == jnp.int8


class TestADC4CapChunking:
    """Deep buckets stream in row-chunks over a second grid dim (the cap
    9472 Mosaic VMEM ceiling found at 30M) — results must be identical."""

    def test_cap_block_equivalence(self, rng):
        centers = rng.standard_normal((16, 64)).astype(np.float32)
        x = centers[rng.integers(0, 16, 3000)] + 0.1 * rng.standard_normal(
            (3000, 64)
        ).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        listing = build_ivfpq(
            jax.random.key(0), x, nlist=16, m=16, train_size=3000, ksub=16
        )
        q = jnp.asarray(x[:8])
        s1, i1 = ivfpq4_search_dedup(listing, q, 32, nprobe=8, interpret=True)
        s2, i2 = ivfpq4_search_dedup(
            listing, q, 32, nprobe=8, interpret=True, cap_block=128
        )
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(s2), atol=1e-4
        )

    def test_cap_chunk_chooser(self):
        from rag_inference_pipeline_tpu.ops.pq import _adc4_cap_chunk

        assert _adc4_cap_chunk(512, 8) == 512  # fits: untouched
        assert _adc4_cap_chunk(6144, 32) == 6144
        c = _adc4_cap_chunk(9472, 8)
        assert 9472 % c == 0 and c <= 6144 and c % 128 == 0
        c = _adc4_cap_chunk(9472, 128)  # large batch: tighter budget
        assert 9472 % c == 0 and c <= 3072

    def test_bad_cap_block_rejected(self, rng):
        x = rng.standard_normal((512, 64)).astype(np.float32)
        listing = build_ivfpq(
            jax.random.key(0), x, nlist=4, m=16, train_size=512, ksub=16
        )
        with pytest.raises(ValueError, match="must divide cap"):
            ivfpq4_search_dedup(
                listing, jnp.asarray(x[:2]), 8, nprobe=4,
                interpret=True, cap_block=100,
            )
