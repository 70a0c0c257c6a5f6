"""Kernel tests vs a numpy brute-force oracle.

The oracle role FAISS played in the reference's harness (SURVEY.md section 4
item 3 — FAISS mocked in unit tests, real recall measured in the bench
harness) is played here by numpy exact search; Pallas kernels run in
interpreter mode on CPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rag_inference_pipeline_tpu.ops import (
    binmax_partial_topk,
    exact_topk,
    fused_topk,
    sharded_topk,
)


def np_topk(q, db, k, metric="ip"):
    if metric == "ip":
        s = q.astype(np.float32) @ db.astype(np.float32).T
    else:
        s = 2.0 * q.astype(np.float32) @ db.astype(np.float32).T - np.sum(
            db.astype(np.float32) ** 2, axis=1
        )
    idx = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


@pytest.fixture()
def data(rng):
    db = rng.standard_normal((4096, 64)).astype(np.float32)
    q = rng.standard_normal((5, 64)).astype(np.float32)
    return q, db


class TestExactTopk:
    def test_matches_oracle_ip(self, data):
        q, db = data
        s, i = exact_topk(jnp.asarray(q), jnp.asarray(db), 10, chunk=1024)
        os_, oi = np_topk(q, db, 10)
        np.testing.assert_array_equal(np.asarray(i), oi)
        np.testing.assert_allclose(np.asarray(s), os_, rtol=1e-4)

    def test_matches_oracle_l2(self, data):
        q, db = data
        s, i = exact_topk(jnp.asarray(q), jnp.asarray(db), 10, chunk=1000, metric="l2")
        _, oi = np_topk(q, db, 10, metric="l2")
        np.testing.assert_array_equal(np.asarray(i), oi)

    def test_unaligned_n(self, rng):
        db = rng.standard_normal((1003, 32)).astype(np.float32)
        q = rng.standard_normal((3, 32)).astype(np.float32)
        s, i = exact_topk(jnp.asarray(q), jnp.asarray(db), 7, chunk=256)
        _, oi = np_topk(q, db, 7)
        np.testing.assert_array_equal(np.asarray(i), oi)

    def test_k_clamped_to_n(self, rng):
        db = rng.standard_normal((5, 16)).astype(np.float32)
        q = rng.standard_normal((2, 16)).astype(np.float32)
        s, i = exact_topk(jnp.asarray(q), jnp.asarray(db), 10)
        assert i.shape == (2, 5)


class TestFusedTopk:
    def test_binmax_scores_are_exact(self, data):
        q, db = data
        vals, idxs = binmax_partial_topk(
            jnp.asarray(q), jnp.asarray(db), nbins=128, chunk=512, interpret=True
        )
        s_full = q @ db.T
        v = np.asarray(vals)
        ix = np.asarray(idxs)
        # every reported (idx, val) pair must be a true (row, score) pair,
        # and must be the max within its residue bin
        for b in range(q.shape[0]):
            for l in range(128):
                row = ix[b, l]
                assert row % 128 == l
                np.testing.assert_allclose(v[b, l], s_full[b, row], rtol=1e-3)
                bin_rows = np.arange(l, db.shape[0], 128)
                assert v[b, l] >= s_full[b, bin_rows].max() - 1e-3

    def test_fused_high_recall(self, rng):
        db = rng.standard_normal((8192, 64)).astype(np.float32)
        q = rng.standard_normal((8, 64)).astype(np.float32)
        k = 10
        s, i = fused_topk(
            jnp.asarray(q), jnp.asarray(db), k, nbins=512, chunk=1024, interpret=True
        )
        _, oi = np_topk(q, db, k)
        recall = np.mean(
            [len(set(np.asarray(i)[b]) & set(oi[b])) / k for b in range(len(q))]
        )
        assert recall >= 0.95

    def test_fused_unaligned_batch_and_n(self, rng):
        db = rng.standard_normal((1000, 32)).astype(np.float32)
        q = rng.standard_normal((3, 32)).astype(np.float32)
        s, i = fused_topk(
            jnp.asarray(q), jnp.asarray(db), 5, nbins=128, chunk=256, interpret=True
        )
        assert i.shape == (3, 5)
        assert int(np.asarray(i).max()) < 1000
        # top-1 is always exact under bin-max (no collision can hide the max)
        _, oi = np_topk(q, db, 1)
        np.testing.assert_array_equal(np.asarray(i)[:, :1], oi)


class TestShardedTopk:
    def test_matches_oracle_on_mesh(self, rng, mesh_dp8):
        db = rng.standard_normal((4096, 64)).astype(np.float32)
        q = rng.standard_normal((4, 64)).astype(np.float32)
        dbj = mesh_dp8.put(jnp.asarray(db), mesh_dp8.rows_dp)
        qj = mesh_dp8.put(jnp.asarray(q))
        s, i = sharded_topk(mesh_dp8, qj, dbj, 10)
        _, oi = np_topk(q, db, 10)
        np.testing.assert_array_equal(np.asarray(i), oi)

    def test_sharded_fused(self, rng, mesh_dp8):
        db = rng.standard_normal((8192, 64)).astype(np.float32)
        q = rng.standard_normal((4, 64)).astype(np.float32)
        dbj = mesh_dp8.put(jnp.asarray(db), mesh_dp8.rows_dp)
        qj = mesh_dp8.put(jnp.asarray(q))
        s, i = sharded_topk(
            mesh_dp8, qj, dbj, 10, use_fused=True, nbins=256, chunk=256,
            interpret=True,
        )
        _, oi = np_topk(q, db, 10)
        k = 10
        recall = np.mean(
            [len(set(np.asarray(i)[b]) & set(oi[b])) / k for b in range(len(q))]
        )
        assert recall >= 0.9


class TestInt8Topk:
    def test_quantize_roundtrip(self, rng):
        from rag_inference_pipeline_tpu.ops import quantize_rows_int8
        import jax.numpy as jnp

        x = rng.standard_normal((64, 32)).astype(np.float32)
        q, s = quantize_rows_int8(jnp.asarray(x))
        xr = np.asarray(q, np.float32) * np.asarray(s)[:, None]
        assert np.abs(xr - x).max() < np.abs(x).max() / 100

    def test_int8_fused_high_recall(self, rng):
        from rag_inference_pipeline_tpu.ops import fused_topk_int8, quantize_rows_int8
        import jax.numpy as jnp

        db = rng.standard_normal((4096, 64)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        q = db[:8] + 0.05 * rng.standard_normal((8, 64)).astype(np.float32)
        db_i8, scales = quantize_rows_int8(jnp.asarray(db))
        s, i = fused_topk_int8(
            jnp.asarray(q), db_i8, scales, 10, nbins=512, chunk=1024,
            interpret=True,
        )
        _, oi = np_topk(q, db, 10)
        rec = np.mean(
            [len(set(np.asarray(i)[b]) & set(oi[b])) / 10 for b in range(8)]
        )
        assert rec >= 0.9  # int8 quantization + binmax collisions

    def test_flat_index_int8_mode(self, rng, tmp_path):
        from rag_inference_pipeline_tpu.index import BaseIndex, FlatIndex

        db = rng.standard_normal((2048, 64)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        idx = FlatIndex(64, dtype="int8", nbins=512, chunk=512)
        idx.add(db)
        q = db[:4]
        s, i = idx.search(q, 5)
        _, oi = np_topk(q, db, 5)
        rec = np.mean(
            [len(set(np.asarray(i)[b]) & set(oi[b])) / 5 for b in range(4)]
        )
        assert rec >= 0.9
        p = str(tmp_path / "i8.npz")
        idx.save(p)
        idx2 = BaseIndex.load(p)
        s2, i2 = idx2.search(q, 5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))
        r = np.asarray(idx2.reconstruct([0]))
        assert np.abs(r[0] - db[0]).max() < 0.05

    def test_int8_l2_rejected(self):
        from rag_inference_pipeline_tpu.index import FlatIndex

        with pytest.raises(ValueError, match="ip"):
            FlatIndex(64, dtype="int8", metric="l2")

    def test_int8_with_exact_rescore_recovers_recall(self, rng):
        from rag_inference_pipeline_tpu.ops import fused_topk_int8, quantize_rows_int8
        import jax.numpy as jnp

        db = rng.standard_normal((4096, 64)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        q = db[:8] + 0.08 * rng.standard_normal((8, 64)).astype(np.float32)
        db_i8, scales = quantize_rows_int8(jnp.asarray(db))
        dbj = jnp.asarray(db, jnp.float32)
        k = 10
        _, i_plain = fused_topk_int8(
            jnp.asarray(q), db_i8, scales, k, nbins=512, chunk=1024, interpret=True
        )
        _, i_rescored = fused_topk_int8(
            jnp.asarray(q), db_i8, scales, k, nbins=512, chunk=1024,
            interpret=True, rescore_db=dbj, rescore_k=64,
        )
        _, oi = np_topk(q, db, k)
        r_plain = np.mean([len(set(np.asarray(i_plain)[b]) & set(oi[b]))/k for b in range(8)])
        r_resc = np.mean([len(set(np.asarray(i_rescored)[b]) & set(oi[b]))/k for b in range(8)])
        assert r_resc >= r_plain
        assert r_resc >= 0.95


class TestShardedEdgeCases:
    def test_sharded_l2_metric(self, rng, mesh_dp8):
        """L2 on a dp mesh must rank by L2, not raw IP (unnormalized data)."""
        db = (rng.standard_normal((512, 16)) * rng.uniform(0.1, 5.0, (512, 1))).astype(np.float32)
        q = rng.standard_normal((3, 16)).astype(np.float32)
        dbj = mesh_dp8.put(jnp.asarray(db), mesh_dp8.rows_dp)
        s, i = sharded_topk(mesh_dp8, jnp.asarray(q), dbj, 5, metric="l2")
        _, oi = np_topk(q, db, 5, metric="l2")
        np.testing.assert_array_equal(np.asarray(i), oi)

    def test_shard_padding_never_displaces_negative_neighbors(self, rng, mesh_dp8):
        """All-negative scores: zero pad rows (score 0.0) must not win."""
        q = rng.standard_normal((2, 16)).astype(np.float32)
        # construct db anti-correlated with q so every true score is negative
        db = (-np.abs(rng.standard_normal((99, 2))) @ np.abs(q)).astype(np.float32)
        n = db.shape[0]  # 99 -> padded to 104 on dp=8
        from rag_inference_pipeline_tpu.index import FlatIndex

        idx = FlatIndex(16, dtype="float32", mesh=mesh_dp8, use_fused=False)
        idx.add(db)
        s, i = idx.search(q, 5)
        assert (np.asarray(i) >= 0).all()  # no -1 (masked pad) in top-k
        _, oi = np_topk(q, db, 5)
        np.testing.assert_array_equal(np.asarray(i), oi)

    def test_exact_topk_k_larger_than_chunk(self, rng):
        db = rng.standard_normal((600, 16)).astype(np.float32)
        q = rng.standard_normal((2, 16)).astype(np.float32)
        s, i = exact_topk(jnp.asarray(q), jnp.asarray(db), 300, chunk=128)
        _, oi = np_topk(q, db, 300)
        np.testing.assert_array_equal(np.asarray(i), oi)

    def test_fused_k_beyond_nbins_rejected(self, rng):
        db = rng.standard_normal((512, 16)).astype(np.float32)
        q = rng.standard_normal((2, 16)).astype(np.float32)
        with pytest.raises(ValueError, match="nbins"):
            fused_topk(jnp.asarray(q), jnp.asarray(db), 200, nbins=128,
                       chunk=256, interpret=True)


class TestGlobalScaleInt8:
    """Round-2 kernel semantics: build-time chunk padding + ntotal masking,
    mm_bf16 bit-exactness, and percentile-clipped global quantization."""

    def test_ntotal_masks_pad_rows(self, rng):
        """Pad rows (zeros appended to a chunk multiple) must never win a
        bin even for a query whose true scores are all negative."""
        from rag_inference_pipeline_tpu.ops import quantize_global_int8
        from rag_inference_pipeline_tpu.ops.topk import (
            binmax_partial_topk_int8gs,
        )

        n, d = 700, 64  # pads to 1024 with chunk=512
        x = -np.abs(rng.standard_normal((n, d))).astype(np.float32)
        q = np.abs(rng.standard_normal((4, d))).astype(np.float32)
        db_i8, _ = quantize_global_int8(jnp.asarray(x))
        db_i8 = jnp.pad(db_i8, ((0, 1024 - n), (0, 0)))
        q_i8 = jnp.clip(jnp.round(jnp.asarray(q) * 10), -127, 127).astype(
            jnp.int8
        )
        _, idxs = binmax_partial_topk_int8gs(
            q_i8, db_i8, nbins=128, chunk=512, interpret=True, ntotal=n
        )
        idxs = np.asarray(idxs)
        assert idxs.max() < n, "a zero pad row beat real negative scores"

    def test_mm_bf16_bit_exact(self, rng):
        from rag_inference_pipeline_tpu.ops.topk import (
            binmax_partial_topk_int8gs,
        )

        db = jnp.asarray(
            rng.integers(-127, 128, (2048, 128), dtype=np.int8)
        )
        q = jnp.asarray(rng.integers(-127, 128, (8, 128), dtype=np.int8))
        kw = dict(nbins=256, chunk=1024, interpret=True, ntotal=2000)
        v1, i1 = binmax_partial_topk_int8gs(q, db, **kw)
        v2, i2 = binmax_partial_topk_int8gs(q, db, mm_bf16=True, **kw)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_global_quantize_clips_outlier_row(self, rng):
        """One huge-magnitude row must not crush everyone's resolution:
        the percentile-clipped scale keeps ordinary rows near full range."""
        from rag_inference_pipeline_tpu.ops import quantize_global_int8

        x = rng.standard_normal((1000, 32)).astype(np.float32)
        x[7] *= 1e4  # outlier
        q, scale = quantize_global_int8(jnp.asarray(x))
        q = np.asarray(q)
        ordinary = np.abs(q[np.arange(1000) != 7])
        assert ordinary.max() >= 100, "ordinary rows lost resolution"
        assert np.abs(q[7]).max() == 127  # outlier saturates, fine

    def test_flat_index_build_padding_roundtrip(self, rng):
        """FlatIndex int8: unaligned add -> chunk-padded storage, ntotal
        stays true, search never returns pad ids, incremental add works."""
        from rag_inference_pipeline_tpu.index import FlatIndex

        n, d = 777, 32
        x = rng.standard_normal((n, d)).astype(np.float32)
        idx = FlatIndex(d, dtype="int8", rescore_k=16, chunk=256)
        idx.add(x)
        assert idx.ntotal == n
        assert idx._db_i8.shape[0] % idx._chunk_i8 == 0
        _, ids = idx.search(jnp.asarray(x[:3]), 5)
        assert np.asarray(ids).max() < n
        idx.add(x[:10])
        assert idx.ntotal == n + 10
        _, ids2 = idx.search(jnp.asarray(x[:3]), 5)
        assert np.asarray(ids2).max() < n + 10


class TestChunkedDeviceUpload:
    def test_chunked_put_matches_direct(self, rng):
        from rag_inference_pipeline_tpu.index.flat import _chunked_device_put

        x = rng.standard_normal((1000, 32)).astype(np.float32)
        a = np.asarray(_chunked_device_put(x, jnp.float32, rows_per_block=256))
        np.testing.assert_array_equal(a, x)
        # int8 path
        xi = rng.integers(-127, 128, (700, 16), dtype=np.int8)
        b = np.asarray(_chunked_device_put(xi, jnp.int8, rows_per_block=128))
        np.testing.assert_array_equal(b, xi)

    def test_int8_load_uses_host_side_bf16(self, rng, tmp_path):
        """Save/load at a size crossing the block boundary stays exact in
        the bf16 rescore copy (f16 npz -> host ml_dtypes bf16 -> device)."""
        from rag_inference_pipeline_tpu.index import FlatIndex

        n, d = 600, 16
        x = (rng.standard_normal((n, d)) * 0.1).astype(np.float32)
        idx = FlatIndex(d, dtype="int8", rescore_k=8, chunk=128, nbins=128)
        idx.add(x)
        p = str(tmp_path / "i.npz")
        idx.save(p)
        idx2 = FlatIndex.load(p)
        s1, i1 = idx.search(jnp.asarray(x[:4]), 5)
        s2, i2 = idx2.search(jnp.asarray(x[:4]), 5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(s2), rtol=1e-2, atol=1e-3
        )
