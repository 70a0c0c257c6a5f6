"""Index lifecycle tests: add/train/search/save/load/unload + validation.

Mirrors the reference's FAISSStore component tests (test_components.py per
SURVEY.md section 4 item 3) but against the real TPU-native indexes on tiny
corpora — no mocking needed since build runs in-process.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rag_inference_pipeline_tpu.core import Settings
from rag_inference_pipeline_tpu.index import (
    BaseIndex,
    FlatIndex,
    IVFFlatIndex,
    IVFPQIndex,
    make_index,
)


@pytest.fixture()
def corpus(rng):
    x = rng.standard_normal((2048, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def oracle_ids(q, db, k):
    s = q @ db.T
    return np.argsort(-s, axis=1)[:, :k]


class TestFlatIndex:
    def test_add_search_exact(self, corpus, rng):
        idx = FlatIndex(32, dtype="float32", use_fused=False)
        idx.add(corpus)
        assert idx.ntotal == 2048 and idx.is_loaded
        q = corpus[:4]
        s, i = idx.search(q, 5)
        np.testing.assert_array_equal(np.asarray(i), oracle_ids(q, corpus, 5))

    def test_incremental_add(self, corpus):
        idx = FlatIndex(32, dtype="float32", use_fused=False)
        idx.add(corpus[:1000])
        idx.add(corpus[1000:])
        assert idx.ntotal == 2048
        s, i = idx.search(corpus[:2], 3)
        np.testing.assert_array_equal(np.asarray(i), oracle_ids(corpus[:2], corpus, 3))

    def test_sharded_on_mesh(self, corpus, mesh_dp8):
        idx = FlatIndex(32, dtype="float32", mesh=mesh_dp8, use_fused=False)
        idx.add(corpus[:2047])  # odd size -> forces shard padding
        s, i = idx.search(corpus[:3], 5)
        np.testing.assert_array_equal(
            np.asarray(i), oracle_ids(corpus[:3], corpus[:2047], 5)
        )

    def test_validation(self, corpus):
        idx = FlatIndex(32, use_fused=False)
        with pytest.raises(RuntimeError):
            idx.search(corpus[:1], 5)
        idx.add(corpus)
        with pytest.raises(ValueError):
            idx.search(np.zeros((2, 16), np.float32), 5)
        with pytest.raises(ValueError):
            idx.add(np.zeros((4, 16), np.float32))

    def test_save_load_roundtrip(self, corpus, tmp_path):
        idx = FlatIndex(32, dtype="float32", use_fused=False)
        idx.add(corpus)
        p = str(tmp_path / "flat.npz")
        idx.save(p)
        idx2 = BaseIndex.load(p)
        assert isinstance(idx2, FlatIndex)
        assert idx2.ntotal == 2048
        s1, i1 = idx.search(corpus[:2], 4)
        s2, i2 = idx2.search(corpus[:2], 4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_unload(self, corpus):
        idx = FlatIndex(32, use_fused=False)
        idx.add(corpus)
        idx.unload()
        assert not idx.is_loaded and idx.ntotal == 0

    def test_warmup(self, corpus):
        idx = FlatIndex(32, dtype="float32", use_fused=False)
        idx.add(corpus)
        assert idx.warmup() > 0


class TestIVFFlatIndex:
    def test_train_search_saveload(self, corpus, tmp_path):
        idx = IVFFlatIndex(32, nlist=16, nprobe=8, dtype="float32")
        idx.train_add(corpus, train_size=2048, iters=8)
        assert idx.ntotal == 2048 and idx.imbalance <= 3.0
        q = corpus[:8]
        s, i = idx.search(q, 10)
        oi = oracle_ids(q, corpus, 10)
        rec = np.mean([len(set(np.asarray(i)[b]) & set(oi[b])) / 10 for b in range(8)])
        assert rec >= 0.85
        p = str(tmp_path / "ivf.npz")
        idx.save(p)
        idx2 = BaseIndex.load(p)
        s2, i2 = idx2.search(q, 10)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))

    def test_nprobe_knob(self, corpus):
        idx = IVFFlatIndex(32, nlist=16, nprobe=1, dtype="float32")
        idx.train_add(corpus, train_size=2048, iters=8)
        q = corpus[:8]
        _, i1 = idx.search(q, 10)
        idx.nprobe = 16
        _, i16 = idx.search(q, 10)
        oi = oracle_ids(q, corpus, 10)
        r1 = np.mean([len(set(np.asarray(i1)[b]) & set(oi[b])) / 10 for b in range(8)])
        r16 = np.mean([len(set(np.asarray(i16)[b]) & set(oi[b])) / 10 for b in range(8)])
        assert r16 == 1.0 and r16 >= r1


class TestIVFPQIndex:
    def test_train_search_rescore_saveload(self, corpus, tmp_path):
        idx = IVFPQIndex(32, nlist=8, m=16, nprobe=8, rescore_k=64)
        idx.train_add(corpus, train_size=2048, kmeans_iters=8, pq_iters=8)
        q = corpus[:8]
        s, i = idx.search(q, 10)
        oi = oracle_ids(q, corpus, 10)
        rec = np.mean([len(set(np.asarray(i)[b]) & set(oi[b])) / 10 for b in range(8)])
        assert rec >= 0.8  # full probe + exact re-score
        p = str(tmp_path / "ivfpq.npz")
        idx.save(p)
        idx2 = BaseIndex.load(p)
        assert isinstance(idx2, IVFPQIndex) and idx2.rescore_k == 64
        s2, i2 = idx2.search(q, 10)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))

    def test_rescore_beats_adc(self, corpus):
        raw = IVFPQIndex(32, nlist=8, m=8, nprobe=8, rescore_k=0)
        raw.train_add(corpus, train_size=2048, kmeans_iters=8, pq_iters=8)
        rsc = IVFPQIndex(32, nlist=8, m=8, nprobe=8, rescore_k=128)
        rsc.train_add(corpus, train_size=2048, kmeans_iters=8, pq_iters=8)
        q = corpus[:16]
        oi = oracle_ids(q, corpus, 10)
        _, ia = raw.search(q, 10)
        _, ib = rsc.search(q, 10)
        ra = np.mean([len(set(np.asarray(ia)[b]) & set(oi[b])) / 10 for b in range(16)])
        rb = np.mean([len(set(np.asarray(ib)[b]) & set(oi[b])) / 10 for b in range(16)])
        assert rb >= ra


class TestFactory:
    def test_make_index_kinds(self):
        s = Settings(index_kind="flat", index_dim=64, index_pq_m=8)
        assert isinstance(make_index(s), FlatIndex)
        s = Settings(index_kind="ivf_flat", index_dim=64, index_nlist=8, index_pq_m=8)
        assert isinstance(make_index(s), IVFFlatIndex)
        s = Settings(index_kind="ivf_pq", index_dim=64, index_pq_m=8)
        assert isinstance(make_index(s), IVFPQIndex)


class TestIVFPQOPQ:
    def test_opq_mode_roundtrip(self, corpus, tmp_path):
        idx = IVFPQIndex(32, nlist=8, m=8, nprobe=8, rescore_k=64, opq=True)
        idx.train_add(corpus, train_size=2048, kmeans_iters=6, pq_iters=6)
        assert idx._rotation is not None
        q = corpus[:8]
        s, i = idx.search(q, 10)
        oi = oracle_ids(q, corpus, 10)
        rec = np.mean([len(set(np.asarray(i)[b]) & set(oi[b])) / 10 for b in range(8)])
        assert rec >= 0.6
        p = str(tmp_path / "opq.npz")
        idx.save(p)
        idx2 = BaseIndex.load(p)
        assert idx2.opq and idx2._rotation is not None
        s2, i2 = idx2.search(q, 10)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))


class TestIVFExactKnob:
    """ADVICE round-1 item: the positional bin-max Pallas path can collapse
    two true neighbors at the same in-list position; exact=True must route
    to the XLA gather path which is exact within probed lists (faiss
    IndexIVFFlat semantics)."""

    def test_exact_true_matches_oracle_within_probes(self, rng):
        import jax.numpy as jnp

        from rag_inference_pipeline_tpu.index import IVFFlatIndex
        from rag_inference_pipeline_tpu.ops import exact_topk

        n, d, nlist, k = 5000, 32, 16, 10
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        q = x[rng.integers(0, n, 8)] + 0.01 * rng.standard_normal(
            (8, d)
        ).astype(np.float32)

        idx = IVFFlatIndex(d, nlist, nprobe=nlist, exact=True)  # all lists
        idx.train_add(x, train_size=2000)
        _, ids = idx.search(jnp.asarray(q), k)
        _, oracle = exact_topk(jnp.asarray(q), jnp.asarray(x), k)
        ids, oracle = np.asarray(ids), np.asarray(oracle)
        # probing every list with the exact path == brute force
        rec = np.mean(
            [len(set(ids[i]) & set(oracle[i])) / k for i in range(8)]
        )
        assert rec == 1.0, rec

    def test_exact_knob_at_least_as_good_as_default(self, rng):
        import jax.numpy as jnp

        from rag_inference_pipeline_tpu.index import IVFFlatIndex
        from rag_inference_pipeline_tpu.ops import exact_topk

        n, d, nlist, k = 5000, 32, 32, 10
        x = rng.standard_normal((n, d)).astype(np.float32)
        q = x[rng.integers(0, n, 8)] + 0.01 * rng.standard_normal(
            (8, d)
        ).astype(np.float32)
        _, oracle = exact_topk(jnp.asarray(q), jnp.asarray(x), k)
        oracle = np.asarray(oracle)

        def recall(exact):
            idx = IVFFlatIndex(d, nlist, nprobe=8, exact=exact)
            idx.train_add(x, train_size=2000)
            _, ids = idx.search(jnp.asarray(q), k)
            ids = np.asarray(ids)
            return np.mean(
                [len(set(ids[i]) & set(oracle[i])) / k for i in range(8)]
            )

        assert recall(True) >= recall(False) - 1e-9


class TestShardedInt8Flat:
    """FlatIndex int8 + mesh.dp>1 routes through sharded_topk_int8gs at the
    index layer (round-2 VERDICT #3) — previously only the fused pipeline
    honored the mesh for the headline index config."""

    def test_sharded_int8_matches_unsharded(self, rng, mesh_dp8):
        db = rng.standard_normal((2048, 64)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        q = db[:4] + 0.05 * rng.standard_normal((4, 64)).astype(np.float32)
        k = 5

        solo = FlatIndex(64, dtype="int8", nbins=512, chunk=512)
        solo.add(db)
        _, i_solo = solo.search(q, k)

        shard = FlatIndex(64, dtype="int8", nbins=512, chunk=512, mesh=mesh_dp8)
        shard.add(db)
        # 2048 rows pad to chunk_i8*dp = 8192: most shards are pure padding
        assert shard._db_i8.shape[0] == 8192
        assert shard.ntotal == 2048
        _, i_sh = shard.search(q, k)

        oi = oracle_ids(q, db, k)
        rec = np.mean(
            [len(set(np.asarray(i_sh)[b]) & set(oi[b])) / k for b in range(4)]
        )
        assert rec >= 0.9
        # sharded and unsharded agree after the exact bf16 re-score
        np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_solo))

    def test_sharded_int8_all_negative_scores(self, rng, mesh_dp8):
        """Zero pad rows score 0 in the int32 domain; with every true score
        negative they would win bins and then be masked away, silently
        dropping real candidates (round-2 advisor finding). The per-shard
        ntotal now masks them to INT32_MIN inside the kernel."""
        q = np.abs(rng.standard_normal((2, 16))).astype(np.float32)
        db = -np.abs(rng.standard_normal((99, 16))).astype(np.float32)
        idx = FlatIndex(16, dtype="int8", nbins=128, chunk=128, mesh=mesh_dp8)
        idx.add(db)
        s, i = idx.search(q, 5)
        i = np.asarray(i)
        assert (i >= 0).all() and (i < 99).all()
        assert (np.asarray(s) < 0).all()  # pad-row zeros never leak through
        np.testing.assert_array_equal(i[:, :1], oracle_ids(q, db, 1))

    def test_sharded_int8_save_load(self, rng, mesh_dp8, tmp_path):
        db = rng.standard_normal((1024, 64)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        solo = FlatIndex(64, dtype="int8", nbins=512, chunk=512)
        solo.add(db)
        p = str(tmp_path / "i8.npz")
        solo.save(p)
        q = db[:3]
        _, i_solo = solo.search(q, 5)
        loaded = BaseIndex.load(p, mesh=mesh_dp8)
        assert loaded._db_i8.sharding.spec[0] is not None  # rows dp-sharded
        _, i_sh = loaded.search(q, 5)
        np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_solo))

    def test_rescore_stays_on_at_large_k(self, rng):
        """k >= rescore_k must deepen the shortlist instead of silently
        disabling the exact re-score (round-2 advisor finding)."""
        db = rng.standard_normal((2048, 64)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        q = db[:4] + 0.05 * rng.standard_normal((4, 64)).astype(np.float32)
        idx = FlatIndex(64, dtype="int8", nbins=512, chunk=512, rescore_k=64)
        idx.add(db)
        k = 64  # == rescore_k: old gate would turn rescore off
        _, ids = idx.search(q, k)
        oi = oracle_ids(q, db, k)
        rec = np.mean(
            [len(set(np.asarray(ids)[b]) & set(oi[b])) / k for b in range(4)]
        )
        assert rec >= 0.95


class TestIVFDedupGate:
    def test_dedup_fits_gate(self, rng):
        x = rng.standard_normal((4096, 32)).astype(np.float32)
        idx = IVFFlatIndex(32, 64, nprobe=32)
        idx.train_add(x, train_size=2000)
        assert idx._dedup_fits(2)  # small batch: cheap union
        # force a tiny budget: serving-size batch must fall back
        idx._DEDUP_BYTES_BUDGET = 1 << 16
        assert not idx._dedup_fits(128)


def _clustered_corpus(rng, n=4096, d=32, n_centers=64, spread=0.4):
    """ANN-realistic clustered rows (IVF recall on UNIFORM random data is
    probing-bound by construction — artifacts/round3/ivf_oracle.json)."""
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = rng.integers(0, n_centers, n)
    x = centers[which] + (spread / np.sqrt(d)) * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


class TestShardedIVF:
    """dp-sharded inverted lists (round-2 VERDICT #4): each shard owns
    nlist/dp lists + centroids, probes locally, all-gather-merges."""

    def test_ivf_flat_dp8_recall_parity(self, rng, mesh_dp8):
        x = _clustered_corpus(rng)
        q = x[:16] + 0.01 * rng.standard_normal((16, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)

        ref = IVFFlatIndex(32, nlist=64, nprobe=16, dtype="float32")
        ref.train_add(x, train_size=2048, iters=8)
        sh = IVFFlatIndex(32, nlist=64, nprobe=16, dtype="float32",
                          mesh=mesh_dp8)
        sh.train_add(x, train_size=2048, iters=8)
        assert sh._sharded

        oracle = oracle_ids(q, x, 10)
        def recall(ids):
            return np.mean([
                len(set(np.asarray(ids)[i]) & set(oracle[i])) / 10
                for i in range(len(q))
            ])

        _, i_ref = ref.search(q, 10)
        _, i_sh = sh.search(q, 10)
        r_ref, r_sh = recall(i_ref), recall(i_sh)
        # the auto scan-slot default is 2*ceil(nprobe/dp) — the measured
        # exactness point (artifacts/round4/ivf_sharded_parity.json, round-4
        # VERDICT weak #2): at it, the sharded result must MATCH the
        # unsharded search, not just track it (same training data => same
        # centroids => same global probe set; 2x slots => no shard drops a
        # threshold-clearing list on this fixture)
        i_ref, i_sh = np.asarray(i_ref), np.asarray(i_sh)
        for row_ref, row_sh in zip(i_ref, i_sh):
            assert set(row_ref.tolist()) == set(row_sh.tolist())
        assert r_sh == r_ref
        assert r_sh >= 0.8, r_sh

    def test_ivf_flat_dp8_ids_valid(self, rng, mesh_dp8):
        x = _clustered_corpus(rng, n=1024)
        sh = IVFFlatIndex(32, nlist=64, nprobe=64, dtype="float32",
                          mesh=mesh_dp8)
        sh.train_add(x, train_size=1024, iters=6)
        s, i = sh.search(x[:4], 8)
        i = np.asarray(i)
        assert ((i >= -1) & (i < 1024)).all()
        # full-probe search must find the queries themselves
        assert all(j in set(i[j].tolist()) for j in range(4))

    def test_ivf_pq4_dp8_search(self, rng, mesh_dp8):
        x = _clustered_corpus(rng, n=2048, d=64)
        q = x[:8]
        sh = IVFPQIndex(64, nlist=64, m=8, ksub=16, nprobe=32,
                        rescore_k=64, mesh=mesh_dp8)
        sh.train_add(x, train_size=2048, kmeans_iters=6, pq_iters=6)
        assert sh._sharded
        oracle = oracle_ids(q, x, 10)
        _, i_sh = sh.search(q, 10)
        rec = np.mean([
            len(set(np.asarray(i_sh)[j]) & set(oracle[j])) / 10
            for j in range(len(q))
        ])
        assert rec >= 0.6, rec  # ADC+rescore on tiny PQ4; sanity floor

    def test_sharding_requires_divisible_nlist(self, rng, mesh_dp8):
        x = _clustered_corpus(rng, n=512)
        idx = IVFFlatIndex(32, nlist=30, nprobe=8, dtype="float32",
                           mesh=mesh_dp8)
        idx.train_add(x, train_size=512, iters=4)
        assert not idx._sharded  # 30 % 8 != 0 -> stays replicated

    def test_ivf_flat_sharded_save_load(self, rng, mesh_dp8, tmp_path):
        x = _clustered_corpus(rng, n=1024)
        sh = IVFFlatIndex(32, nlist=64, nprobe=16, dtype="float32",
                          mesh=mesh_dp8)
        sh.train_add(x, train_size=1024, iters=6)
        p = str(tmp_path / "ivf_sharded.npz")
        sh.save(p)
        back = BaseIndex.load(p, mesh=mesh_dp8)
        assert back._sharded and back.ntotal == 1024
        s, i = back.search(x[:4], 5)
        assert np.asarray(i).shape == (4, 5)


class TestIVFPQTierRescore:
    """rescore_kind="pq8": the flat residual-PQ8 rescore tier (the >=30M
    single-chip store — ops/pq.py::PQFlatTier)."""

    def test_pq8_tier_search_saveload(self, corpus, tmp_path):
        idx = IVFPQIndex(
            32, nlist=8, m=8, nprobe=8, rescore_k=64,
            ksub=16, rescore_kind="pq8", rescore_pq_m=16,
        )
        idx.train_add(corpus, train_size=2048, kmeans_iters=8, pq_iters=8)
        assert idx._tier is not None and idx._vectors is None
        q = corpus[:8]
        s, i = idx.search(q, 10)
        oi = oracle_ids(q, corpus, 10)
        rec = np.mean(
            [len(set(np.asarray(i)[b]) & set(oi[b])) / 10 for b in range(8)]
        )
        assert rec >= 0.7  # full probe + PQ8 re-rank of the PQ4 shortlist
        p = str(tmp_path / "ivfpq_tier.npz")
        idx.save(p)
        idx2 = BaseIndex.load(p)
        assert isinstance(idx2, IVFPQIndex)
        assert idx2.rescore_kind == "pq8" and idx2._tier is not None
        s2, i2 = idx2.search(q, 10)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))

    def test_pq8_tier_beats_raw_pq4(self, corpus):
        raw = IVFPQIndex(32, nlist=8, m=8, nprobe=8, rescore_k=0, ksub=16)
        raw.train_add(corpus, train_size=2048, kmeans_iters=8, pq_iters=8)
        tier = IVFPQIndex(
            32, nlist=8, m=8, nprobe=8, rescore_k=128,
            ksub=16, rescore_kind="pq8", rescore_pq_m=16,
        )
        tier.train_add(corpus, train_size=2048, kmeans_iters=8, pq_iters=8)
        q = corpus[:16]
        oi = oracle_ids(q, corpus, 10)
        _, ia = raw.search(q, 10)
        _, ib = tier.search(q, 10)
        ra = np.mean([len(set(np.asarray(ia)[b]) & set(oi[b])) / 10 for b in range(16)])
        rb = np.mean([len(set(np.asarray(ib)[b]) & set(oi[b])) / 10 for b in range(16)])
        assert rb >= ra

    def test_settings_wire_rescore_kind(self):
        s = Settings(
            index_kind="ivf_pq", index_dim=64, index_pq_m=8,
            index_pq_bits=4, index_pq_rescore_kind="pq8",
        )
        idx = make_index(s)
        assert isinstance(idx, IVFPQIndex) and idx.rescore_kind == "pq8"
        with pytest.raises(Exception):
            Settings(index_pq_rescore_kind="float64")


class TestIVFPQHostRefine:
    """rescore_kind="host_int8": host-RAM refine store (faiss refine-from-
    storage shape) — device shortlist, exact host re-score."""

    def test_host_refine_matches_exact_rescore(self, corpus):
        ex = IVFPQIndex(32, nlist=8, m=8, nprobe=8, rescore_k=128, ksub=16)
        ex.train_add(corpus, train_size=2048, kmeans_iters=8, pq_iters=8)
        host = IVFPQIndex(
            32, nlist=8, m=8, nprobe=8, rescore_k=128,
            ksub=16, rescore_kind="host_int8",
        )
        host.train_add(corpus, train_size=2048, kmeans_iters=8, pq_iters=8)
        assert host._host_codes is not None and host._vectors is None
        q = corpus[:16]
        oi = oracle_ids(q, corpus, 10)
        _, ie = ex.search(q, 10)
        _, ih = host.search(q, 10)
        re_ = np.mean([len(set(np.asarray(ie)[b]) & set(oi[b])) / 10 for b in range(16)])
        rh = np.mean([len(set(np.asarray(ih)[b]) & set(oi[b])) / 10 for b in range(16)])
        # int8 refine quantization error is ~0.4% — recall parity with the
        # bf16 exact store up to near-exact ties
        assert rh >= re_ - 0.05
        assert rh >= 0.8

    def test_host_refine_saveload(self, corpus, tmp_path):
        idx = IVFPQIndex(
            32, nlist=8, m=8, nprobe=8, rescore_k=64,
            ksub=16, rescore_kind="host_int8",
        )
        idx.train_add(corpus, train_size=2048, kmeans_iters=8, pq_iters=8)
        q = corpus[:8]
        _, i1 = idx.search(q, 10)
        p = str(tmp_path / "ivfpq_host.npz")
        idx.save(p)
        idx2 = BaseIndex.load(p)
        assert idx2.rescore_kind == "host_int8"
        assert idx2._host_codes is not None
        assert idx2._host_codes.dtype == np.int8
        _, i2 = idx2.search(q, 10)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_settings_wire_host_kind(self):
        s = Settings(
            index_kind="ivf_pq", index_dim=64, index_pq_m=8,
            index_pq_bits=4, index_pq_rescore_kind="host_int8",
        )
        idx = make_index(s)
        assert idx.rescore_kind == "host_int8"


class TestShardedHostRefine:
    """dp-sharded IVF-PQ + host_int8 refine compose: shortlist ids are
    global, so the replicated host-RAM store re-scores a sharded search's
    merged candidates unchanged (the 30M-per-shard capacity shape)."""

    def test_sharded_pq_with_host_refine(self, rng, mesh_dp8):
        x = _clustered_corpus(rng)
        q = x[:16] + 0.01 * rng.standard_normal((16, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        oracle = oracle_ids(q, x, 10)

        sh = IVFPQIndex(
            32, nlist=64, m=8, nprobe=32, rescore_k=128,
            ksub=16, rescore_kind="host_int8", mesh=mesh_dp8,
        )
        sh.train_add(x, train_size=2048, kmeans_iters=8, pq_iters=8)
        assert sh._sharded and sh._host_codes is not None

        _, ids = sh.search(q, 10)
        ids = np.asarray(ids)
        assert ((ids >= 0) & (ids < len(x))).all()
        rec = np.mean(
            [len(set(ids[i]) & set(oracle[i])) / 10 for i in range(16)]
        )
        assert rec >= 0.8, rec


class TestFlatHostRescore:
    """flat-int8 with rescore_store="host": f16 originals in host RAM,
    device shortlist + exact host refine (the >=10M recall play where the
    device bf16 copy exceeds HBM)."""

    def _int8(self, corpus, **kw):
        idx = FlatIndex(32, dtype="int8", rescore_k=64, **kw)
        idx.add(corpus)
        return idx

    def test_host_matches_device_rescore(self, corpus, rng):
        dev = self._int8(corpus)
        host = self._int8(corpus, rescore_store="host")
        assert host._host_rescore is not None and host._db is None
        assert dev._db is not None
        q = corpus[:16]
        oi = oracle_ids(q, corpus, 10)
        _, i_d = dev.search(q, 10)
        _, i_h = host.search(q, 10)
        rd = np.mean([len(set(np.asarray(i_d)[b]) & set(oi[b])) / 10 for b in range(16)])
        rh = np.mean([len(set(np.asarray(i_h)[b]) & set(oi[b])) / 10 for b in range(16)])
        # f16 host refine vs bf16 device refine: f16 has MORE mantissa —
        # recall must be at least as good up to near-exact ties
        assert rh >= rd - 0.02
        assert rh >= 0.95

    def test_host_saveload_boot_path(self, corpus, tmp_path):
        idx = self._int8(corpus, rescore_store="host")
        q = corpus[:8]
        _, i1 = idx.search(q, 10)
        p = str(tmp_path / "flat_host.npz")
        idx.save(p)
        idx2 = BaseIndex.load(p)
        assert idx2.rescore_store == "host"
        assert idx2._host_rescore is not None and idx2._db is None
        _, i2 = idx2.search(q, 10)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_host_incremental_add(self, corpus):
        idx = self._int8(corpus[:1024], rescore_store="host")
        idx.add(corpus[1024:])
        assert idx.ntotal == len(corpus)
        assert idx._host_rescore.shape[0] == len(corpus)
        q = corpus[:8]
        oi = oracle_ids(q, corpus, 10)
        _, ids = idx.search(q, 10)
        rec = np.mean([len(set(np.asarray(ids)[b]) & set(oi[b])) / 10 for b in range(8)])
        assert rec >= 0.95

    def test_host_sharded_dp8(self, corpus, rng, mesh_dp8):
        idx = FlatIndex(
            32, dtype="int8", rescore_k=64, rescore_store="host",
            mesh=mesh_dp8,
        )
        idx.add(corpus)
        q = corpus[:8]
        oi = oracle_ids(q, corpus, 10)
        _, ids = idx.search(q, 10)
        rec = np.mean([len(set(np.asarray(ids)[b]) & set(oi[b])) / 10 for b in range(8)])
        assert rec >= 0.95

    def test_settings_wire_rescore_store(self):
        s = Settings(index_kind="flat", index_dim=64, index_pq_m=8,
                     index_dtype="int8", index_rescore_store="host")
        idx = make_index(s)
        assert isinstance(idx, FlatIndex) and idx.rescore_store == "host"
        with pytest.raises(Exception):
            Settings(index_rescore_store="hbm")

    def test_load_override_moves_device_artifact_to_host(self, corpus, tmp_path):
        """A device-saved artifact (the 4.5M reference-scale shape) loaded
        with rescore_store="host" must keep the f16 copy host-side — the
        boot path that skips the multi-GB rescore upload."""
        dev = self._int8(corpus)  # rescore_store="device"
        p = str(tmp_path / "flat_dev.npz")
        dev.save(p)
        q = corpus[:8]
        _, i_dev = dev.search(q, 10)
        idx = BaseIndex.load(p, rescore_store="host")
        assert idx.rescore_store == "host"
        assert idx._host_rescore is not None and idx._db is None
        _, i_host = idx.search(q, 10)
        oi = oracle_ids(q, corpus, 10)
        rh = np.mean(
            [len(set(np.asarray(i_host)[b]) & set(oi[b])) / 10 for b in range(8)]
        )
        assert rh >= 0.95
        # and the reverse: a host-saved artifact forced onto the device
        p2 = str(tmp_path / "flat_host2.npz")
        host = self._int8(corpus, rescore_store="host")
        host.save(p2)
        back = BaseIndex.load(p2, rescore_store="device")
        assert back._db is not None and back._host_rescore is None


class TestIVFPQHostF16:
    """rescore_kind="host_f16": f16 originals in host RAM — near-exact
    ranking where the int8 refine's precision ceiling binds."""

    def test_host_f16_search_saveload(self, corpus, tmp_path):
        idx = IVFPQIndex(
            32, nlist=8, m=8, nprobe=8, rescore_k=128,
            ksub=16, rescore_kind="host_f16",
        )
        idx.train_add(corpus, train_size=2048, kmeans_iters=8, pq_iters=8)
        assert idx._host_f16 is not None and idx._host_codes is None
        q = corpus[:16]
        oi = oracle_ids(q, corpus, 10)
        _, ids = idx.search(q, 10)
        rec = np.mean(
            [len(set(np.asarray(ids)[b]) & set(oi[b])) / 10 for b in range(16)]
        )
        assert rec >= 0.9  # full probe + near-exact refine
        p = str(tmp_path / "ivfpq_hostf16.npz")
        idx.save(p)
        idx2 = BaseIndex.load(p)
        assert idx2.rescore_kind == "host_f16" and idx2._host_f16 is not None
        _, i2 = idx2.search(q, 10)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(i2))

    def test_f16_at_least_as_good_as_int8_refine(self, corpus):
        a = IVFPQIndex(32, nlist=8, m=8, nprobe=8, rescore_k=128,
                       ksub=16, rescore_kind="host_int8")
        a.train_add(corpus, train_size=2048, kmeans_iters=8, pq_iters=8)
        b = IVFPQIndex(32, nlist=8, m=8, nprobe=8, rescore_k=128,
                       ksub=16, rescore_kind="host_f16")
        b.train_add(corpus, train_size=2048, kmeans_iters=8, pq_iters=8)
        q = corpus[:16]
        oi = oracle_ids(q, corpus, 10)
        _, ia = a.search(q, 10)
        _, ib = b.search(q, 10)
        ra = np.mean([len(set(np.asarray(ia)[x]) & set(oi[x])) / 10 for x in range(16)])
        rb = np.mean([len(set(np.asarray(ib)[x]) & set(oi[x])) / 10 for x in range(16)])
        assert rb >= ra - 0.02
