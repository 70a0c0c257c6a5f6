"""k-means / IVF / PQ ops vs numpy oracles on clustered synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_inference_pipeline_tpu.ops import (
    assign_clusters,
    build_ivf,
    build_ivf_listing,
    build_ivfpq,
    ivf_search,
    ivfpq_search,
    kmeans,
    pq_decode,
    pq_encode,
    pq_topk,
    train_pq,
)


def clustered_data(rng, n=4000, d=32, n_clusters=16, spread=0.15):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, n)
    x = centers[labels] + spread * rng.standard_normal((n, d)).astype(np.float32)
    return x.astype(np.float32), labels


def np_topk_ip(q, db, k):
    s = q.astype(np.float32) @ db.astype(np.float32).T
    idx = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def recall(ids, oracle_ids):
    k = oracle_ids.shape[1]
    return np.mean(
        [len(set(ids[b]) & set(oracle_ids[b])) / k for b in range(len(ids))]
    )


class TestKMeans:
    def test_recovers_clusters(self, rng):
        x, labels = clustered_data(rng, n=2000, d=16, n_clusters=8, spread=0.05)
        c, counts = kmeans(jax.random.key(0), jnp.asarray(x), 8, iters=20, chunk=512)
        a = np.asarray(assign_clusters(jnp.asarray(x), c, chunk=512))
        # same-label points should land in the same cluster (purity ~ 1)
        purity = np.mean(
            [np.bincount(a[labels == l]).max() / (labels == l).sum() for l in range(8)]
        )
        assert purity > 0.95
        assert np.asarray(counts).sum() == 2000

    def test_no_empty_clusters_on_degenerate_init(self, rng):
        x = np.repeat(rng.standard_normal((4, 8)).astype(np.float32), 64, axis=0)
        c, counts = kmeans(jax.random.key(1), jnp.asarray(x), 4, iters=10, chunk=256)
        assert np.asarray(counts).sum() == 256

    def test_assign_matches_numpy(self, rng):
        x, _ = clustered_data(rng, n=512, d=16)
        c = rng.standard_normal((8, 16)).astype(np.float32)
        a = np.asarray(assign_clusters(jnp.asarray(x), jnp.asarray(c), chunk=128))
        d2 = ((x[:, None] - c[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(a, d2.argmin(1))


class TestIVF:
    def test_listing_invariants(self, rng):
        x, _ = clustered_data(rng, n=1000, d=16, n_clusters=8)
        c = rng.standard_normal((8, 16)).astype(np.float32)
        a = ((x[:, None] - c[None]) ** 2).sum(-1).argmin(1)
        listing = build_ivf_listing(x, c, a, cap_factor=1.5)
        ids = np.asarray(listing.ids)
        all_ids = ids[ids >= 0]
        assert sorted(all_ids) == list(range(1000))  # every row exactly once
        assert np.asarray(listing.list_sizes).sum() == 1000

    def test_search_high_recall(self, rng):
        x, _ = clustered_data(rng, n=4000, d=32, n_clusters=16)
        listing = build_ivf(
            jax.random.key(0), x, nlist=16, train_size=2000, storage_dtype=jnp.float32
        )
        q = x[:8] + 0.01 * rng.standard_normal((8, 32)).astype(np.float32)
        s, i = ivf_search(listing, jnp.asarray(q), 10, nprobe=8)
        _, oi = np_topk_ip(q, x, 10)
        assert recall(np.asarray(i), oi) >= 0.9

    def test_full_probe_is_exact(self, rng):
        x, _ = clustered_data(rng, n=1000, d=16, n_clusters=8)
        listing = build_ivf(
            jax.random.key(0), x, nlist=8, train_size=1000, storage_dtype=jnp.float32
        )
        q = rng.standard_normal((4, 16)).astype(np.float32)
        s, i = ivf_search(listing, jnp.asarray(q), 5, nprobe=8)
        _, oi = np_topk_ip(q, x, 5)
        assert recall(np.asarray(i), oi) == 1.0


class TestPQ:
    def test_roundtrip_error_small(self, rng):
        x, _ = clustered_data(rng, n=2000, d=32, n_clusters=8, spread=0.05)
        cb = train_pq(jax.random.key(0), jnp.asarray(x), m=8, iters=10)
        codes = pq_encode(jnp.asarray(x), cb, chunk=512)
        assert codes.shape == (2000, 8) and codes.dtype == jnp.uint8
        xr = np.asarray(pq_decode(codes, cb))
        rel = np.linalg.norm(xr - x) / np.linalg.norm(x)
        assert rel < 0.25

    def test_pq_topk_recall(self, rng):
        x, _ = clustered_data(rng, n=4000, d=32, n_clusters=16, spread=0.1)
        cb = train_pq(jax.random.key(0), jnp.asarray(x), m=16, iters=10)
        codes = pq_encode(jnp.asarray(x), cb, chunk=1024)
        q = x[:8]
        s, i = pq_topk(jnp.asarray(q), codes, cb, 10, chunk=1024)
        _, oi = np_topk_ip(q, x, 10)
        assert recall(np.asarray(i), oi) >= 0.7  # 8x compression, no re-score


class TestIVFPQ:
    def test_search_recall(self, rng):
        x, _ = clustered_data(rng, n=4000, d=32, n_clusters=16, spread=0.1)
        listing = build_ivfpq(
            jax.random.key(0), x, nlist=16, m=16, train_size=4000
        )
        q = x[:8]
        s, i = ivfpq_search(listing, jnp.asarray(q), 10, nprobe=16, probe_chunk=4)
        _, oi = np_topk_ip(q, x, 10)
        assert recall(np.asarray(i), oi) >= 0.6  # residual PQ, full probe
        assert (np.asarray(i) >= 0).all()


class TestIVFPallasScan:
    def test_matches_xla_path(self, rng):
        from rag_inference_pipeline_tpu.ops import ivf_search_pallas

        x, _ = clustered_data(rng, n=2000, d=32, n_clusters=8)
        listing = build_ivf(
            jax.random.key(0), x, nlist=8, train_size=2000,
            storage_dtype=jnp.float32,
        )
        q = x[:6]
        s_ref, i_ref = ivf_search(listing, jnp.asarray(q), 10, nprobe=8)
        s_pl, i_pl = ivf_search_pallas(
            listing, jnp.asarray(q), 10, nprobe=8, interpret=True
        )
        # full probe, exact scores: both paths must agree on the top-k sets
        for b in range(6):
            assert set(np.asarray(i_pl)[b]) == set(np.asarray(i_ref)[b])
        np.testing.assert_allclose(
            np.sort(np.asarray(s_pl), axis=1),
            np.sort(np.asarray(s_ref), axis=1), rtol=1e-4,
        )

    def test_partial_probe_recall(self, rng):
        from rag_inference_pipeline_tpu.ops import ivf_search_pallas

        x, _ = clustered_data(rng, n=4000, d=32, n_clusters=16)
        listing = build_ivf(
            jax.random.key(0), x, nlist=16, train_size=4000,
            storage_dtype=jnp.float32,
        )
        q = x[:8] + 0.01 * rng.standard_normal((8, 32)).astype(np.float32)
        s, i = ivf_search_pallas(listing, jnp.asarray(q), 10, nprobe=8, interpret=True)
        _, oi = np_topk_ip(q, x, 10)
        assert recall(np.asarray(i), oi) >= 0.85


class TestPQ4:
    def test_pq4_matches_adc_reference(self, rng):
        """PQ4 one-hot-matmul scores must equal the gather-ADC scores."""
        from rag_inference_pipeline_tpu.ops import adc_lookup_sum, pq4_topk, pq_lut

        x, _ = clustered_data(rng, n=1024, d=32, n_clusters=8, spread=0.1)
        cb = train_pq(jax.random.key(0), jnp.asarray(x), m=16, iters=8, ksub=16)
        codes = pq_encode(jnp.asarray(x), cb, chunk=512)
        assert int(np.asarray(codes).max()) < 16
        q = x[:4]
        s, i = pq4_topk(jnp.asarray(q), codes, cb, 10, chunk=256)
        lut = pq_lut(jnp.asarray(q), cb)
        full = np.asarray(adc_lookup_sum(lut, codes, ksub=16))  # [B, N]
        oracle = np.argsort(-full, axis=1)[:, :10]
        for b in range(4):
            assert set(np.asarray(i)[b]) == set(oracle[b])

    def test_pq4_recall(self, rng):
        from rag_inference_pipeline_tpu.ops import pq4_topk

        x, _ = clustered_data(rng, n=4000, d=32, n_clusters=16, spread=0.1)
        # equal bit budget to PQ8 m=16: PQ4 doubles the subspace count
        cb = train_pq(jax.random.key(0), jnp.asarray(x), m=32, iters=10, ksub=16)
        codes = pq_encode(jnp.asarray(x), cb, chunk=1024)
        q = x[:8]
        s, i = pq4_topk(jnp.asarray(q), codes, cb, 10, chunk=1024)
        _, oi = np_topk_ip(q, x, 10)
        assert recall(np.asarray(i), oi) >= 0.6  # 8x compression, no re-score


class TestOPQ:
    def test_rotation_is_orthogonal_and_helps(self, rng):
        from rag_inference_pipeline_tpu.ops import pq_topk, train_opq

        # anisotropic data: correlated dims — where OPQ shines
        basis = rng.standard_normal((32, 32)).astype(np.float32)
        scalesv = np.linspace(3.0, 0.1, 32).astype(np.float32)
        x = (rng.standard_normal((3000, 32)).astype(np.float32) * scalesv) @ basis
        x /= np.linalg.norm(x, axis=1, keepdims=True)

        r, cb_opq = train_opq(jax.random.key(0), jnp.asarray(x), m=8,
                              iters=4, pq_iters=6, ksub=16)
        rr = np.asarray(r)
        np.testing.assert_allclose(rr @ rr.T, np.eye(32), atol=1e-4)

        cb_plain = train_pq(jax.random.key(0), jnp.asarray(x), m=8,
                            iters=6, ksub=16)

        # the property OPQ optimizes: reconstruction error in rotated space
        def recon_err(z, cb):
            rec = np.asarray(pq_decode(pq_encode(z, cb, chunk=1024), cb))
            return np.linalg.norm(rec - np.asarray(z)) / np.linalg.norm(z)

        err_opq = recon_err(jnp.asarray(x) @ r, cb_opq)
        err_plain = recon_err(jnp.asarray(x), cb_plain)
        assert err_opq <= err_plain + 1e-3  # never worse; better on skew

        # rotation preserves IP scores exactly (orthogonality)
        q = x[:4]
        s_rot = (q @ np.asarray(r)) @ (x @ np.asarray(r)).T
        s_plain = q @ x.T
        np.testing.assert_allclose(s_rot, s_plain, atol=1e-3)


class TestIVFPQTailProbes:
    def test_nprobe_not_multiple_of_chunk_scans_all(self, rng):
        """nprobe == nlist with probe_chunk not dividing it must still be an
        exhaustive scan (tail lists were silently dropped before)."""
        x, _ = clustered_data(rng, n=1500, d=32, n_clusters=6, spread=0.05)
        listing = build_ivfpq(jax.random.key(0), x, nlist=6, m=16, train_size=1500)
        q = x[:6]
        s5, i5 = ivfpq_search(listing, jnp.asarray(q), 10, nprobe=6, probe_chunk=4)
        s1, i1 = ivfpq_search(listing, jnp.asarray(q), 10, nprobe=6, probe_chunk=6)
        # both are full probes -> identical candidate sets
        for b in range(6):
            assert set(np.asarray(i5)[b]) == set(np.asarray(i1)[b])


class TestCapacityDisplacement:
    """Round-3 IVF recall root cause (artifacts/round3/ivf_oracle_1m_*.json):
    at cap_factor 1.5 a skewed cluster overflows its bucket and the overflow
    cascades into lists the coarse search never probes — a flat recall loss
    at every nprobe. cap_factor 2.5 (the new default) holds every row in its
    home list."""

    def _skewed(self, rng, n=8000, d=16, nlist=8):
        from rag_inference_pipeline_tpu.ops.ivf import layout_inverted_lists

        centers = rng.standard_normal((nlist, d)).astype(np.float32)
        # one hot cluster holds 25% of the corpus (2x the 12.5% mean —
        # the measured 1M imbalance was 2.26x, within the 2.5 cap)
        probs = np.full(nlist, 0.75 / (nlist - 1))
        probs[3] = 0.25
        assignments = rng.choice(nlist, size=n, p=probs).astype(np.int32)
        x = centers[assignments] + 0.05 * rng.standard_normal((n, d)).astype(
            np.float32
        )
        return layout_inverted_lists, x, centers, assignments

    @staticmethod
    def _displaced(ids, assignments):
        nlist, cap = ids.shape
        stored = np.full(assignments.shape[0], -1, np.int64)
        for lst in range(nlist):
            rows = ids[lst][ids[lst] >= 0]
            stored[rows] = lst
        assert (stored >= 0).all()  # every row indexed exactly once
        return int(np.sum(stored != assignments))

    def test_cap_15_displaces_and_default_does_not(self, rng):
        layout, x, centers, assignments = self._skewed(rng)
        ids_15, _ = layout(x, centers, assignments, cap_factor=1.5)
        assert self._displaced(ids_15, assignments) > 300  # the old default
        ids_def, sizes = layout(x, centers, assignments)  # default 2.5
        assert self._displaced(ids_def, assignments) == 0
        assert int(sizes.sum()) == x.shape[0]

    def test_settings_plumb_cap_factor(self):
        from rag_inference_pipeline_tpu.core.config import Settings
        from rag_inference_pipeline_tpu.index import make_index

        s = Settings(
            index_kind="ivf_flat", index_dim=64, index_nlist=8,
            index_pq_m=8, index_cap_factor=3.0,
        )
        assert make_index(s).cap_factor == 3.0
        s = Settings(index_kind="ivf_pq", index_dim=64, index_pq_m=8)
        assert make_index(s).cap_factor == 2.5  # default
        with pytest.raises(Exception):
            Settings(index_cap_factor=0.5)


class TestPQFlatTier:
    """PQ8 rescore tier (ops/pq.py::PQFlatTier) — the >=30M rescore store."""

    def test_rescore_matches_decode_oracle(self, rng):
        from rag_inference_pipeline_tpu.ops import (
            build_ivfpq, build_pq_tier, pq_decode, pq_rescore_flat,
        )

        x, _ = clustered_data(rng, n=3000, d=32, n_clusters=16, spread=0.1)
        listing = build_ivfpq(
            jax.random.key(0), x, nlist=16, m=8, train_size=3000, ksub=16
        )
        tier = build_pq_tier(
            jax.random.key(1), x, listing.centroids, m=16, train_size=3000,
            encode_chunk=1024,
        )
        q = jnp.asarray(x[:5])
        ids = jnp.asarray(rng.integers(0, 3000, (5, 24)), jnp.int32)
        ids = ids.at[:, -3:].set(-1)  # invalid slots must mask
        scores = np.asarray(pq_rescore_flat(q, ids, tier))
        # oracle: q . (centroid[assign[id]] + decode(codes[id]))
        recon = np.asarray(tier.centroids)[np.asarray(tier.assign)] + np.asarray(
            pq_decode(tier.codes, tier.codebooks)
        )
        for b in range(5):
            for s_i, idx in enumerate(np.asarray(ids)[b]):
                if idx < 0:
                    assert scores[b, s_i] < -1e29
                else:
                    want = float(np.asarray(q)[b] @ recon[idx])
                    assert abs(scores[b, s_i] - want) < 1e-3

    def test_tier_rescore_beats_pq4_shortlist(self, rng):
        from rag_inference_pipeline_tpu.ops import (
            build_ivfpq, build_pq_tier, ivfpq4_search_dedup,
            pq_tier_rescore_topk,
        )

        x, _ = clustered_data(rng, n=4000, d=32, n_clusters=16, spread=0.1)
        listing = build_ivfpq(
            jax.random.key(0), x, nlist=16, m=8, train_size=4000, ksub=16
        )
        tier = build_pq_tier(
            jax.random.key(1), x, listing.centroids, m=16, train_size=4000,
            encode_chunk=2048,
        )
        q = x[:8]
        qj = jnp.asarray(q)
        _, oi = np_topk_ip(q, x, 10)
        s4, i4 = ivfpq4_search_dedup(listing, qj, 64, nprobe=16, interpret=True)
        r_pq4 = recall(np.asarray(i4)[:, :10], oi)
        st, it = pq_tier_rescore_topk(qj, s4, i4, tier, 10)
        r_tier = recall(np.asarray(it), oi)
        # finer codes re-rank the coarse-ADC shortlist: never worse, and
        # on clustered data the PQ4 near-tie scramble leaves headroom
        assert r_tier >= r_pq4 - 1e-9
        assert r_tier >= 0.7
