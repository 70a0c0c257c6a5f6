"""Direct oracle tests for the native host-refine rescore kernels
(native/cpuscan.cc cs_rescore_{f16,i8}) — the page-ordered gather and the
F16C/AVX512 half->float dot must be numerically and positionally identical
to a numpy reference, including masked slots, duplicate ids, and rows that
span many 2 MB store pages (the ordering the counting sort rewrites).
"""

import numpy as np
import pytest

from rag_inference_pipeline_tpu.utils import cpuscan


def _oracle(q, rows, ids, k, scale=1.0):
    """numpy top-k over the gathered rows; -1 ids masked."""
    b, s = ids.shape
    out_s = np.full((b, k), -3.0e38, np.float32)
    out_i = np.full((b, k), -1, np.int32)
    for qi in range(b):
        valid = ids[qi] >= 0
        sc = np.full((s,), -3.0e38, np.float32)
        if valid.any():
            g = rows[ids[qi][valid]].astype(np.float32)
            sc[valid] = (g @ q[qi]).astype(np.float32) * scale
        order = np.argsort(-sc, kind="stable")[:k]
        out_s[qi] = sc[order]
        out_i[qi] = np.where(sc[order] > -3.0e38, ids[qi][order], -1)
    return out_s, out_i


@pytest.mark.parametrize("d", [32, 768])
def test_rescore_f16_matches_oracle(rng, d):
    n, b, s, k = 5000, 4, 64, 8
    store = rng.standard_normal((n, d)).astype(np.float16)
    q = rng.standard_normal((b, d)).astype(np.float32)
    ids = rng.integers(0, n, (b, s)).astype(np.int32)
    ids[0, ::7] = -1  # masked slots
    ids[1, :4] = ids[1, 4:8]  # duplicates
    got_s, got_i = cpuscan.rescore_f16(q, store, ids, k)
    want_s, want_i = _oracle(q, store, ids, k)
    # identical gather set => identical winning scores (f32 accumulation
    # both sides; the hardware cvtph_ps conversion is IEEE-exact)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-5, atol=1e-5)
    for qi in range(b):
        assert set(got_i[qi]) == set(want_i[qi])


def test_rescore_f16_subnormals_and_specials(rng):
    """The F16C path must agree with the portable converter on subnormal
    halfs (exp=0, man!=0) and zeros."""
    d = 64
    store = np.zeros((8, d), np.float16)
    store.view(np.uint16)[0, :] = 0x0001  # smallest subnormal
    store.view(np.uint16)[1, :] = 0x03FF  # largest subnormal
    store.view(np.uint16)[2, :] = 0x8001  # -subnormal
    store[3:] = rng.standard_normal((5, d)).astype(np.float16)
    q = np.ones((1, d), np.float32)
    ids = np.arange(8, dtype=np.int32)[None, :]
    got_s, _ = cpuscan.rescore_f16(q, store, ids, 8)
    want_s, _ = _oracle(q, store, ids, 8)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6, atol=1e-30)


def test_rescore_i8_matches_oracle(rng):
    n, d, b, s, k = 4000, 128, 3, 48, 5
    codes = rng.integers(-127, 128, (n, d)).astype(np.int8)
    q = rng.standard_normal((b, d)).astype(np.float32)
    ids = rng.integers(0, n, (b, s)).astype(np.int32)
    ids[2, :] = -1  # fully-masked query
    got_s, got_i = cpuscan.rescore_i8(q, codes, 0.037, ids, k)
    want_s, want_i = _oracle(q, codes, ids, k, scale=0.037)
    np.testing.assert_allclose(got_s[:2], want_s[:2], rtol=1e-5, atol=1e-4)
    assert (got_i[2] == -1).all()


def test_page_spread_ordering_invisible(rng):
    """ids spanning many 2 MB pages (the counting sort's reorder target):
    results must equal a same-seed small-store call semantics — i.e. the
    visit order is invisible."""
    n, d, b, s, k = 200_000, 16, 2, 512, 10  # 200k*32B = 6.4 MB, ~4 pages
    store = rng.standard_normal((n, d)).astype(np.float16)
    q = rng.standard_normal((b, d)).astype(np.float32)
    ids = rng.integers(0, n, (b, s)).astype(np.int32)
    got_s, got_i = cpuscan.rescore_f16(q, store, ids, k)
    want_s, want_i = _oracle(q, store, ids, k)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-5, atol=1e-5)
    for qi in range(b):
        assert set(got_i[qi]) == set(want_i[qi])


def test_madvise_hugepage_best_effort():
    big = np.zeros((1 << 21,), np.uint8)  # exactly 2 MB
    assert cpuscan.madvise_hugepage(big) in (True, False)  # no crash
    small = np.zeros((100,), np.uint8)
    assert cpuscan.madvise_hugepage(small) is False
