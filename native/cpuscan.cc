// Multithreaded CPU flat / IVF-flat scan — the honest FAISS stand-in for
// bench.py's vs_baseline ratio (faiss-cpu is not installable in this image;
// the reference's retrieval hot loop is faiss's C++ scan invoked at
// src/pipeline/components/faiss_store.py:113-158, target hardware a 16-core
// Xeon Gold 6242 per .env.prod:5-10).
//
// Exposes a C ABI consumed via ctypes (no pybind11 in the image):
//   cs_scan_f32    exact f32 inner-product top-k (IndexFlatIP analog)
//   cs_scan_i8     int8 scan + per-row dequant (SQ8 analog, same index
//                  memory as the TPU int8 index)
//   cs_scan_ivf_f32 IVF-flat probe: centroid scan -> nprobe list scans
//                  (IndexIVFFlat analog, nlist/nprobe semantics of
//                  create_test_docs.py:84-104)
//
// Parallelism: rows are partitioned across std::thread workers, each keeps
// per-query k-heaps, merged at the end — the same work decomposition faiss
// uses under OpenMP. Build: make -C native (adds -O3 -march=native).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#if defined(__x86_64__)
#include <immintrin.h>
#endif
#if defined(__linux__)
#include <sys/mman.h>
// synchronous hugepage collapse (Linux 6.1+); this glibc's sys/mman.h
// predates it even though the kernel supports it
#ifndef MADV_COLLAPSE
#define MADV_COLLAPSE 25
#endif
#endif

namespace {

struct Cand {
  float s;
  int32_t id;
};

// Fixed-size min-heap over score (root = worst retained candidate).
struct KHeap {
  std::vector<Cand> h;
  int k;
  explicit KHeap(int k_) : k(k_) { h.reserve(k_); }
  inline void push(float s, int32_t id) {
    if ((int)h.size() < k) {
      h.push_back({s, id});
      std::push_heap(h.begin(), h.end(),
                     [](const Cand& a, const Cand& b) { return a.s > b.s; });
    } else if (s > h.front().s) {
      std::pop_heap(h.begin(), h.end(),
                    [](const Cand& a, const Cand& b) { return a.s > b.s; });
      h.back() = {s, id};
      std::push_heap(h.begin(), h.end(),
                     [](const Cand& a, const Cand& b) { return a.s > b.s; });
    }
  }
};

inline float dot_f32(const float* a, const float* b, int d) {
  float acc = 0.f;
#pragma GCC ivdep
  for (int j = 0; j < d; ++j) acc += a[j] * b[j];
  return acc;
}

inline int32_t dot_i8(const int8_t* a, const int8_t* b, int d) {
  int32_t acc = 0;
#pragma GCC ivdep
  for (int j = 0; j < d; ++j)
    acc += (int32_t)a[j] * (int32_t)b[j];
  return acc;
}

void emit_sorted(std::vector<KHeap>& heaps, int b, int k, float* out_s,
                 int32_t* out_i) {
  for (int qi = 0; qi < b; ++qi) {
    auto& h = heaps[qi].h;
    std::sort(h.begin(), h.end(),
              [](const Cand& a, const Cand& c) { return a.s > c.s; });
    for (int j = 0; j < k; ++j) {
      if (j < (int)h.size()) {
        out_s[qi * k + j] = h[j].s;
        out_i[qi * k + j] = h[j].id;
      } else {
        out_s[qi * k + j] = -3.0e38f;
        out_i[qi * k + j] = -1;
      }
    }
  }
}

// Merge per-thread heaps into thread 0's heaps.
void merge_heaps(std::vector<std::vector<KHeap>>& all, int b) {
  for (size_t t = 1; t < all.size(); ++t)
    for (int qi = 0; qi < b; ++qi)
      for (const Cand& c : all[t][qi].h) all[0][qi].push(c.s, c.id);
}

int clamp_threads(int nthreads) {
  int hw = (int)std::thread::hardware_concurrency();
  if (hw <= 0) hw = 1;
  if (nthreads <= 0 || nthreads > hw) nthreads = hw;
  return nthreads;
}


// Portable IEEE half -> float (the f16 host refine store; no F16C
// dependency so the lib builds on any x86-64).
inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FFu;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;  // +-0
    } else {        // subnormal: normalize
      int e = -1;
      uint32_t m = man;
      do {
        ++e;
        m <<= 1;
      } while (!(m & 0x400u));
      bits = sign | ((uint32_t)(127 - 15 - e) << 23) | ((m & 0x3FFu) << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (man << 13);  // inf / nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float f;
  std::memcpy(&f, &bits, sizeof(f));
  return f;
}

// f32 . f16-row dot. The portable half_to_float above costs ~5 scalar ops
// per element (~7 us for a 768-d row — 20x the gather it decorates, the
// measured B=1 host-refine wall). The lib builds -march=native, so use the
// hardware converter where the host has one: AVX512F does 16 halfs/cycle
// (_mm512_cvtph_ps), F16C does 8. Conversion semantics are identical to
// the portable path (IEEE 754 half, subnormals included) — bit-exact.
inline float dot_f32_f16row(const float* q, const uint16_t* row, int d) {
  int j = 0;
  float acc = 0.f;
#if defined(__AVX512F__)
  __m512 vacc = _mm512_setzero_ps();
  for (; j + 16 <= d; j += 16) {
    __m512 r = _mm512_cvtph_ps(
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(row + j)));
    vacc = _mm512_fmadd_ps(_mm512_loadu_ps(q + j), r, vacc);
  }
  acc = _mm512_reduce_add_ps(vacc);
#elif defined(__F16C__) && defined(__AVX__)
  __m256 vacc = _mm256_setzero_ps();
  for (; j + 8 <= d; j += 8) {
    __m256 r = _mm256_cvtph_ps(
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(row + j)));
#if defined(__FMA__)
    vacc = _mm256_fmadd_ps(_mm256_loadu_ps(q + j), r, vacc);
#else
    vacc = _mm256_add_ps(vacc, _mm256_mul_ps(_mm256_loadu_ps(q + j), r));
#endif
  }
  __m128 lo = _mm256_castps256_ps128(vacc);
  __m128 hi = _mm256_extractf128_ps(vacc, 1);
  __m128 s4 = _mm_add_ps(lo, hi);
  s4 = _mm_hadd_ps(s4, s4);
  s4 = _mm_hadd_ps(s4, s4);
  acc = _mm_cvtss_f32(s4);
#endif
  for (; j < d; ++j) acc += q[j] * half_to_float(row[j]);
  return acc;
}

// f32 . i8-row dot, same reasoning as above: the scalar int8->float convert
// costs ~1.3 us for a 768-d row, 3x the gather it decorates. AVX512 widens
// 16 int8 -> f32 per step (sign-extend + convert + fma).
inline float dot_f32_i8row(const float* q, const int8_t* row, int d) {
  int j = 0;
  float acc = 0.f;
#if defined(__AVX512F__)
  __m512 vacc = _mm512_setzero_ps();
  for (; j + 16 <= d; j += 16) {
    __m512i w = _mm512_cvtepi8_epi32(
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(row + j)));
    vacc = _mm512_fmadd_ps(_mm512_loadu_ps(q + j), _mm512_cvtepi32_ps(w),
                           vacc);
  }
  acc = _mm512_reduce_add_ps(vacc);
#endif
#pragma GCC ivdep
  for (; j < d; ++j) acc += q[j] * (float)row[j];
  return acc;
}

// Shared shortlist re-score driver: scores[b*s] computed in parallel over
// the flattened (query, slot) range, then per-query top-k. ScoreFn maps
// (qi, row_id) -> float.
template <typename ScoreFn, typename PrefetchFn>
void rescore_topk(int b, int s, int k, int nthreads, const int32_t* ids,
                  int64_t row_bytes, ScoreFn score, PrefetchFn prefetch,
                  float* out_s, int32_t* out_i) {
  nthreads = clamp_threads(nthreads);
  std::vector<float> scores((size_t)b * s);
  int64_t total = (int64_t)b * s;

  // Page-ordered gather: score rows in ascending store-page order so the
  // b*s random accesses over a multi-GB store become one near-sequential
  // page sweep — every row of a 2 MB region is visited while its TLB
  // entry and DRAM rows are hot. Counting-sort by page is O(total +
  // npages), microseconds next to the gather it reorders. Scores land at
  // scores[t] either way, so ordering is invisible to the top-k below.
  int32_t max_id = -1;
  for (int64_t t = 0; t < total; ++t) {
    int32_t id = ids[t];
    if (id < 0)
      scores[t] = -3.0e38f;
    else if (id > max_id)
      max_id = id;
  }
  if (max_id >= 0) {
    const int64_t page_rows_shift = 21;  // 2 MB regions
    int64_t npages =
        (((int64_t)max_id + 1) * row_bytes >> page_rows_shift) + 2;
    std::vector<int64_t> bucket(npages + 1, 0);
    auto page_of = [&](int32_t id) {
      return ((int64_t)id * row_bytes) >> page_rows_shift;
    };
    for (int64_t t = 0; t < total; ++t)
      if (ids[t] >= 0) ++bucket[page_of(ids[t]) + 1];
    for (int64_t p = 0; p < npages; ++p) bucket[p + 1] += bucket[p];
    std::vector<int64_t> order(bucket[npages]);
    for (int64_t t = 0; t < total; ++t)
      if (ids[t] >= 0) order[bucket[page_of(ids[t])]++] = t;

    int64_t n_ord = (int64_t)order.size();
    std::atomic<int64_t> next(0);
    const int64_t grain = 256;
    auto worker = [&]() {
      for (;;) {
        int64_t lo = next.fetch_add(grain);
        if (lo >= n_ord) return;
        int64_t hi = std::min(lo + grain, n_ord);
        // still software-prefetch ahead: the sweep jumps rows WITHIN a
        // page, and the row-start miss remains the critical path
        const int64_t PF = 6;
        for (int64_t o = lo; o < hi; ++o) {
          if (o + PF < hi) prefetch(ids[order[o + PF]]);
          int64_t t = order[o];
          scores[t] = score((int)(t / s), ids[t]);
        }
      }
    };
    std::vector<std::thread> ts;
    for (int t = 1; t < nthreads; ++t) ts.emplace_back(worker);
    worker();
    for (auto& th : ts) th.join();
  }

  std::vector<KHeap> heaps(b, KHeap(k));
  for (int qi = 0; qi < b; ++qi)
    for (int j = 0; j < s; ++j)
      heaps[qi].push(scores[(size_t)qi * s + j], ids[(size_t)qi * s + j]);
  emit_sorted(heaps, b, k, out_s, out_i);
}

}  // namespace

extern "C" {

// Exact f32 flat scan. q [b,d], db [n,d] row-major. out_s/out_i [b,k].
void cs_scan_f32(const float* q, int b, const float* db, int64_t n, int d,
                 int k, int nthreads, float* out_s, int32_t* out_i) {
  nthreads = clamp_threads(nthreads);
  std::vector<std::vector<KHeap>> heaps(
      nthreads, std::vector<KHeap>(b, KHeap(k)));
  std::vector<std::thread> ts;
  int64_t per = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * per, hi = std::min(n, lo + per);
    ts.emplace_back([&, t, lo, hi]() {
      for (int64_t r = lo; r < hi; ++r) {
        const float* row = db + r * d;
        for (int qi = 0; qi < b; ++qi)
          heaps[t][qi].push(dot_f32(q + (int64_t)qi * d, row, d), (int32_t)r);
      }
    });
  }
  for (auto& th : ts) th.join();
  merge_heaps(heaps, b);
  emit_sorted(heaps[0], b, k, out_s, out_i);
}

// Int8 scan with per-row dequant scales (SQ8). q is pre-quantized int8
// (query scale is rank-preserving per query and applied by the caller).
void cs_scan_i8(const int8_t* q, int b, const int8_t* db, int64_t n, int d,
                const float* scales, int k, int nthreads, float* out_s,
                int32_t* out_i) {
  nthreads = clamp_threads(nthreads);
  std::vector<std::vector<KHeap>> heaps(
      nthreads, std::vector<KHeap>(b, KHeap(k)));
  std::vector<std::thread> ts;
  int64_t per = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * per, hi = std::min(n, lo + per);
    ts.emplace_back([&, t, lo, hi]() {
      for (int64_t r = lo; r < hi; ++r) {
        const int8_t* row = db + r * d;
        float sc = scales[r];
        for (int qi = 0; qi < b; ++qi)
          heaps[t][qi].push(sc * (float)dot_i8(q + (int64_t)qi * d, row, d),
                            (int32_t)r);
      }
    });
  }
  for (auto& th : ts) th.join();
  merge_heaps(heaps, b);
  emit_sorted(heaps[0], b, k, out_s, out_i);
}

// IVF-flat probe. centroids [nlist,d]; vectors stored list-major in `codes`
// [n,d] with `ids` [n] giving global row ids and `offsets` [nlist+1] the
// list boundaries. For each query: exact scan of centroids, take nprobe
// best lists, exact scan of their members. Parallelized over queries
// (matches faiss's per-query IVF parallelism for batch search).
void cs_scan_ivf_f32(const float* q, int b, const float* centroids,
                     int nlist, int d, const float* codes,
                     const int32_t* ids, const int64_t* offsets, int nprobe,
                     int k, int nthreads, float* out_s, int32_t* out_i) {
  nthreads = clamp_threads(nthreads);
  if (nprobe > nlist) nprobe = nlist;
  std::atomic<int> next{0};
  std::vector<std::thread> ts;
  for (int t = 0; t < nthreads; ++t) {
    ts.emplace_back([&]() {
      std::vector<Cand> cd(nlist);
      for (;;) {
        int qi = next.fetch_add(1);
        if (qi >= b) break;
        const float* qv = q + (int64_t)qi * d;
        for (int c = 0; c < nlist; ++c)
          cd[c] = {dot_f32(qv, centroids + (int64_t)c * d, d), c};
        std::partial_sort(
            cd.begin(), cd.begin() + nprobe, cd.end(),
            [](const Cand& a, const Cand& c) { return a.s > c.s; });
        KHeap h(k);
        for (int p = 0; p < nprobe; ++p) {
          int list = cd[p].id;
          for (int64_t r = offsets[list]; r < offsets[list + 1]; ++r)
            h.push(dot_f32(qv, codes + r * d, d), ids[r]);
        }
        std::sort(h.h.begin(), h.h.end(),
                  [](const Cand& a, const Cand& c) { return a.s > c.s; });
        for (int j = 0; j < k; ++j) {
          if (j < (int)h.h.size()) {
            out_s[qi * k + j] = h.h[j].s;
            out_i[qi * k + j] = h.h[j].id;
          } else {
            out_s[qi * k + j] = -3.0e38f;
            out_i[qi * k + j] = -1;
          }
        }
      }
    });
  }
  for (auto& th : ts) th.join();
}

int cs_hw_threads() { return (int)std::thread::hardware_concurrency(); }


// Exact host re-score of a device shortlist against an int8 store with one
// global scale (the >=30M refine-from-storage path, index/ivf_pq.py
// rescore_kind="host_int8"). q [b,d] f32; codes [n,d] i8; ids [b,s] i32
// (-1 = masked). out_s/out_i [b,k] sorted desc.
void cs_rescore_i8(const float* q, int b, const int8_t* codes, int64_t n,
                   int d, float scale, const int32_t* ids, int s, int k,
                   int nthreads, float* out_s, int32_t* out_i) {
  (void)n;
  rescore_topk(b, s, k, nthreads, ids, (int64_t)d,
               [&](int qi, int32_t id) {
                 return scale * dot_f32_i8row(q + (int64_t)qi * d,
                                              codes + (int64_t)id * d, d);
               },
               [&](int32_t id) {
                 const char* row = (const char*)(codes + (int64_t)id * d);
                 for (int off = 0; off < d; off += 64)
                   __builtin_prefetch(row + off, 0, 1);
               },
               out_s, out_i);
}

// Same against an f16 store (index/flat.py rescore_store="host").
void cs_rescore_f16(const float* q, int b, const uint16_t* store, int64_t n,
                    int d, const int32_t* ids, int s, int k, int nthreads,
                    float* out_s, int32_t* out_i) {
  (void)n;
  rescore_topk(b, s, k, nthreads, ids, (int64_t)2 * d,
               [&](int qi, int32_t id) {
                 return dot_f32_f16row(q + (int64_t)qi * d,
                                       store + (int64_t)id * d, d);
               },
               [&](int32_t id) {
                 const char* row = (const char*)(store + (int64_t)id * d);
                 for (int off = 0; off < 2 * d; off += 64)
                   __builtin_prefetch(row + off, 0, 1);
               },
               out_s, out_i);
}

// Ask the kernel to back [p, p+len) with 2 MB pages: MADV_HUGEPAGE flags
// the range, MADV_COLLAPSE (Linux 6.1+) collapses already-populated 4 KB
// pages synchronously. A 46 GB f16 refine store on 4 KB pages costs one
// TLB walk per random row gather; on 2 MB pages the page-ordered sweep
// above hits each TLB entry hundreds of times. Returns 0 on success,
// -1 where unsupported (harmless — the store still works on 4 KB pages).
int cs_madvise_hugepage(void* p, int64_t len) {
#if defined(__linux__)
  uintptr_t a = reinterpret_cast<uintptr_t>(p);
  uintptr_t lo = a & ~(uintptr_t)4095;
  uintptr_t hi = (a + (uintptr_t)len + 4095) & ~(uintptr_t)4095;
  int rc = madvise(reinterpret_cast<void*>(lo), hi - lo, MADV_HUGEPAGE);
#ifdef MADV_COLLAPSE
  if (rc == 0)
    madvise(reinterpret_cast<void*>(lo), hi - lo, MADV_COLLAPSE);
#endif
  return rc;
#else
  (void)p;
  (void)len;
  return -1;
#endif
}

}  // extern "C"
