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

// Shared shortlist re-score driver: scores[b*s] computed in parallel over
// the flattened (query, slot) range, then per-query top-k. ScoreFn maps
// (qi, row_id) -> float.
template <typename ScoreFn, typename PrefetchFn>
void rescore_topk(int b, int s, int k, int nthreads, const int32_t* ids,
                  ScoreFn score, PrefetchFn prefetch, float* out_s,
                  int32_t* out_i) {
  nthreads = clamp_threads(nthreads);
  std::vector<float> scores((size_t)b * s);
  int64_t total = (int64_t)b * s;
  std::atomic<int64_t> next(0);
  const int64_t grain = 256;
  auto worker = [&]() {
    for (;;) {
      int64_t lo = next.fetch_add(grain);
      if (lo >= total) return;
      int64_t hi = std::min(lo + grain, total);
      // software-prefetch a few tasks ahead: the gather is random rows
      // from a multi-GB store, so the row-start miss (+TLB walk)
      // dominates; overlap it with the current row's dot
      const int64_t PF = 6;
      for (int64_t t = lo; t < hi; ++t) {
        if (t + PF < hi && ids[t + PF] >= 0) prefetch(ids[t + PF]);
        int qi = (int)(t / s);
        int32_t id = ids[t];
        scores[t] = (id < 0) ? -3.0e38f : score(qi, id);
      }
    }
  };
  std::vector<std::thread> ts;
  for (int t = 1; t < nthreads; ++t) ts.emplace_back(worker);
  worker();
  for (auto& th : ts) th.join();

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
  rescore_topk(b, s, k, nthreads, ids,
               [&](int qi, int32_t id) {
                 const int8_t* row = codes + (int64_t)id * d;
                 const float* qr = q + (int64_t)qi * d;
                 float acc = 0.f;
#pragma GCC ivdep
                 for (int j = 0; j < d; ++j) acc += qr[j] * (float)row[j];
                 return acc * scale;
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
  rescore_topk(b, s, k, nthreads, ids,
               [&](int qi, int32_t id) {
                 const uint16_t* row = store + (int64_t)id * d;
                 const float* qr = q + (int64_t)qi * d;
                 float acc = 0.f;
                 for (int j = 0; j < d; ++j)
                   acc += qr[j] * half_to_float(row[j]);
                 return acc;
               },
               [&](int32_t id) {
                 const char* row = (const char*)(store + (int64_t)id * d);
                 for (int off = 0; off < 2 * d; off += 64)
                   __builtin_prefetch(row + off, 0, 1);
               },
               out_s, out_i);
}

}  // extern "C"
