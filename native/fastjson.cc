// Fast JSON codec for the /retrieve hot path (the orjson/msgspec role).
//
// The reference leans on msgspec/orjson for its service wire
// (src/pipeline/utils/rpc_client.py:122-126, requirements: orjson, msgspec);
// neither is installable in this image, and the measured cost of stdlib
// json + pydantic on the JSON-parity /retrieve wire is 284 ms per batch-512
// request (PERF_NOTES "Serve-layer ceiling") — the entire 785 QPS cap.
//
// Contract (mirrors utils/fastjson.py): this is a STRICT parser for exactly
// the reference-parity retrieve-by-embedding request shape
//
//   {"items": [{"query": "", "embedding": [f64...], "k": int|null}, ...],
//    "rerank": bool, "k": int|null, "response_format": "json"|"b64"}
//
// plus generically-skipped unknown keys (pydantic ignores extras too).
// ANY deviation — non-empty query, missing embedding, embeddings_b64,
// string escapes in keys, NaN/Infinity literals, malformed JSON, dim
// mismatch — returns FJ_FALLBACK and the Python caller re-parses with
// stdlib json + pydantic, so observable behavior (including every 400) is
// identical to the slow path; the fast path only accelerates requests the
// slow path would accept with the same result.
//
// The encoder writes the id_only response shape
// {"results":[{"ids":[...],"scores":[...]},...]} with %.9g floats (f32
// round-trip exact — the same precision the b64 wire carries).

#include <cctype>
#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

constexpr int FJ_OK = 0;
constexpr int FJ_FALLBACK = 1;

struct Parser {
  const char* p;
  const char* end;

  void ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }
  bool eof() const { return p >= end; }
  bool lit(const char* s) {
    size_t n = std::strlen(s);
    if (static_cast<size_t>(end - p) < n || std::memcmp(p, s, n) != 0)
      return false;
    p += n;
    return true;
  }
};

// Scan a JSON string. If `out`/`cap` given, copies the raw (unescaped
// content must be escape-free ASCII to qualify; any backslash => false so
// the caller falls back — keys and the schema's enum values never need
// escapes). Returns true and positions after the closing quote.
bool scan_string(Parser& ps, char* out, size_t cap, size_t* out_len,
                 bool* had_escape) {
  if (ps.eof() || *ps.p != '"') return false;
  ++ps.p;
  size_t n = 0;
  *had_escape = false;
  while (!ps.eof()) {
    unsigned char c = static_cast<unsigned char>(*ps.p);
    if (c == '"') {
      ++ps.p;
      if (out_len) *out_len = n;
      return true;
    }
    if (c == '\\') {
      *had_escape = true;
      ++ps.p;
      if (ps.eof()) return false;
      char e = *ps.p;
      if (e == 'u') {
        for (int i = 0; i < 4; ++i) {
          ++ps.p;
          if (ps.eof() || !std::isxdigit(static_cast<unsigned char>(*ps.p)))
            return false;
        }
      } else if (!std::strchr("\"\\/bfnrt", e)) {
        return false;
      }
      ++ps.p;
      n = cap + 1;  // escaped strings never match fixed keys
      continue;
    }
    if (c < 0x20) return false;  // control chars must be escaped
    if (out && n < cap) out[n] = static_cast<char>(c);
    ++n;
    ++ps.p;
  }
  return false;
}

// Strict JSON number: -?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?
// (strtod alone would also accept inf/nan/hex, which stdlib json rejects
// as numbers — those funnel to the fallback instead).
bool scan_number(Parser& ps, double* out) {
  const char* start = ps.p;
  if (!ps.eof() && *ps.p == '-') ++ps.p;
  if (ps.eof() || !std::isdigit(static_cast<unsigned char>(*ps.p)))
    return false;
  if (*ps.p == '0') {
    ++ps.p;
  } else {
    while (!ps.eof() && std::isdigit(static_cast<unsigned char>(*ps.p)))
      ++ps.p;
  }
  if (!ps.eof() && *ps.p == '.') {
    ++ps.p;
    if (ps.eof() || !std::isdigit(static_cast<unsigned char>(*ps.p)))
      return false;
    while (!ps.eof() && std::isdigit(static_cast<unsigned char>(*ps.p)))
      ++ps.p;
  }
  if (!ps.eof() && (*ps.p == 'e' || *ps.p == 'E')) {
    ++ps.p;
    if (!ps.eof() && (*ps.p == '+' || *ps.p == '-')) ++ps.p;
    if (ps.eof() || !std::isdigit(static_cast<unsigned char>(*ps.p)))
      return false;
    while (!ps.eof() && std::isdigit(static_cast<unsigned char>(*ps.p)))
      ++ps.p;
  }
  // convert the validated span; from_chars is correctly rounded and ~3x
  // strtod (no locale machinery). The strict scan above already rejected
  // inf/nan/hex forms from_chars would otherwise accept.
#if defined(__cpp_lib_to_chars)
  auto res = std::from_chars(start, ps.p, *out);
  return res.ec == std::errc() && res.ptr == ps.p;
#else
  // caller guarantees NUL-termination (Python bytes always are), so strtod
  // cannot run past end-of-buffer
  char* parse_end = nullptr;
  *out = std::strtod(start, &parse_end);
  return parse_end == ps.p;
#endif
}

bool skip_value(Parser& ps, int depth);

bool skip_members(Parser& ps, int depth, char close) {
  ps.ws();
  if (!ps.eof() && *ps.p == close) {
    ++ps.p;
    return true;
  }
  for (;;) {
    ps.ws();
    if (close == '}') {
      bool esc;
      if (!scan_string(ps, nullptr, 0, nullptr, &esc)) return false;
      ps.ws();
      if (ps.eof() || *ps.p != ':') return false;
      ++ps.p;
    }
    if (!skip_value(ps, depth)) return false;
    ps.ws();
    if (ps.eof()) return false;
    if (*ps.p == ',') {
      ++ps.p;
      continue;
    }
    if (*ps.p == close) {
      ++ps.p;
      return true;
    }
    return false;
  }
}

bool skip_value(Parser& ps, int depth) {
  if (depth > 64) return false;
  ps.ws();
  if (ps.eof()) return false;
  char c = *ps.p;
  if (c == '"') {
    bool esc;
    return scan_string(ps, nullptr, 0, nullptr, &esc);
  }
  if (c == '{') {
    ++ps.p;
    return skip_members(ps, depth + 1, '}');
  }
  if (c == '[') {
    ++ps.p;
    return skip_members(ps, depth + 1, ']');
  }
  if (c == 't') return ps.lit("true");
  if (c == 'f') return ps.lit("false");
  if (c == 'n') return ps.lit("null");
  double d;
  return scan_number(ps, &d);
}

// Parse "[f, f, ...]" into out[0..dim); requires exactly `dim` values.
bool scan_embedding(Parser& ps, float* out, int64_t dim) {
  ps.ws();
  if (ps.eof() || *ps.p != '[') return false;
  ++ps.p;
  for (int64_t i = 0; i < dim; ++i) {
    ps.ws();
    double d;
    if (!scan_number(ps, &d)) return false;
    out[i] = static_cast<float>(d);
    ps.ws();
    if (ps.eof()) return false;
    if (i + 1 < dim) {
      if (*ps.p != ',') return false;
      ++ps.p;
    }
  }
  ps.ws();
  if (ps.eof() || *ps.p != ']') return false;
  ++ps.p;
  return true;
}

bool key_is(const char* buf, size_t len, const char* name) {
  return len == std::strlen(name) && std::memcmp(buf, name, len) == 0;
}

}  // namespace

extern "C" {

// Returns FJ_OK with:
//   emb_out    [max_items * dim] f32, row i = items[i].embedding
//   k_out      [max_items] i32, per-item k (-1 = absent/null)
//   n_out      number of items parsed
//   top_out[0] rerank (0/1; default 0)
//   top_out[1] top-level k (-1 = absent/null)
//   top_out[2] response_format (0 = json, 1 = b64; default 0)
// or FJ_FALLBACK for anything outside the strict shape (caller re-parses
// with stdlib). `body` MUST be NUL-terminated at body+len.
int fj_parse_retrieve(const char* body, int64_t len, int64_t dim,
                      float* emb_out, int32_t* k_out, int64_t max_items,
                      int64_t* n_out, int32_t* top_out) {
  if (dim <= 0) return FJ_FALLBACK;
  Parser ps{body, body + len};
  top_out[0] = 0;
  top_out[1] = -1;
  top_out[2] = 0;
  *n_out = -1;

  ps.ws();
  if (ps.eof() || *ps.p != '{') return FJ_FALLBACK;
  ++ps.p;
  ps.ws();
  bool saw_items = false;
  if (!ps.eof() && *ps.p == '}') {
    ++ps.p;
  } else {
    for (;;) {
      ps.ws();
      char key[32];
      size_t klen;
      bool esc;
      if (!scan_string(ps, key, sizeof key, &klen, &esc)) return FJ_FALLBACK;
      ps.ws();
      if (ps.eof() || *ps.p != ':') return FJ_FALLBACK;
      ++ps.p;
      ps.ws();
      if (esc || klen >= sizeof key) {
        if (!skip_value(ps, 0)) return FJ_FALLBACK;
      } else if (key_is(key, klen, "embeddings_b64")) {
        return FJ_FALLBACK;  // binary wire: let the b64 handler run
      } else if (key_is(key, klen, "rerank")) {
        if (ps.lit("true")) top_out[0] = 1;
        else if (ps.lit("false")) top_out[0] = 0;
        else return FJ_FALLBACK;
      } else if (key_is(key, klen, "k")) {
        if (ps.lit("null")) {
          top_out[1] = -1;
        } else {
          double d;
          if (!scan_number(ps, &d)) return FJ_FALLBACK;
          int32_t ki = static_cast<int32_t>(d);
          if (static_cast<double>(ki) != d || ki < 0) return FJ_FALLBACK;
          top_out[1] = ki;
        }
      } else if (key_is(key, klen, "response_format")) {
        char v[8];
        size_t vlen;
        if (!scan_string(ps, v, sizeof v, &vlen, &esc) || esc)
          return FJ_FALLBACK;
        if (key_is(v, vlen, "json")) top_out[2] = 0;
        else if (key_is(v, vlen, "b64")) top_out[2] = 1;
        else return FJ_FALLBACK;  // invalid value: slow path raises the 400
      } else if (key_is(key, klen, "items")) {
        if (saw_items) return FJ_FALLBACK;  // duplicate: stdlib keeps last
        saw_items = true;
        if (ps.eof() || *ps.p != '[') return FJ_FALLBACK;
        ++ps.p;
        ps.ws();
        int64_t n = 0;
        if (!ps.eof() && *ps.p == ']') {
          ++ps.p;
        } else {
          for (;;) {
            if (n >= max_items) return FJ_FALLBACK;
            ps.ws();
            if (ps.eof() || *ps.p != '{') return FJ_FALLBACK;
            ++ps.p;
            ps.ws();
            bool have_emb = false;
            k_out[n] = -1;
            if (!ps.eof() && *ps.p == '}') {
              ++ps.p;
            } else {
              for (;;) {
                ps.ws();
                char ik[32];
                size_t iklen;
                if (!scan_string(ps, ik, sizeof ik, &iklen, &esc))
                  return FJ_FALLBACK;
                ps.ws();
                if (ps.eof() || *ps.p != ':') return FJ_FALLBACK;
                ++ps.p;
                ps.ws();
                if (esc || iklen >= sizeof ik) {
                  if (!skip_value(ps, 0)) return FJ_FALLBACK;
                } else if (key_is(ik, iklen, "query")) {
                  // only the empty query qualifies (non-empty means the
                  // executor must embed text — slow path's job)
                  char q[2];
                  size_t qlen;
                  if (!scan_string(ps, q, sizeof q, &qlen, &esc) || esc ||
                      qlen != 0)
                    return FJ_FALLBACK;
                } else if (key_is(ik, iklen, "embedding")) {
                  if (have_emb) return FJ_FALLBACK;
                  if (!scan_embedding(ps, emb_out + n * dim, dim))
                    return FJ_FALLBACK;
                  have_emb = true;
                } else if (key_is(ik, iklen, "k")) {
                  if (ps.lit("null")) {
                    k_out[n] = -1;
                  } else {
                    double d;
                    if (!scan_number(ps, &d)) return FJ_FALLBACK;
                    int32_t ki = static_cast<int32_t>(d);
                    if (static_cast<double>(ki) != d || ki < 0)
                      return FJ_FALLBACK;
                    k_out[n] = ki;
                  }
                } else {
                  if (!skip_value(ps, 0)) return FJ_FALLBACK;
                }
                ps.ws();
                if (ps.eof()) return FJ_FALLBACK;
                if (*ps.p == ',') {
                  ++ps.p;
                  continue;
                }
                if (*ps.p == '}') {
                  ++ps.p;
                  break;
                }
                return FJ_FALLBACK;
              }
            }
            if (!have_emb) return FJ_FALLBACK;
            ++n;
            ps.ws();
            if (ps.eof()) return FJ_FALLBACK;
            if (*ps.p == ',') {
              ++ps.p;
              continue;
            }
            if (*ps.p == ']') {
              ++ps.p;
              break;
            }
            return FJ_FALLBACK;
          }
        }
        *n_out = n;
      } else {
        if (!skip_value(ps, 0)) return FJ_FALLBACK;
      }
      ps.ws();
      if (ps.eof()) return FJ_FALLBACK;
      if (*ps.p == ',') {
        ++ps.p;
        continue;
      }
      if (*ps.p == '}') {
        ++ps.p;
        break;
      }
      return FJ_FALLBACK;
    }
  }
  ps.ws();
  if (!ps.eof()) return FJ_FALLBACK;  // trailing garbage: stdlib rejects
  if (!saw_items || *n_out <= 0) return FJ_FALLBACK;  // schema requires items
  return FJ_OK;
}

// Encode {"results":[{"ids":[...],"scores":[...]},...]} for ragged rows:
// row i spans [offsets[i], offsets[i+1]) in ids/scores. Floats print %.9g
// (f32 round-trip exact). Returns bytes written, or -1 if cap is too small.
int64_t fj_encode_results(const int64_t* ids, const float* scores,
                          const int64_t* offsets, int64_t n_rows, char* out,
                          int64_t cap) {
  char* w = out;
  char* lim = out + cap;
  auto put = [&](const char* s, int64_t n) -> bool {
    if (lim - w < n) return false;
    std::memcpy(w, s, n);
    w += n;
    return true;
  };
#define PUT_LIT(s) \
  if (!put(s, sizeof(s) - 1)) return -1
  PUT_LIT("{\"results\":[");
  char buf[32];
  for (int64_t i = 0; i < n_rows; ++i) {
    if (i && !put(",", 1)) return -1;
    PUT_LIT("{\"ids\":[");
    for (int64_t j = offsets[i]; j < offsets[i + 1]; ++j) {
      if (j > offsets[i] && !put(",", 1)) return -1;
      int n = std::snprintf(buf, sizeof buf, "%lld",
                            static_cast<long long>(ids[j]));
      if (!put(buf, n)) return -1;
    }
    PUT_LIT("],\"scores\":[");
    for (int64_t j = offsets[i]; j < offsets[i + 1]; ++j) {
      if (j > offsets[i] && !put(",", 1)) return -1;
      int n = std::snprintf(buf, sizeof buf, "%.9g",
                            static_cast<double>(scores[j]));
      // %.9g can emit bare "1e+20" / "inf"-free forms only; JSON needs a
      // number — f32 data from the index is always finite, but guard:
      if (n >= 3 && (buf[0] == 'i' || buf[1] == 'i' || buf[0] == 'n'))
        return -1;
      if (!put(buf, n)) return -1;
    }
    PUT_LIT("]}");
  }
  PUT_LIT("]}");
#undef PUT_LIT
  return w - out;
}

}  // extern "C"
