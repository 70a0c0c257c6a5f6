// ASAN/fuzz driver for the fastjson codec (built+run by `make sanitize`).
//
// The parser faces untrusted HTTP bodies, so memory safety is exercised the
// blunt way: a valid request body is truncated at EVERY byte offset and
// mutated at every position, and each variant must parse or fall back
// without touching memory out of bounds (ASAN enforces). The encoder is
// driven over ragged/empty/large-id rows into an exact-size buffer and a
// deliberately-short buffer (must return -1, never overflow).

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" int fj_parse_retrieve(const char* body, int64_t len, int64_t dim,
                                 float* emb_out, int32_t* k_out,
                                 int64_t max_items, int64_t* n_out,
                                 int32_t* top_out);
extern "C" int64_t fj_encode_results(const int64_t* ids, const float* scores,
                                     const int64_t* offsets, int64_t n_rows,
                                     char* out, int64_t cap);

namespace {

int parse(const std::string& s, int dim = 4) {
  // heap copy sized exactly (+NUL, matching the Python bytes contract) so
  // ASAN catches any scan past the terminator
  std::vector<char> buf(s.begin(), s.end());
  buf.push_back('\0');
  float emb[8 * 4];
  int32_t ks[8];
  int64_t n = -1;
  int32_t top[3];
  return fj_parse_retrieve(buf.data(), (int64_t)s.size(), dim, emb, ks, 8,
                           &n, top);
}

}  // namespace

int main() {
  const std::string valid =
      "{\"items\": [{\"query\": \"\", \"embedding\": [1.5, -2e3, 0.25, 3], "
      "\"k\": 7}, {\"embedding\": [4, 5, 6, 7]}], \"rerank\": true, "
      "\"k\": 10, \"response_format\": \"b64\", \"extra\": {\"a\": [null]}}";
  assert(parse(valid) == 0);

  // truncation sweep: every prefix must terminate cleanly
  for (size_t i = 0; i < valid.size(); ++i) {
    parse(valid.substr(0, i));
  }
  // suffix sweep too (leading garbage)
  for (size_t i = 1; i < valid.size(); ++i) {
    parse(valid.substr(i));
  }
  // single-byte mutation sweep over the printable range edges
  const char muts[] = {'\0', '"', '\\', '{', '}', '[', ']', ',', ':',
                       '-', '9', 'e', ' ', '\n', (char)0xFF};
  for (size_t i = 0; i < valid.size(); ++i) {
    for (char m : muts) {
      std::string v = valid;
      v[i] = m;
      parse(v);
    }
  }
  // pathological nesting (must hit the depth cap, not the stack guard)
  std::string deep = "{\"x\": ";
  for (int i = 0; i < 2000; ++i) deep += '[';
  assert(parse(deep) == 1);
  // item overflow vs max_items
  std::string many = "{\"items\": [";
  for (int i = 0; i < 32; ++i) {
    if (i) many += ',';
    many += "{\"embedding\": [1, 2, 3, 4]}";
  }
  many += "]}";
  assert(parse(many) == 1);  // max_items=8 in the helper

  // encoder: ragged rows incl. empty, exact-cap, short-cap
  int64_t ids[] = {1, 2, 9007199254740992LL};  // 2^53: max exact double id
  float scores[] = {0.5f, -1.25e-30f, 3.0e30f};
  int64_t offs[] = {0, 2, 2, 3};
  char out[256];
  int64_t n = fj_encode_results(ids, scores, offs, 3, out, sizeof out);
  assert(n > 0);
  for (int64_t cap = 0; cap < n; ++cap) {
    std::vector<char> small((size_t)cap + 1);
    assert(fj_encode_results(ids, scores, offs, 3, small.data(), cap) == -1);
  }
  std::printf("fastjson_test: OK (%lld bytes encoded)\n",
              (long long)n);
  return 0;
}
