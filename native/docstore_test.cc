// Native docstore test driver: build/open/lookup correctness + a
// multi-threaded concurrent-reader hammer. Run under ASAN and TSAN via
// `make sanitize` — the sanitizer coverage the reference never had
// (SURVEY.md section 5.2).
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
int ds_build(const char*, const int64_t*, const char* const*, const int32_t*,
             const char* const*, const int32_t*, int64_t);
void* ds_open(const char*, int);
void ds_close(void*);
int64_t ds_count(void*);
int ds_get(void*, int64_t, const char**, int32_t*, const char**, int32_t*);
int64_t ds_get_batch(void*, const int64_t*, int64_t, const char**, int32_t*,
                     const char**, int32_t*);
}

int main() {
  const char* path = "/tmp/ds_sanitize_test.ragdoc";
  const int64_t n = 5000;
  std::vector<std::string> titles, contents;
  std::vector<const char*> t_ptr, c_ptr;
  std::vector<int32_t> t_len, c_len;
  std::vector<int64_t> ids;
  for (int64_t i = 0; i < n; i++) {
    titles.push_back("title " + std::to_string(i));
    contents.push_back(std::string(50 + i % 100, 'a' + i % 26));
    ids.push_back(i * 7);  // sparse ids
  }
  for (int64_t i = 0; i < n; i++) {
    t_ptr.push_back(titles[i].c_str());
    c_ptr.push_back(contents[i].c_str());
    t_len.push_back((int32_t)titles[i].size());
    c_len.push_back((int32_t)contents[i].size());
  }
  assert(ds_build(path, ids.data(), t_ptr.data(), t_len.data(), c_ptr.data(),
                  c_len.data(), n) == 0);

  void* h = ds_open(path, 1);
  assert(h && ds_count(h) == n);

  // single-thread correctness incl. misses
  const char *t, *c;
  int32_t tl, cl;
  assert(ds_get(h, 7 * 1234, &t, &tl, &c, &cl) == 0);
  assert(std::string(t, tl) == "title 1234");
  assert(ds_get(h, 3, &t, &tl, &c, &cl) == -1);  // id not present

  // concurrent reader hammer (TSAN target: readers share the mmap freely)
  std::vector<std::thread> threads;
  for (int w = 0; w < 8; w++) {
    threads.emplace_back([h, w]() {
      const char *t, *c;
      int32_t tl, cl;
      int64_t found = 0;
      for (int64_t i = 0; i < 20000; i++) {
        int64_t id = ((i * 31 + w) % 6000) * 7;
        if (ds_get(h, id, &t, &tl, &c, &cl) == 0) found++;
      }
      assert(found > 0);
    });
  }
  for (auto& th : threads) th.join();

  // batch API
  std::vector<int64_t> q = {0, 7, 14, 999999999};
  std::vector<const char*> bt(q.size()), bc(q.size());
  std::vector<int32_t> btl(q.size()), bcl(q.size());
  assert(ds_get_batch(h, q.data(), (int64_t)q.size(), bt.data(), btl.data(),
                      bc.data(), bcl.data()) == 3);
  assert(btl[3] == -1);

  ds_close(h);
  std::remove(path);
  printf("docstore_test ok\n");
  return 0;
}
