// Native document store: mmap'd arena + open-addressing hash index.
//
// TPU-native replacement for the reference's SQLite document store
// (reference src/pipeline/components/document_store.py:132-163 — thread-local
// sqlite3 connections, temp-table bulk id fetch, optional full copy into RAM).
// Design: one immutable file, zero-copy reads straight out of the page cache
// (the mmap analog of the reference's FAISS IO_FLAG_MMAP trick), lock-free
// concurrent readers, O(1) id lookup via linear probing. Exposed to Python
// over a C ABI (ctypes); no Python objects cross the boundary on the read
// path until the final bytes->str.
//
// File layout (little-endian):
//   [0]  u64 magic "RAGDOC01"
//   [8]  u64 doc count
//   [16] u64 hash slot count (power of two)
//   [24] u64 arena offset
//   [32] slots: {u64 id (-1 = empty), u64 offset, u32 title_len, u32 content_len}
//   [arena_offset] arena: concatenated title/content bytes per doc
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kMagic = 0x3130434F44474152ULL;  // "RAGDOC01"
constexpr uint64_t kEmpty = ~0ULL;

struct Slot {
  uint64_t id;
  uint64_t offset;
  uint32_t title_len;
  uint32_t content_len;
};

struct Header {
  uint64_t magic;
  uint64_t count;
  uint64_t nslots;
  uint64_t arena_offset;
};

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  const Header* header = nullptr;
  const Slot* slots = nullptr;
  const uint8_t* arena = nullptr;
};

inline uint64_t hash_id(uint64_t x) {
  // splitmix64 finalizer — good avalanche for sequential ids
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

uint64_t next_pow2(uint64_t v) {
  uint64_t p = 1;
  while (p < v) p <<= 1;
  return p;
}

}  // namespace

extern "C" {

// Build a store file from parallel arrays. Returns 0 on success.
int ds_build(const char* path, const int64_t* ids, const char* const* titles,
             const int32_t* title_lens, const char* const* contents,
             const int32_t* content_lens, int64_t n) {
  uint64_t nslots = next_pow2((uint64_t)(n * 2 + 1));
  Header h{kMagic, (uint64_t)n, nslots, 0};
  h.arena_offset = sizeof(Header) + nslots * sizeof(Slot);

  FILE* f = fopen(path, "wb");
  if (!f) return -1;

  Slot* slots = new Slot[nslots];
  for (uint64_t i = 0; i < nslots; i++) slots[i].id = kEmpty;

  uint64_t offset = 0;
  for (int64_t i = 0; i < n; i++) {
    uint64_t slot = hash_id((uint64_t)ids[i]) & (nslots - 1);
    while (slots[slot].id != kEmpty) {
      if (slots[slot].id == (uint64_t)ids[i]) {  // duplicate id
        delete[] slots;
        fclose(f);
        return -2;
      }
      slot = (slot + 1) & (nslots - 1);
    }
    slots[slot] = {(uint64_t)ids[i], offset, (uint32_t)title_lens[i],
                   (uint32_t)content_lens[i]};
    offset += (uint64_t)title_lens[i] + (uint64_t)content_lens[i];
  }

  if (fwrite(&h, sizeof(h), 1, f) != 1 ||
      fwrite(slots, sizeof(Slot), nslots, f) != nslots) {
    delete[] slots;
    fclose(f);
    return -3;
  }
  delete[] slots;
  for (int64_t i = 0; i < n; i++) {
    if ((title_lens[i] &&
         fwrite(titles[i], 1, (size_t)title_lens[i], f) != (size_t)title_lens[i]) ||
        (content_lens[i] && fwrite(contents[i], 1, (size_t)content_lens[i], f) !=
                                (size_t)content_lens[i])) {
      fclose(f);
      return -3;
    }
  }
  fclose(f);
  return 0;
}

void* ds_open(const char* path, int populate) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || (size_t)st.st_size < sizeof(Header)) {
    close(fd);
    return nullptr;
  }
  int flags = MAP_SHARED;
#ifdef MAP_POPULATE
  // populate = the reference's "clone DB into RAM" mode
  // (document_store.py:165-193): pre-fault every page at open.
  if (populate) flags |= MAP_POPULATE;
#endif
  void* base = mmap(nullptr, (size_t)st.st_size, PROT_READ, flags, fd, 0);
  if (base == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  auto* s = new Store();
  s->fd = fd;
  s->base = (const uint8_t*)base;
  s->size = (size_t)st.st_size;
  s->header = (const Header*)s->base;
  // reject truncated/corrupt files up front: every slot and the arena
  // offset must lie inside the mapping, and nslots must be a power of two
  // (the probe masks assume it) — otherwise ds_get would chase pointers
  // past the mmap and SIGSEGV instead of failing the open.
  const Header& h = *s->header;
  bool ok = h.magic == kMagic && h.nslots > 0 &&
            (h.nslots & (h.nslots - 1)) == 0 &&
            h.nslots <= (s->size - sizeof(Header)) / sizeof(Slot) &&
            h.arena_offset >= sizeof(Header) + h.nslots * sizeof(Slot) &&
            h.arena_offset <= s->size;
  if (!ok) {
    munmap(base, s->size);
    close(fd);
    delete s;
    return nullptr;
  }
  s->slots = (const Slot*)(s->base + sizeof(Header));
  s->arena = s->base + s->header->arena_offset;
  return s;
}

void ds_close(void* handle) {
  auto* s = (Store*)handle;
  if (!s) return;
  munmap((void*)s->base, s->size);
  close(s->fd);
  delete s;
}

int64_t ds_count(void* handle) {
  return (int64_t)((Store*)handle)->header->count;
}

// Lookup one doc. Returns 0 on hit, -1 on miss. Pointers reference the mmap
// region directly (valid until ds_close).
int ds_get(void* handle, int64_t id, const char** title, int32_t* title_len,
           const char** content, int32_t* content_len) {
  auto* s = (Store*)handle;
  uint64_t nslots = s->header->nslots;
  uint64_t slot = hash_id((uint64_t)id) & (nslots - 1);
  for (uint64_t probes = 0; probes < nslots; probes++) {
    const Slot& sl = s->slots[slot];
    if (sl.id == kEmpty) return -1;
    if (sl.id == (uint64_t)id) {
      // bound the payload against the arena so a corrupt slot can't hand
      // out pointers past the mapping
      uint64_t arena_size = s->size - s->header->arena_offset;
      uint64_t need = sl.offset + (uint64_t)sl.title_len + sl.content_len;
      if (sl.offset > arena_size || need > arena_size) return -1;
      *title = (const char*)(s->arena + sl.offset);
      *title_len = (int32_t)sl.title_len;
      *content = (const char*)(s->arena + sl.offset + sl.title_len);
      *content_len = (int32_t)sl.content_len;
      return 0;
    }
    slot = (slot + 1) & (nslots - 1);
  }
  return -1;
}

// Batch lookup: fills parallel output arrays; missing ids get lens = -1.
// Returns the number found.
int64_t ds_get_batch(void* handle, const int64_t* ids, int64_t n,
                     const char** titles, int32_t* title_lens,
                     const char** contents, int32_t* content_lens) {
  int64_t found = 0;
  for (int64_t i = 0; i < n; i++) {
    if (ds_get(handle, ids[i], &titles[i], &title_lens[i], &contents[i],
               &content_lens[i]) == 0) {
      found++;
    } else {
      titles[i] = nullptr;
      contents[i] = nullptr;
      title_lens[i] = -1;
      content_lens[i] = -1;
    }
  }
  return found;
}

}  // extern "C"
