// boxpack: mmap'd packed-record store reader (C++).
//
// The native-IO replacement for the reference's optional LMDB image database
// (reference src/datasets/base.py:174-217 reads encoded images from LMDB, a
// C library). Format (little-endian):
//
//   [0:8)   magic "BOXPACK1"
//   [8:16)  u64 record count
//   [16:24) u64 index offset
//   blobs...
//   index: per record { u64 offset, u64 size, u16 keylen, key bytes }
//
// The reader mmaps the file once and serves zero-copy pointers into the
// blob region; key lookup is a binary search over the (sorted) index.
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Record {
  uint64_t offset;
  uint64_t size;
  std::string key;
};

struct Pack {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t length = 0;
  std::vector<Record> records;  // sorted by key
};

uint64_t read_u64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

uint16_t read_u16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

}  // namespace

extern "C" {

void* bp_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 24) {
    ::close(fd);
    return nullptr;
  }
  void* mapped = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (mapped == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* pack = new Pack();
  pack->fd = fd;
  pack->data = static_cast<const uint8_t*>(mapped);
  pack->length = st.st_size;

  if (std::memcmp(pack->data, "BOXPACK1", 8) != 0) {
    munmap(mapped, st.st_size);
    ::close(fd);
    delete pack;
    return nullptr;
  }
  uint64_t count = read_u64(pack->data + 8);
  uint64_t index_offset = read_u64(pack->data + 16);
  const uint8_t* p = pack->data + index_offset;
  const uint8_t* end = pack->data + pack->length;
  pack->records.reserve(count);
  for (uint64_t i = 0; i < count; ++i) {
    if (p + 18 > end) break;
    Record r;
    r.offset = read_u64(p);
    r.size = read_u64(p + 8);
    uint16_t keylen = read_u16(p + 16);
    p += 18;
    if (p + keylen > end) break;
    r.key.assign(reinterpret_cast<const char*>(p), keylen);
    p += keylen;
    pack->records.push_back(std::move(r));
  }
  std::sort(pack->records.begin(), pack->records.end(),
            [](const Record& a, const Record& b) { return a.key < b.key; });
  return pack;
}

int64_t bp_count(void* handle) {
  return handle ? static_cast<Pack*>(handle)->records.size() : -1;
}

// Returns pointer to blob bytes (zero copy into the mmap), size via out
// param; nullptr when the key is missing.
const uint8_t* bp_get(void* handle, const char* key, uint64_t* size_out) {
  if (!handle) return nullptr;
  auto* pack = static_cast<Pack*>(handle);
  std::string k(key);
  auto it = std::lower_bound(
      pack->records.begin(), pack->records.end(), k,
      [](const Record& r, const std::string& key) { return r.key < key; });
  if (it == pack->records.end() || it->key != k) return nullptr;
  *size_out = it->size;
  return pack->data + it->offset;
}

// Key of record i (sorted order); returns length, copies up to cap bytes.
int64_t bp_key_at(void* handle, int64_t i, char* out, uint64_t cap) {
  if (!handle) return -1;
  auto* pack = static_cast<Pack*>(handle);
  if (i < 0 || static_cast<size_t>(i) >= pack->records.size()) return -1;
  const std::string& k = pack->records[i].key;
  uint64_t n = std::min<uint64_t>(k.size(), cap);
  std::memcpy(out, k.data(), n);
  return static_cast<int64_t>(k.size());
}

void bp_close(void* handle) {
  if (!handle) return;
  auto* pack = static_cast<Pack*>(handle);
  munmap(const_cast<uint8_t*>(pack->data), pack->length);
  ::close(pack->fd);
  delete pack;
}

}  // extern "C"
