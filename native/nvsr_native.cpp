// nvsr_native: fast binary array-bundle codec + file prefetcher.
//
// The TPU framework's out-of-core plane store (nvsr_tpu/planes_store.py,
// the reference's .par swap boundary at models.py:683-726) moves
// hundreds of MB of plane + optimizer-moment tensors per buffer redraw.
// This C library provides:
//   * an mmap-backed, header-indexed bundle format ("NVPS") with atomic
//     tmp+rename writes and a CRC32-protected header, replacing the
//     zip-framed npz path (which copies every blob through Python);
//   * a background prefetcher that warms the page cache for the next
//     buffer's files while the current step computes.
//
// C ABI only (consumed via ctypes; no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

namespace {

constexpr uint32_t kMagic = 0x4E565053;  // "NVPS"
constexpr uint32_t kVersion = 1;
constexpr int kMaxDims = 8;
constexpr int kMaxName = 64;

#pragma pack(push, 1)
struct FileHeader {
  uint32_t magic;
  uint32_t version;
  uint32_t n_arrays;
  uint32_t header_crc;  // crc32 over the ArrayInfo table
};

struct ArrayInfo {
  char name[kMaxName];
  int32_t dtype;  // numpy-ish code, interpreted by the python wrapper
  int32_t ndim;
  int64_t shape[kMaxDims];
  int64_t offset;  // from file start
  int64_t nbytes;
};
#pragma pack(pop)

struct OpenFile {
  int fd = -1;
  void* map = nullptr;
  size_t size = 0;
  std::vector<ArrayInfo> arrays;
};

int64_t align_up(int64_t v, int64_t a) { return (v + a - 1) / a * a; }

}  // namespace

extern "C" {

// Write a bundle atomically: <path>.tmp then rename(2) into place.
// shapes is flattened [n][kMaxDims]. Returns 0 on success, -errno style
// negative codes on failure.
int nvps_write(const char* path, int32_t n, const char** names,
               const int32_t* dtypes, const int32_t* ndims,
               const int64_t* shapes, const void** datas,
               const int64_t* nbytes) {
  if (n <= 0 || n > 4096) return -1;
  std::vector<ArrayInfo> infos(n);
  int64_t offset =
      align_up(sizeof(FileHeader) + sizeof(ArrayInfo) * (int64_t)n, 64);
  for (int i = 0; i < n; ++i) {
    ArrayInfo& a = infos[i];
    std::memset(&a, 0, sizeof(a));
    std::snprintf(a.name, kMaxName, "%s", names[i]);
    a.dtype = dtypes[i];
    a.ndim = ndims[i];
    for (int d = 0; d < ndims[i] && d < kMaxDims; ++d)
      a.shape[d] = shapes[i * kMaxDims + d];
    a.offset = offset;
    a.nbytes = nbytes[i];
    offset = align_up(offset + nbytes[i], 64);
  }
  FileHeader hdr{kMagic, kVersion, (uint32_t)n, 0};
  hdr.header_crc =
      crc32(0, reinterpret_cast<const Bytef*>(infos.data()),
            sizeof(ArrayInfo) * n);

  std::string tmp = std::string(path) + ".nvps_tmp";
  int fd = ::open(tmp.c_str(), O_CREAT | O_TRUNC | O_WRONLY, 0644);
  if (fd < 0) return -2;
  auto write_all = [&](const void* buf, int64_t len) -> bool {
    const char* p = static_cast<const char*>(buf);
    while (len > 0) {
      ssize_t w = ::write(fd, p, (size_t)len);
      if (w < 0) return false;
      p += w;
      len -= w;
    }
    return true;
  };
  bool ok = write_all(&hdr, sizeof(hdr)) &&
            write_all(infos.data(), sizeof(ArrayInfo) * (int64_t)n);
  int64_t pos = sizeof(FileHeader) + sizeof(ArrayInfo) * (int64_t)n;
  for (int i = 0; ok && i < n; ++i) {
    int64_t pad = infos[i].offset - pos;
    static const char zeros[64] = {0};
    if (pad > 0) ok = write_all(zeros, pad);
    if (ok) ok = write_all(datas[i], nbytes[i]);
    pos = infos[i].offset + nbytes[i];
  }
  if (ok) ok = (::fsync(fd) == 0);
  ::close(fd);
  if (!ok) {
    ::unlink(tmp.c_str());
    return -3;
  }
  if (::rename(tmp.c_str(), path) != 0) {
    ::unlink(tmp.c_str());
    return -4;
  }
  return 0;
}

// Open for reading; returns an opaque handle (>0) or 0 on failure.
int64_t nvps_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return 0;
  struct stat st;
  if (::fstat(fd, &st) != 0 || (size_t)st.st_size < sizeof(FileHeader)) {
    ::close(fd);
    return 0;
  }
  void* map = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return 0;
  }
  const FileHeader* hdr = static_cast<const FileHeader*>(map);
  if (hdr->magic != kMagic || hdr->version != kVersion) {
    ::munmap(map, st.st_size);
    ::close(fd);
    return 0;
  }
  uint32_t n = hdr->n_arrays;
  size_t table_bytes = sizeof(ArrayInfo) * (size_t)n;
  if (sizeof(FileHeader) + table_bytes > (size_t)st.st_size) {
    ::munmap(map, st.st_size);
    ::close(fd);
    return 0;
  }
  const ArrayInfo* infos = reinterpret_cast<const ArrayInfo*>(
      static_cast<const char*>(map) + sizeof(FileHeader));
  uint32_t crc = crc32(0, reinterpret_cast<const Bytef*>(infos), table_bytes);
  if (crc != hdr->header_crc) {
    ::munmap(map, st.st_size);
    ::close(fd);
    return 0;
  }
  auto* of = new OpenFile();
  of->fd = fd;
  of->map = map;
  of->size = st.st_size;
  of->arrays.assign(infos, infos + n);
  for (const auto& a : of->arrays) {
    if (a.offset < 0 || a.nbytes < 0 ||
        (size_t)(a.offset + a.nbytes) > of->size) {
      delete of;
      ::munmap(map, st.st_size);
      ::close(fd);
      return 0;
    }
  }
  return reinterpret_cast<int64_t>(of);
}

int32_t nvps_num_arrays(int64_t handle) {
  return (int32_t) reinterpret_cast<OpenFile*>(handle)->arrays.size();
}

// Fills name (>= kMaxName bytes), dtype, ndim, shape[kMaxDims], nbytes.
int nvps_get_info(int64_t handle, int32_t i, char* name, int32_t* dtype,
                  int32_t* ndim, int64_t* shape, int64_t* nbytes) {
  auto* of = reinterpret_cast<OpenFile*>(handle);
  if (i < 0 || (size_t)i >= of->arrays.size()) return -1;
  const ArrayInfo& a = of->arrays[i];
  std::memcpy(name, a.name, kMaxName);
  *dtype = a.dtype;
  *ndim = a.ndim;
  std::memcpy(shape, a.shape, sizeof(a.shape));
  *nbytes = a.nbytes;
  return 0;
}

// Copy array i into out (caller allocates nbytes).
int nvps_read(int64_t handle, int32_t i, void* out) {
  auto* of = reinterpret_cast<OpenFile*>(handle);
  if (i < 0 || (size_t)i >= of->arrays.size()) return -1;
  const ArrayInfo& a = of->arrays[i];
  std::memcpy(out, static_cast<const char*>(of->map) + a.offset,
              (size_t)a.nbytes);
  return 0;
}

void nvps_close(int64_t handle) {
  auto* of = reinterpret_cast<OpenFile*>(handle);
  ::munmap(of->map, of->size);
  ::close(of->fd);
  delete of;
}

// ---------------------------------------------------------------------------
// Background prefetcher: warm the page cache for upcoming files.
// ---------------------------------------------------------------------------

namespace {
struct Prefetch {
  std::vector<std::thread> threads;
  std::atomic<int> remaining{0};
};
}  // namespace

int64_t nvps_prefetch_start(const char** paths, int32_t n,
                            int32_t n_threads) {
  auto* pf = new Prefetch();
  pf->remaining = n;
  std::vector<std::string> files(paths, paths + n);
  auto shared = std::make_shared<std::vector<std::string>>(std::move(files));
  auto next = std::make_shared<std::atomic<int>>(0);
  int workers = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < workers; ++t) {
    pf->threads.emplace_back([pf, shared, next]() {
      std::vector<char> buf(1 << 20);
      for (;;) {
        int i = next->fetch_add(1);
        if (i >= (int)shared->size()) break;
        int fd = ::open((*shared)[i].c_str(), O_RDONLY);
        if (fd >= 0) {
#ifdef POSIX_FADV_WILLNEED
          struct stat st;
          if (::fstat(fd, &st) == 0)
            ::posix_fadvise(fd, 0, st.st_size, POSIX_FADV_WILLNEED);
#endif
          while (::read(fd, buf.data(), buf.size()) > 0) {
          }
          ::close(fd);
        }
        pf->remaining.fetch_sub(1);
      }
    });
  }
  return reinterpret_cast<int64_t>(pf);
}

int32_t nvps_prefetch_remaining(int64_t handle) {
  return reinterpret_cast<Prefetch*>(handle)->remaining.load();
}

void nvps_prefetch_join(int64_t handle) {
  auto* pf = reinterpret_cast<Prefetch*>(handle);
  for (auto& t : pf->threads) t.join();
  delete pf;
}

}  // extern "C"
