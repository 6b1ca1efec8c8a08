// Native batch loader: threaded, double-buffered row-batch streaming from
// .npy files.
//
// Role: the reference leans on torch's C++ DataLoader machinery for its
// streaming paths (reference: torchdr/distance/faiss.py:477-867 and
// torchdr/spectral_embedding/incremental_pca.py:484-559 consume
// DataLoaders). This is the torchdr-tpu equivalent: a small C++ runtime
// that mmaps a float32 .npy matrix and serves row batches through a
// background prefetch thread, so host IO overlaps with TPU compute. Python
// binds via ctypes (no pybind11 in this image).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct NpyInfo {
  int64_t rows = 0;
  int64_t cols = 0;
  int64_t data_offset = 0;
  bool ok = false;
};

// Minimal .npy v1/v2 header parse for C-contiguous float32 2-D arrays.
NpyInfo parse_npy_header(const uint8_t* buf, size_t len) {
  NpyInfo info;
  if (len < 10 || std::memcmp(buf, "\x93NUMPY", 6) != 0) return info;
  uint8_t major = buf[6];
  size_t header_len, header_start;
  if (major == 1) {
    header_len = buf[8] | (buf[9] << 8);
    header_start = 10;
  } else {
    header_len = buf[8] | (buf[9] << 8) | (buf[10] << 16) |
                 (static_cast<size_t>(buf[11]) << 24);
    header_start = 12;
  }
  if (header_start + header_len > len) return info;
  std::string header(reinterpret_cast<const char*>(buf + header_start),
                     header_len);
  if (header.find("'descr': '<f4'") == std::string::npos &&
      header.find("\"descr\": \"<f4\"") == std::string::npos)
    return info;
  if (header.find("'fortran_order': False") == std::string::npos) return info;
  size_t sp = header.find("'shape': (");
  if (sp == std::string::npos) return info;
  sp += 10;
  info.rows = std::strtoll(header.c_str() + sp, nullptr, 10);
  size_t comma = header.find(',', sp);
  if (comma == std::string::npos) return info;
  info.cols = std::strtoll(header.c_str() + comma + 1, nullptr, 10);
  if (info.rows <= 0 || info.cols <= 0) return info;
  info.data_offset = static_cast<int64_t>(header_start + header_len);
  info.ok = true;
  return info;
}

struct Loader {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_len = 0;
  NpyInfo info;
  int64_t batch_rows = 0;
  int64_t n_batches = 0;

  // double-buffered prefetch
  std::vector<float> buffers[2];
  int64_t buffer_batch[2] = {-1, -1};
  int64_t next_batch = 0;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_ready, cv_need;
  std::atomic<bool> stop{false};
  int64_t ready_upto = -1;  // highest batch index prefetched

  const float* row_data() const {
    return reinterpret_cast<const float*>(map + info.data_offset);
  }

  void fill(int64_t b, std::vector<float>& dst) {
    int64_t start = b * batch_rows;
    int64_t rows = std::min(batch_rows, info.rows - start);
    dst.resize(static_cast<size_t>(rows * info.cols));
    std::memcpy(dst.data(), row_data() + start * info.cols,
                static_cast<size_t>(rows * info.cols) * sizeof(float));
  }

  void run() {
    while (!stop.load()) {
      std::unique_lock<std::mutex> lk(mu);
      cv_need.wait(lk, [&] {
        return stop.load() ||
               (next_batch < n_batches && ready_upto < next_batch + 1);
      });
      if (stop.load()) return;
      int64_t b = ready_upto + 1;
      if (b >= n_batches) continue;
      int slot = b % 2;
      lk.unlock();
      fill(b, buffers[slot]);
      lk.lock();
      buffer_batch[slot] = b;
      ready_upto = b;
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// Open a float32 C-contiguous 2-D .npy file for batch streaming.
// Returns an opaque handle or nullptr on failure.
void* tdr_loader_open(const char* path, int64_t batch_rows) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* map = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  ::madvise(map, st.st_size, MADV_SEQUENTIAL);
  NpyInfo info =
      parse_npy_header(static_cast<const uint8_t*>(map), st.st_size);
  if (!info.ok) {
    ::munmap(map, st.st_size);
    ::close(fd);
    return nullptr;
  }
  auto* L = new Loader();
  L->fd = fd;
  L->map = static_cast<const uint8_t*>(map);
  L->map_len = st.st_size;
  L->info = info;
  L->batch_rows = batch_rows > 0 ? batch_rows : info.rows;
  L->n_batches = (info.rows + L->batch_rows - 1) / L->batch_rows;
  L->worker = std::thread([L] { L->run(); });
  L->cv_need.notify_all();
  return L;
}

int64_t tdr_loader_rows(void* h) { return static_cast<Loader*>(h)->info.rows; }
int64_t tdr_loader_cols(void* h) { return static_cast<Loader*>(h)->info.cols; }
int64_t tdr_loader_n_batches(void* h) {
  return static_cast<Loader*>(h)->n_batches;
}
int64_t tdr_loader_batch_rows(void* h) {
  return static_cast<Loader*>(h)->batch_rows;
}

// Copy batch `b` into out (caller allocates batch_rows*cols floats).
// Returns the number of rows copied, or -1 on error. Blocks until the
// prefetch thread has the batch ready; sequential access overlaps IO
// with the caller's compute.
int64_t tdr_loader_get(void* h, int64_t b, float* out) {
  auto* L = static_cast<Loader*>(h);
  if (b < 0 || b >= L->n_batches) return -1;
  int64_t start = b * L->batch_rows;
  int64_t rows = std::min(L->batch_rows, L->info.rows - start);
  {
    std::unique_lock<std::mutex> lk(L->mu);
    int slot = b % 2;
    if (L->buffer_batch[slot] == b) {
      std::memcpy(out, L->buffers[slot].data(),
                  static_cast<size_t>(rows * L->info.cols) * sizeof(float));
      return rows;
    }
    // The prefetcher only moves forward (ready_upto is monotone); wait only
    // when b is ahead of it — a batch already passed falls through to the
    // direct mmap copy below (backward random access must not deadlock).
    if (b > L->ready_upto) {
      L->next_batch = b;
      L->cv_need.notify_all();
      L->cv_ready.wait(lk,
                       [&] { return L->buffer_batch[b % 2] == b || L->stop; });
      if (L->buffer_batch[slot] == b) {
        std::memcpy(out, L->buffers[slot].data(),
                    static_cast<size_t>(rows * L->info.cols) * sizeof(float));
        return rows;
      }
    }
  }
  // fallback: direct copy (random / backward access)
  std::memcpy(out, L->row_data() + start * L->info.cols,
              static_cast<size_t>(rows * L->info.cols) * sizeof(float));
  return rows;
}

void tdr_loader_close(void* h) {
  auto* L = static_cast<Loader*>(h);
  L->stop = true;
  L->cv_need.notify_all();
  if (L->worker.joinable()) L->worker.join();
  ::munmap(const_cast<uint8_t*>(L->map), L->map_len);
  ::close(L->fd);
  delete L;
}

}  // extern "C"
