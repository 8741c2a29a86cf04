// feature_pack.cc — native reader for the packed feature store.
//
// The reference's input pipeline np.load()s one pickled dict per image per
// sample (base_dataset.py:27-34 in the upstream) — unpickling dominates
// host time.  The TPU rebuild packs all images' arrays into one contiguous
// binary blob (see openvivqa_tpu/data/feature_pack.py for the format) and
// this library serves batch gathers from an mmap'd pack with a small
// thread pool, exposed to Python via ctypes (no pybind11 in this image).
//
// Format (little endian):
//   [8 bytes magic "OVQAPACK"] [u64 header_json_len] [header json] [payload]
// header json: {"keys": [...], "dtype": "f4", "rows": {key: [n, d]},
//               "images": {image_id: offset_index}}  — offsets are in
// row-units per key; payload is, per image, the concatenation of each
// key's (n, d) f32 block in key order.
//
// Build: ./native/build.sh  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <atomic>
#include <condition_variable>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct Pack {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;
};

struct CopyJob {
  const uint8_t* src;
  uint8_t* dst;
  size_t bytes;
};

class Pool {
 public:
  explicit Pool(int n_threads) : stop_(false), pending_(0) {
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] { Run(); });
    }
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(CopyJob job) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      jobs_.push(job);
      ++pending_;
    }
    cv_.notify_one();
  }
  void Wait() {
    std::unique_lock<std::mutex> lock(mu_);
    done_cv_.wait(lock, [this] { return pending_ == 0; });
  }

 private:
  void Run() {
    for (;;) {
      CopyJob job;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_.wait(lock, [this] { return stop_ || !jobs_.empty(); });
        if (stop_ && jobs_.empty()) return;
        job = jobs_.front();
        jobs_.pop();
      }
      std::memcpy(job.dst, job.src, job.bytes);
      {
        std::lock_guard<std::mutex> lock(mu_);
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> workers_;
  std::queue<CopyJob> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable done_cv_;
  bool stop_;
  int pending_;
};

Pool* pool() {
  static Pool* p = new Pool(
      std::max(2u, std::thread::hardware_concurrency() / 2));
  return p;
}

}  // namespace

extern "C" {

// Opens the pack file; returns an opaque handle (or null on failure).
void* ovqa_pack_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* mapped = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (mapped == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  madvise(mapped, st.st_size, MADV_WILLNEED);
  Pack* pack = new Pack();
  pack->fd = fd;
  pack->data = static_cast<const uint8_t*>(mapped);
  pack->size = st.st_size;
  return pack;
}

void ovqa_pack_close(void* handle) {
  Pack* pack = static_cast<Pack*>(handle);
  if (!pack) return;
  munmap(const_cast<uint8_t*>(pack->data), pack->size);
  ::close(pack->fd);
  delete pack;
}

// Raw pointer into the mapped file (header parsing is done in Python once).
const uint8_t* ovqa_pack_data(void* handle) {
  return static_cast<Pack*>(handle)->data;
}

uint64_t ovqa_pack_size(void* handle) {
  return static_cast<Pack*>(handle)->size;
}

// Batch gather: copies n slices [src_offsets[i], src_offsets[i]+n_bytes[i])
// from the pack into dst + dst_offsets[i], parallelised over a thread pool.
// Returns 0 on success.
int ovqa_pack_gather(void* handle, uint64_t n, const uint64_t* src_offsets,
                     const uint64_t* n_bytes, uint8_t* dst,
                     const uint64_t* dst_offsets) {
  Pack* pack = static_cast<Pack*>(handle);
  if (!pack) return 1;
  for (uint64_t i = 0; i < n; ++i) {
    if (src_offsets[i] + n_bytes[i] > pack->size) return 2;
    pool()->Submit(CopyJob{pack->data + src_offsets[i],
                           dst + dst_offsets[i], n_bytes[i]});
  }
  pool()->Wait();
  return 0;
}

}  // extern "C"
