// Native training data loader: mmap'd token shards + background prefetch.
//
// The reference ships a host-side data generator and raw .bin tensor codec
// (/root/reference/generate_test_data.py, src/utils.cpp); this is the
// training-scale counterpart the TPU framework needs: an int32 token file
// is mmap'd (zero-copy, page-cache backed) and a producer thread slices
// [batch, seq+1] next-token windows into a ring of ready buffers while the
// accelerator consumes the previous batch — host input never sits on the
// training step's critical path.
//
// Exposed as a tiny C ABI consumed from Python via ctypes
// (cuda_flash_attention_tpu/utils/data.py); no pybind11 dependency.
//
// Sampling is xorshift64* driven and REPRODUCED EXACTLY by the Python
// fallback loader, so tests can pin C++/Python parity batch-for-batch.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

// xorshift64* — 3 shifts + 1 multiply, trivially mirrored in Python.
inline uint64_t xorshift64s(uint64_t& s) {
  s ^= s >> 12;
  s ^= s << 25;
  s &= 0xffffffffffffffffULL;
  s ^= s >> 27;
  return (s * 0x2545F4914F6CDD1DULL) & 0xffffffffffffffffULL;
}

struct Loader {
  int fd = -1;
  const int32_t* tokens = nullptr;  // mmap'd
  int64_t n_tokens = 0;
  int64_t batch = 0;
  int64_t width = 0;  // seq_len + 1 (inputs + next-token targets)
  bool shuffle = true;
  uint64_t rng = 0;
  int64_t cursor = 0;  // sequential mode position (wraps)

  // Prefetch ring.
  std::vector<std::vector<int32_t>> ring;
  std::vector<bool> ready;
  size_t head = 0, tail = 0;  // consume at head, produce at tail
  size_t filled = 0;
  std::mutex mu;
  std::condition_variable cv_can_produce, cv_can_consume;
  std::atomic<bool> stop{false};
  std::thread producer;

  void fill_one(int32_t* out) {
    for (int64_t b = 0; b < batch; ++b) {
      int64_t start;
      if (shuffle) {
        start = static_cast<int64_t>(xorshift64s(rng) %
                                     static_cast<uint64_t>(n_tokens - width));
      } else {
        start = cursor;
        cursor += width;
        if (cursor + width > n_tokens) cursor = 0;
      }
      std::memcpy(out + b * width, tokens + start,
                  sizeof(int32_t) * static_cast<size_t>(width));
    }
  }

  void run() {
    while (!stop.load()) {
      std::unique_lock<std::mutex> lk(mu);
      cv_can_produce.wait(
          lk, [&] { return stop.load() || filled < ring.size(); });
      if (stop.load()) return;
      auto& buf = ring[tail];
      lk.unlock();
      fill_one(buf.data());  // slice outside the lock
      lk.lock();
      ready[tail] = true;
      tail = (tail + 1) % ring.size();
      ++filled;
      cv_can_consume.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* cfa_loader_open(const char* path, int64_t batch, int64_t width,
                      uint64_t seed, int shuffle, int prefetch) {
  if (batch <= 0 || width <= 0 || prefetch <= 0) return nullptr;
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  int64_t n = static_cast<int64_t>(st.st_size) / 4;
  if (n <= width) {  // need at least one full window
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ,
                   MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* L = new Loader();
  L->fd = fd;
  L->tokens = static_cast<const int32_t*>(map);
  L->n_tokens = n;
  L->batch = batch;
  L->width = width;
  L->shuffle = shuffle != 0;
  L->rng = seed ? seed : 0x9E3779B97F4A7C15ULL;
  L->ring.assign(static_cast<size_t>(prefetch),
                 std::vector<int32_t>(
                     static_cast<size_t>(batch * width)));
  L->ready.assign(static_cast<size_t>(prefetch), false);
  L->producer = std::thread([L] { L->run(); });
  return L;
}

int64_t cfa_loader_num_tokens(void* h) {
  return h ? static_cast<Loader*>(h)->n_tokens : -1;
}

int cfa_loader_next(void* h, int32_t* out) {
  if (!h || !out) return 1;
  auto* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_can_consume.wait(lk, [&] { return L->filled > 0; });
  auto& buf = L->ring[L->head];
  std::memcpy(out, buf.data(), sizeof(int32_t) * buf.size());
  L->ready[L->head] = false;
  L->head = (L->head + 1) % L->ring.size();
  --L->filled;
  L->cv_can_produce.notify_one();
  return 0;
}

void cfa_loader_close(void* h) {
  if (!h) return;
  auto* L = static_cast<Loader*>(h);
  L->stop.store(true);
  L->cv_can_produce.notify_all();
  if (L->producer.joinable()) L->producer.join();
  munmap(const_cast<int32_t*>(L->tokens),
         static_cast<size_t>(L->n_tokens) * 4);
  ::close(L->fd);
  delete L;
}

}  // extern "C"
