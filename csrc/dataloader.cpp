// Native threaded LM batch loader.
//
// The TPU-framework analog of the reference's dataloader stack
// (/root/reference/examples/hyena/src/dataloaders/ + the vendored harness's
// language_modeling_hf datamodule): memory-maps a token corpus (bytes or
// int32 tokens), and a background thread pipelines (input, target) next-token
// batches into a bounded ring buffer so host batch assembly overlaps with
// device steps. Deterministic counter-based RNG gives fault-tolerant data
// order: save/restore a single uint64 counter to resume mid-epoch exactly
// (the RandomFaultTolerantSampler contract,
// examples/hyena/src/dataloaders/fault_tolerant_sampler.py:9-107).
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (flashfftconv_tpu/utils/native_loader.py). Build: `make -C csrc`.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <queue>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

// splitmix64: deterministic counter-based RNG (state = consumed counter).
static inline uint64_t splitmix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

struct Batch {
  std::vector<int32_t> x, y;
};

struct Loader {
  const uint8_t* data8 = nullptr;
  const int32_t* data32 = nullptr;
  int64_t n_tokens = 0;
  int64_t batch = 0, seqlen = 0;
  uint64_t seed = 0;
  std::atomic<uint64_t> counter{0};  // batches produced (fault-tolerance state)
  size_t map_len = 0;
  void* map_addr = nullptr;
  int fd = -1;

  std::queue<Batch> ring;
  size_t ring_cap = 4;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::thread worker;
  std::atomic<bool> stop{false};

  inline int32_t tok(int64_t i) const {
    return data32 ? data32[i] : static_cast<int32_t>(data8[i]);
  }

  void fill(Batch& b, uint64_t ctr) {
    b.x.resize(batch * seqlen);
    b.y.resize(batch * seqlen);
    const int64_t max_start = n_tokens - seqlen - 1;
    for (int64_t i = 0; i < batch; ++i) {
      uint64_t r = splitmix64(seed * 0x2545f4914f6cdd1dULL + ctr * batch + i);
      int64_t s = static_cast<int64_t>(r % static_cast<uint64_t>(max_start));
      for (int64_t j = 0; j < seqlen; ++j) {
        b.x[i * seqlen + j] = tok(s + j);
        b.y[i * seqlen + j] = tok(s + j + 1);
      }
    }
  }

  std::atomic<uint64_t> generation{0};  // bumped by dl_restore

  void run() {
    while (!stop.load()) {
      uint64_t ctr, gen;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_full.wait(lk, [&] { return ring.size() < ring_cap || stop.load(); });
        if (stop.load()) return;
        ctr = counter.load();
        gen = generation.load();
      }
      Batch b;
      fill(b, ctr);
      {
        std::unique_lock<std::mutex> lk(mu);
        // Discard if a restore happened while we were filling.
        if (generation.load() != gen || stop.load()) continue;
        ring.push(std::move(b));
        counter.store(ctr + 1);
        cv_empty.notify_one();
      }
    }
  }
};

}  // namespace

extern "C" {

void* dl_create(const char* path, int64_t batch, int64_t seqlen,
                uint64_t seed, int is_int32) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  void* addr = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (addr == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  auto* l = new Loader();
  l->map_addr = addr;
  l->map_len = st.st_size;
  l->fd = fd;
  if (is_int32) {
    l->data32 = static_cast<const int32_t*>(addr);
    l->n_tokens = st.st_size / 4;
  } else {
    l->data8 = static_cast<const uint8_t*>(addr);
    l->n_tokens = st.st_size;
  }
  l->batch = batch;
  l->seqlen = seqlen;
  l->seed = seed;
  if (l->n_tokens <= seqlen + 1) {
    munmap(addr, st.st_size);
    close(fd);
    delete l;
    return nullptr;
  }
  l->worker = std::thread([l] { l->run(); });
  return l;
}

// Blocks until a batch is ready; copies into caller buffers of
// shape (batch, seqlen) int32.
void dl_next(void* h, int32_t* x, int32_t* y) {
  auto* l = static_cast<Loader*>(h);
  Batch b;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->cv_empty.wait(lk, [&] { return !l->ring.empty(); });
    b = std::move(l->ring.front());
    l->ring.pop();
    l->cv_full.notify_one();
  }
  std::memcpy(x, b.x.data(), b.x.size() * sizeof(int32_t));
  std::memcpy(y, b.y.data(), b.y.size() * sizeof(int32_t));
}

uint64_t dl_state(void* h) {
  auto* l = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(l->mu);
  // Consumed = produced - still queued.
  return l->counter.load() - l->ring.size();
}

void dl_restore(void* h, uint64_t counter) {
  auto* l = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(l->mu);
  std::queue<Batch>().swap(l->ring);  // drop prefetched batches
  l->counter.store(counter);
  l->generation.fetch_add(1);  // invalidate any in-flight fill
  l->cv_full.notify_all();
}

int64_t dl_num_tokens(void* h) { return static_cast<Loader*>(h)->n_tokens; }

void dl_destroy(void* h) {
  auto* l = static_cast<Loader*>(h);
  l->stop.store(true);
  l->cv_full.notify_all();
  if (l->worker.joinable()) l->worker.join();
  if (l->map_addr) munmap(l->map_addr, l->map_len);
  if (l->fd >= 0) close(l->fd);
  delete l;
}

}  // extern "C"
