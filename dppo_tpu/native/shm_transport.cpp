// Shared-memory observation transport for the vectorized env pool.
//
// The reference's AsyncVectorEnv ships observations from its per-env worker
// processes through POSIX shared memory (env/gym_utils/async_vector_env.py:
// create_shared_memory:163-184, _worker_shared_memory:774-799) while control
// flows over pipes. This native module supplies the same capability for the
// TPU build's sharded worker pool: each worker owns one seqlock-guarded
// buffer; it writes its observation shard after every step, and the parent
// reads a consistent snapshot without pickling or copying through a pipe.
//
// Layout per segment:
//   [ u64 magic | u64 payload_bytes | u64 seq | pad to 64B | payload ]
// seq is even when the buffer is stable; the writer increments it before and
// after writing (odd = in flight). Readers retry until they observe the same
// even value on both sides of the copy — a classic seqlock, safe for the
// single-producer (worker) single-consumer (parent) pattern used here.
//
// Build: g++ -O2 -shared -fPIC -o libshm_transport.so shm_transport.cpp -lrt
// (built on demand by dppo_tpu/native/__init__.py and cached).

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kMagic = 0x6470706f5f736d68ULL;  // "dppo_smh"
constexpr size_t kHeaderBytes = 64;

struct Header {
  uint64_t magic;
  uint64_t payload_bytes;
  std::atomic<uint64_t> seq;
};

static_assert(sizeof(Header) <= kHeaderBytes, "header must fit in 64 bytes");

inline Header* header_of(void* base) { return reinterpret_cast<Header*>(base); }

inline uint8_t* payload_of(void* base) {
  return reinterpret_cast<uint8_t*>(base) + kHeaderBytes;
}

size_t segment_bytes(uint64_t payload) { return kHeaderBytes + payload; }

}  // namespace

extern "C" {

// Create (or replace) a named segment sized for `payload_bytes`.
// Returns the mapped base pointer or nullptr on failure.
void* shm_seg_create(const char* name, uint64_t payload_bytes) {
  shm_unlink(name);  // replace any stale segment
  int fd = shm_open(name, O_CREAT | O_EXCL | O_RDWR, 0600);
  if (fd < 0) return nullptr;
  size_t total = segment_bytes(payload_bytes);
  if (ftruncate(fd, static_cast<off_t>(total)) != 0) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  void* base = mmap(nullptr, total, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (base == MAP_FAILED) {
    shm_unlink(name);
    return nullptr;
  }
  Header* h = header_of(base);
  h->magic = kMagic;
  h->payload_bytes = payload_bytes;
  h->seq.store(0, std::memory_order_release);
  return base;
}

// Attach to an existing segment; payload size must match.
void* shm_seg_attach(const char* name, uint64_t payload_bytes) {
  int fd = shm_open(name, O_RDWR, 0600);
  if (fd < 0) return nullptr;
  size_t total = segment_bytes(payload_bytes);
  void* base = mmap(nullptr, total, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (base == MAP_FAILED) return nullptr;
  Header* h = header_of(base);
  if (h->magic != kMagic || h->payload_bytes != payload_bytes) {
    munmap(base, total);
    return nullptr;
  }
  return base;
}

void shm_seg_detach(void* base, uint64_t payload_bytes) {
  if (base) munmap(base, segment_bytes(payload_bytes));
}

int shm_seg_unlink(const char* name) { return shm_unlink(name); }

// Single-producer write: publish `n` bytes (n <= payload_bytes).
void shm_seg_write(void* base, const void* src, uint64_t n) {
  Header* h = header_of(base);
  uint64_t s = h->seq.load(std::memory_order_relaxed);
  h->seq.store(s + 1, std::memory_order_release);  // odd: write in flight
  std::atomic_thread_fence(std::memory_order_acq_rel);
  std::memcpy(payload_of(base), src, n);
  std::atomic_thread_fence(std::memory_order_acq_rel);
  h->seq.store(s + 2, std::memory_order_release);  // even: stable
}

// Single-consumer read of `n` bytes; retries across concurrent writes.
// Returns the sequence number of the snapshot read.
uint64_t shm_seg_read(void* base, void* dst, uint64_t n) {
  Header* h = header_of(base);
  while (true) {
    uint64_t s0 = h->seq.load(std::memory_order_acquire);
    if (s0 & 1) continue;  // writer in flight
    std::atomic_thread_fence(std::memory_order_acquire);
    std::memcpy(dst, payload_of(base), n);
    std::atomic_thread_fence(std::memory_order_acquire);
    uint64_t s1 = h->seq.load(std::memory_order_acquire);
    if (s0 == s1) return s1;
  }
}

uint64_t shm_seg_seq(void* base) {
  return header_of(base)->seq.load(std::memory_order_acquire);
}

}  // extern "C"
