// Native .sdriq block loader — the data-loader role of the reference's
// C++ file source (plugins/samplesource/filesource/filesourcethread.cpp:
// mmapless ifstream reads + 16/24-bit conversion in the device thread).
//
// Provides: open (mmap), sequential wrapped block reads with int16->float32
// deinterleave+scale into caller buffers, and a lock-free SPSC ring buffer
// (the SampleSinkFifo role, sdrbase/dsp/samplesinkfifo.cpp:70-150) for
// producer/consumer pipelines. Exposed via a plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsdriq.so sdriq_loader.cc

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct SdriqFile {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t bytes = 0;
  int32_t sample_rate = 0;
  uint64_t center_frequency = 0;
  uint32_t sample_size = 16;
  size_t n_samples = 0;  // complex samples
  const int16_t* payload16 = nullptr;
  const int32_t* payload24 = nullptr;
};

struct Ring {
  float* buf = nullptr;  // interleaved I/Q floats
  size_t capacity = 0;   // complex samples
  std::atomic<size_t> head{0};  // write position (complex samples)
  std::atomic<size_t> tail{0};  // read position
};

}  // namespace

extern "C" {

void* sdriq_open(const char* path) {
  auto* f = new SdriqFile();
  f->fd = open(path, O_RDONLY);
  if (f->fd < 0) { delete f; return nullptr; }
  struct stat st;
  fstat(f->fd, &st);
  f->bytes = st.st_size;
  f->map = (const uint8_t*)mmap(nullptr, f->bytes, PROT_READ, MAP_PRIVATE, f->fd, 0);
  if (f->map == MAP_FAILED) { close(f->fd); delete f; return nullptr; }
  madvise((void*)f->map, f->bytes, MADV_SEQUENTIAL);
  memcpy(&f->sample_rate, f->map, 4);
  memcpy(&f->center_frequency, f->map + 4, 8);
  memcpy(&f->sample_size, f->map + 20, 4);
  if (f->sample_size != 16 && f->sample_size != 24) f->sample_size = 16;
  size_t payload = f->bytes - 24;
  if (f->sample_size == 16) {
    f->payload16 = (const int16_t*)(f->map + 24);
    f->n_samples = payload / 4;
  } else {
    f->payload24 = (const int32_t*)(f->map + 24);
    f->n_samples = payload / 8;
  }
  return f;
}

int32_t sdriq_sample_rate(void* h) { return ((SdriqFile*)h)->sample_rate; }
uint64_t sdriq_center_frequency(void* h) { return ((SdriqFile*)h)->center_frequency; }
uint32_t sdriq_sample_size(void* h) { return ((SdriqFile*)h)->sample_size; }
uint64_t sdriq_n_samples(void* h) { return ((SdriqFile*)h)->n_samples; }

// Read `count` complex samples starting at `start` (wrapping at EOF like
// filesourcethread.cpp:188-195) as float32 interleaved I/Q scaled to [-1,1).
void sdriq_read_f32(void* h, uint64_t start, uint64_t count, float* out) {
  auto* f = (SdriqFile*)h;
  const size_t n = f->n_samples;
  if (f->sample_size == 16) {
    constexpr float kScale = 1.0f / 32768.0f;
    for (uint64_t i = 0; i < count; ++i) {
      size_t s = (start + i) % n;
      out[2 * i] = f->payload16[2 * s] * kScale;
      out[2 * i + 1] = f->payload16[2 * s + 1] * kScale;
    }
  } else {
    constexpr float kScale = 1.0f / 8388608.0f;
    for (uint64_t i = 0; i < count; ++i) {
      size_t s = (start + i) % n;
      out[2 * i] = f->payload24[2 * s] * kScale;
      out[2 * i + 1] = f->payload24[2 * s + 1] * kScale;
    }
  }
}

// Raw int16 read (wrapping) — zero conversion path for device upload.
void sdriq_read_i16(void* h, uint64_t start, uint64_t count, int16_t* out) {
  auto* f = (SdriqFile*)h;
  const size_t n = f->n_samples;
  if (f->sample_size == 16) {
    // fast path: memcpy contiguous spans
    uint64_t done = 0;
    while (done < count) {
      size_t s = (start + done) % n;
      size_t span = n - s;
      if (span > count - done) span = count - done;
      memcpy(out + 2 * done, f->payload16 + 2 * s, span * 4);
      done += span;
    }
  } else {
    for (uint64_t i = 0; i < count; ++i) {
      size_t s = (start + i) % n;
      out[2 * i] = (int16_t)(f->payload24[2 * s] >> 8);
      out[2 * i + 1] = (int16_t)(f->payload24[2 * s + 1] >> 8);
    }
  }
}

void sdriq_close(void* h) {
  auto* f = (SdriqFile*)h;
  munmap((void*)f->map, f->bytes);
  close(f->fd);
  delete f;
}

// ---- SPSC ring buffer (SampleSinkFifo role) -------------------------------

void* ring_create(uint64_t capacity_complex) {
  auto* r = new Ring();
  r->capacity = capacity_complex;
  r->buf = new float[2 * capacity_complex];
  return r;
}

uint64_t ring_write(void* h, const float* data, uint64_t count) {
  auto* r = (Ring*)h;
  size_t head = r->head.load(std::memory_order_relaxed);
  size_t tail = r->tail.load(std::memory_order_acquire);
  size_t free_space = r->capacity - (head - tail);
  if (count > free_space) count = free_space;  // overrun drop (fifo semantics)
  for (uint64_t i = 0; i < count; ++i) {
    size_t pos = (head + i) % r->capacity;
    r->buf[2 * pos] = data[2 * i];
    r->buf[2 * pos + 1] = data[2 * i + 1];
  }
  r->head.store(head + count, std::memory_order_release);
  return count;
}

uint64_t ring_read(void* h, float* out, uint64_t count) {
  auto* r = (Ring*)h;
  size_t tail = r->tail.load(std::memory_order_relaxed);
  size_t head = r->head.load(std::memory_order_acquire);
  size_t avail = head - tail;
  if (count > avail) count = avail;
  for (uint64_t i = 0; i < count; ++i) {
    size_t pos = (tail + i) % r->capacity;
    out[2 * i] = r->buf[2 * pos];
    out[2 * i + 1] = r->buf[2 * pos + 1];
  }
  r->tail.store(tail + count, std::memory_order_release);
  return count;
}

uint64_t ring_fill(void* h) {
  auto* r = (Ring*)h;
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

void ring_destroy(void* h) {
  auto* r = (Ring*)h;
  delete[] r->buf;
  delete r;
}

}  // extern "C"
