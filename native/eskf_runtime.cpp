// Native runtime support library.
//
// TPU-native counterpart of the reference's host-side plumbing, re-designed
// for a feed-the-accelerator pipeline:
//  * SPSC ring queues for IMU / LiDAR records — the role of the reference's
//    mutex'd SynchronizedQueue (/root/reference/include/ESKF_LIO/
//    SynchronizedQueue.hpp:9-57), lock-free single-producer/single-consumer
//    so the ingest thread never blocks the device-feed thread.
//  * Binary scan-log codec — the role of the ROS2 PointCloud2 conversion
//    loop (/root/reference/include/ESKF_LIO/Subscriber.hpp:80-103): packed
//    (x, y, z, t_rel) records decoded straight into contiguous arrays.
//  * Scan packing — pad/truncate + relative-time conversion into the fixed
//    -capacity device layout, the per-scan host hot loop.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <new>

extern "C" {

// ---------------------------------------------------------------------------
// SPSC ring queue of fixed-size slots
// ---------------------------------------------------------------------------

struct SpscQueue {
  uint8_t* buf;
  size_t slot_size;
  size_t capacity;  // number of slots, power of two
  std::atomic<uint64_t> head;  // consumer position
  std::atomic<uint64_t> tail;  // producer position
};

SpscQueue* spsc_create(size_t slot_size, size_t capacity_pow2) {
  if (capacity_pow2 == 0 || (capacity_pow2 & (capacity_pow2 - 1)) != 0) {
    return nullptr;
  }
  auto* q = new (std::nothrow) SpscQueue();
  if (!q) return nullptr;
  q->buf = new (std::nothrow) uint8_t[slot_size * capacity_pow2];
  if (!q->buf) {
    delete q;
    return nullptr;
  }
  q->slot_size = slot_size;
  q->capacity = capacity_pow2;
  q->head.store(0, std::memory_order_relaxed);
  q->tail.store(0, std::memory_order_relaxed);
  return q;
}

void spsc_destroy(SpscQueue* q) {
  if (!q) return;
  delete[] q->buf;
  delete q;
}

// returns 1 on success, 0 if full
int spsc_push(SpscQueue* q, const void* item) {
  uint64_t tail = q->tail.load(std::memory_order_relaxed);
  uint64_t head = q->head.load(std::memory_order_acquire);
  if (tail - head >= q->capacity) return 0;
  std::memcpy(q->buf + (tail & (q->capacity - 1)) * q->slot_size, item,
              q->slot_size);
  q->tail.store(tail + 1, std::memory_order_release);
  return 1;
}

// returns 1 on success, 0 if empty
int spsc_pop(SpscQueue* q, void* out) {
  uint64_t head = q->head.load(std::memory_order_relaxed);
  uint64_t tail = q->tail.load(std::memory_order_acquire);
  if (head == tail) return 0;
  std::memcpy(out, q->buf + (head & (q->capacity - 1)) * q->slot_size,
              q->slot_size);
  q->head.store(head + 1, std::memory_order_release);
  return 1;
}

// drain up to max_items; returns the number popped (the reference's popAll,
// SynchronizedQueue.hpp:39-56)
int64_t spsc_pop_all(SpscQueue* q, void* out, int64_t max_items) {
  uint64_t head = q->head.load(std::memory_order_relaxed);
  uint64_t tail = q->tail.load(std::memory_order_acquire);
  int64_t n = 0;
  auto* dst = static_cast<uint8_t*>(out);
  while (head != tail && n < max_items) {
    std::memcpy(dst + n * q->slot_size,
                q->buf + (head & (q->capacity - 1)) * q->slot_size,
                q->slot_size);
    ++head;
    ++n;
  }
  q->head.store(head, std::memory_order_release);
  return n;
}

int64_t spsc_size(SpscQueue* q) {
  return static_cast<int64_t>(q->tail.load(std::memory_order_acquire) -
                              q->head.load(std::memory_order_acquire));
}

// ---------------------------------------------------------------------------
// scan packing: raw (xyz f32, t f64 absolute) -> fixed-capacity device layout
// ---------------------------------------------------------------------------

// Decodes n_in points into padded arrays of size n_cap:
//   out_xyz   [n_cap*3] f32
//   out_t_rel [n_cap]   f32   (t - t_end)
//   out_valid [n_cap]   u8
// Drops non-finite points (the role of input sanitising the reference leaves
// to ROS). Returns the number of valid points written.
int64_t pack_scan(const float* xyz, const double* t, int64_t n_in,
                  double t_end, int64_t n_cap, float* out_xyz,
                  float* out_t_rel, uint8_t* out_valid) {
  int64_t m = 0;
  for (int64_t i = 0; i < n_in && m < n_cap; ++i) {
    const float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    out_xyz[3 * m] = x;
    out_xyz[3 * m + 1] = y;
    out_xyz[3 * m + 2] = z;
    out_t_rel[m] = static_cast<float>(t[i] - t_end);
    out_valid[m] = 1;
    ++m;
  }
  for (int64_t i = m; i < n_cap; ++i) {
    out_xyz[3 * i] = 0.f;
    out_xyz[3 * i + 1] = 0.f;
    out_xyz[3 * i + 2] = 0.f;
    out_t_rel[i] = 0.f;
    out_valid[i] = 0;
  }
  return m;
}

// ---------------------------------------------------------------------------
// binary scan-log codec
// ---------------------------------------------------------------------------
// Record stream format (little-endian):
//   magic  u32 = 0x4C494F31 ("LIO1")
//   then repeated records:
//     kind u8: 0 = IMU, 1 = SCAN
//     IMU : t f64, gyro f32[3], accel f32[3]
//     SCAN: t_end f64, n u32, then n * (xyz f32[3], t f64)

static const uint32_t kMagic = 0x4C494F31u;

int64_t log_write_header(FILE* f) { return fwrite(&kMagic, 4, 1, f) == 1; }

int64_t log_write_imu(FILE* f, double t, const float* gyro,
                      const float* accel) {
  uint8_t kind = 0;
  if (fwrite(&kind, 1, 1, f) != 1) return 0;
  if (fwrite(&t, 8, 1, f) != 1) return 0;
  if (fwrite(gyro, 4, 3, f) != 3) return 0;
  if (fwrite(accel, 4, 3, f) != 3) return 0;
  return 1;
}

int64_t log_write_scan(FILE* f, double t_end, const float* xyz,
                       const double* t, uint32_t n) {
  uint8_t kind = 1;
  if (fwrite(&kind, 1, 1, f) != 1) return 0;
  if (fwrite(&t_end, 8, 1, f) != 1) return 0;
  if (fwrite(&n, 4, 1, f) != 1) return 0;
  if (fwrite(xyz, 4, 3 * static_cast<size_t>(n), f) != 3 * (size_t)n) return 0;
  if (fwrite(t, 8, n, f) != n) return 0;
  return 1;
}

FILE* log_open(const char* path, const char* mode) {
  return fopen(path, mode);
}
void log_close(FILE* f) { fclose(f); }

int64_t log_check_header(FILE* f) {
  uint32_t magic = 0;
  if (fread(&magic, 4, 1, f) != 1) return 0;
  return magic == kMagic;
}

// Reads the next record kind: returns 0 (IMU), 1 (SCAN), -1 (EOF/err).
int64_t log_next_kind(FILE* f) {
  uint8_t kind;
  if (fread(&kind, 1, 1, f) != 1) return -1;
  return kind;
}

int64_t log_read_imu(FILE* f, double* t, float* gyro, float* accel) {
  if (fread(t, 8, 1, f) != 1) return 0;
  if (fread(gyro, 4, 3, f) != 3) return 0;
  if (fread(accel, 4, 3, f) != 3) return 0;
  return 1;
}

// reads the scan header; caller then calls log_read_scan_data with buffers
int64_t log_read_scan_header(FILE* f, double* t_end, uint32_t* n) {
  if (fread(t_end, 8, 1, f) != 1) return 0;
  if (fread(n, 4, 1, f) != 1) return 0;
  return 1;
}

int64_t log_read_scan_data(FILE* f, float* xyz, double* t, uint32_t n) {
  if (fread(xyz, 4, 3 * static_cast<size_t>(n), f) != 3 * (size_t)n) return 0;
  if (fread(t, 8, n, f) != n) return 0;
  return 1;
}

}  // extern "C"
