// Native runtime for the TPU ViT tracker framework.
//
// The reference's runtime plumbing is native Rust: a GStreamer pipeline with
// a bounded leaky queue (pipeline_ir.rs:75-78), a rayon-parallel NV12->RGB
// converter (nv12_convert.rs:46-92), and per-frame timing
// (timing_stats.rs).  This file provides the TPU framework's native
// equivalents, exposed over a C ABI for ctypes:
//
//  * FrameRing  — lock-free-ish SPSC ring of fixed-size frame slots with
//                 drop-oldest ("leaky downstream") semantics: the producer
//                 never blocks; old frames are overwritten when the
//                 consumer lags.
//  * nv12_to_rgb_mt — BT.601 integer conversion, bit-exact with the
//                 reference LUT math, parallelised over row pairs with
//                 std::thread (the rayon par_chunks_mut analog) — used as
//                 the CPU golden baseline and host-side fallback.
//  * yuy2_to_rgb_mt — same math for the YUY2 camera format.
//  * synth_nv12 — procedural NV12 frame generator (moving patterned
//                 square) for host-side benchmarking without Python
//                 overhead.
//
// Build: make (g++ -O3 -shared -fPIC -pthread).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

inline uint8_t clamp_u8(int32_t v) {
  return v < 0 ? 0 : (v > 255 ? 255 : static_cast<uint8_t>(v));
}

struct YuvTables {
  int32_t y_t[256], rv_t[256], gu_t[256], gv_t[256], bu_t[256];
  YuvTables() {
    for (int i = 0; i < 256; ++i) {
      y_t[i] = 298 * (i - 16);
      rv_t[i] = 409 * (i - 128);
      gu_t[i] = 100 * (i - 128);
      gv_t[i] = 208 * (i - 128);
      bu_t[i] = 516 * (i - 128);
    }
  }
};

const YuvTables& tables() {
  static YuvTables t;
  return t;
}

void convert_rows_nv12(const uint8_t* y_plane, const uint8_t* uv_plane,
                       uint8_t* out, int width, int row_begin, int row_end) {
  const YuvTables& t = tables();
  for (int row = row_begin; row < row_end; ++row) {
    const uint8_t* yrow = y_plane + static_cast<size_t>(row) * width;
    const uint8_t* uvrow = uv_plane + static_cast<size_t>(row / 2) * width;
    uint8_t* orow = out + static_cast<size_t>(row) * width * 3;
    for (int col = 0; col < width; ++col) {
      int uv_idx = (col / 2) * 2;
      int u = uvrow[uv_idx], v = uvrow[uv_idx + 1];
      int yv = t.y_t[yrow[col]];
      orow[col * 3 + 0] = clamp_u8((yv + t.rv_t[v] + 128) >> 8);
      orow[col * 3 + 1] = clamp_u8((yv - t.gu_t[u] - t.gv_t[v] + 128) >> 8);
      orow[col * 3 + 2] = clamp_u8((yv + t.bu_t[u] + 128) >> 8);
    }
  }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Multithreaded converters
// ---------------------------------------------------------------------------

void nv12_to_rgb_mt(const uint8_t* nv12, int width, int height,
                    uint8_t* out_rgb, int num_threads) {
  const uint8_t* y_plane = nv12;
  const uint8_t* uv_plane = nv12 + static_cast<size_t>(width) * height;
  if (num_threads <= 1) {
    convert_rows_nv12(y_plane, uv_plane, out_rgb, width, 0, height);
    return;
  }
  std::vector<std::thread> threads;
  // Split on even row boundaries so each worker owns whole UV rows.
  int pairs = (height + 1) / 2;
  int per = (pairs + num_threads - 1) / num_threads;
  for (int tid = 0; tid < num_threads; ++tid) {
    int r0 = tid * per * 2;
    int r1 = std::min(height, (tid + 1) * per * 2);
    if (r0 >= r1) break;
    threads.emplace_back(convert_rows_nv12, y_plane, uv_plane, out_rgb,
                         width, r0, r1);
  }
  for (auto& th : threads) th.join();
}

void yuy2_to_rgb_mt(const uint8_t* yuy2, int width, int height,
                    uint8_t* out_rgb, int num_threads) {
  const YuvTables& t = tables();
  auto work = [&](int r0, int r1) {
    for (int row = r0; row < r1; ++row) {
      const uint8_t* in = yuy2 + static_cast<size_t>(row) * width * 2;
      uint8_t* orow = out_rgb + static_cast<size_t>(row) * width * 3;
      for (int col = 0; col < width; col += 2) {
        int y0 = in[col * 2 + 0], u = in[col * 2 + 1];
        int y1 = in[col * 2 + 2], v = in[col * 2 + 3];
        int rv = t.rv_t[v], gu = t.gu_t[u], gv = t.gv_t[v], bu = t.bu_t[u];
        int yv0 = t.y_t[y0], yv1 = t.y_t[y1];
        orow[col * 3 + 0] = clamp_u8((yv0 + rv + 128) >> 8);
        orow[col * 3 + 1] = clamp_u8((yv0 - gu - gv + 128) >> 8);
        orow[col * 3 + 2] = clamp_u8((yv0 + bu + 128) >> 8);
        orow[col * 3 + 3] = clamp_u8((yv1 + rv + 128) >> 8);
        orow[col * 3 + 4] = clamp_u8((yv1 - gu - gv + 128) >> 8);
        orow[col * 3 + 5] = clamp_u8((yv1 + bu + 128) >> 8);
      }
    }
  };
  if (num_threads <= 1) {
    work(0, height);
    return;
  }
  std::vector<std::thread> threads;
  int per = (height + num_threads - 1) / num_threads;
  for (int tid = 0; tid < num_threads; ++tid) {
    int r0 = tid * per, r1 = std::min(height, (tid + 1) * per);
    if (r0 >= r1) break;
    threads.emplace_back(work, r0, r1);
  }
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// FrameRing: bounded drop-oldest frame queue
// ---------------------------------------------------------------------------

struct FrameRing {
  std::vector<uint8_t> storage;
  std::vector<uint64_t> seq;       // sequence number per slot (0 = empty)
  size_t slot_size;
  int capacity;
  std::mutex mu;                   // slots are large; contention is tiny
  uint64_t next_seq = 1;
  uint64_t pushed = 0, dropped = 0, popped = 0;
  int head = 0;                    // oldest occupied slot
  int count = 0;
};

FrameRing* ring_create(int capacity, uint64_t slot_size) {
  auto* r = new FrameRing();
  r->capacity = capacity;
  r->slot_size = slot_size;
  r->storage.resize(static_cast<size_t>(capacity) * slot_size);
  r->seq.assign(capacity, 0);
  return r;
}

void ring_destroy(FrameRing* r) { delete r; }

// Push: copies `data` (slot_size bytes) in; drops the oldest when full.
// Returns 1 if an old frame was dropped, 0 otherwise.
int ring_push(FrameRing* r, const uint8_t* data) {
  std::lock_guard<std::mutex> lock(r->mu);
  int dropped = 0;
  int slot;
  if (r->count == r->capacity) {
    slot = r->head;                       // overwrite oldest (leaky)
    r->head = (r->head + 1) % r->capacity;
    r->dropped++;
    dropped = 1;
  } else {
    slot = (r->head + r->count) % r->capacity;
    r->count++;
  }
  std::memcpy(&r->storage[static_cast<size_t>(slot) * r->slot_size], data,
              r->slot_size);
  r->seq[slot] = r->next_seq++;
  r->pushed++;
  return dropped;
}

// Pop oldest into `out`; returns the frame's sequence number, 0 if empty.
uint64_t ring_pop(FrameRing* r, uint8_t* out) {
  std::lock_guard<std::mutex> lock(r->mu);
  if (r->count == 0) return 0;
  int slot = r->head;
  std::memcpy(out, &r->storage[static_cast<size_t>(slot) * r->slot_size],
              r->slot_size);
  uint64_t s = r->seq[slot];
  r->seq[slot] = 0;
  r->head = (r->head + 1) % r->capacity;
  r->count--;
  r->popped++;
  return s;
}

int ring_len(FrameRing* r) {
  std::lock_guard<std::mutex> lock(r->mu);
  return r->count;
}

uint64_t ring_stat_pushed(FrameRing* r) { return r->pushed; }
uint64_t ring_stat_dropped(FrameRing* r) { return r->dropped; }
uint64_t ring_stat_popped(FrameRing* r) { return r->popped; }

// ---------------------------------------------------------------------------
// Synthetic NV12 frame generator (bench feed)
// ---------------------------------------------------------------------------

// Writes one NV12 frame (Y then interleaved UV) of a patterned square at
// (obj_x, obj_y) over a gradient background.
void synth_nv12(uint8_t* out, int width, int height, int obj_x, int obj_y,
                int obj_size) {
  uint8_t* y_plane = out;
  uint8_t* uv_plane = out + static_cast<size_t>(width) * height;
  for (int r = 0; r < height; ++r) {
    uint8_t* yrow = y_plane + static_cast<size_t>(r) * width;
    for (int c = 0; c < width; ++c) {
      int inside = (c >= obj_x && c < obj_x + obj_size && r >= obj_y &&
                    r < obj_y + obj_size);
      if (inside) {
        int lx = c - obj_x, ly = r - obj_y;
        yrow[c] = static_cast<uint8_t>(60 + ((lx * 7 + ly * 13) % 160));
      } else {
        yrow[c] = static_cast<uint8_t>(40 + ((r >> 3) + (c >> 4)) % 60);
      }
    }
  }
  int uv_h = height / 2;
  for (int r = 0; r < uv_h; ++r) {
    uint8_t* uvrow = uv_plane + static_cast<size_t>(r) * width;
    for (int c = 0; c < width / 2; ++c) {
      int fy = r * 2, fx = c * 2;
      int inside = (fx >= obj_x && fx < obj_x + obj_size && fy >= obj_y &&
                    fy < obj_y + obj_size);
      uvrow[c * 2 + 0] = inside ? 90 : 128;
      uvrow[c * 2 + 1] = inside ? 170 : 128;
    }
  }
}

}  // extern "C"
