// ceruntime — native runtime support for cyberether_tpu.
//
// The reference implements its IO/runtime machinery in C++
// (CircularBuffer: include/jetstream/tools/circular_buffer.hh;
// file ingest: src/domains/io/file_reader; platform timing).  This
// library provides the TPU build's native equivalents behind a plain C
// ABI consumed via ctypes:
//
//  - SPSC lock-free ring buffer with blocking wait_for_size and
//    drop-oldest overflow (the SDR ingest decoupling primitive)
//  - buffered raw IQ file reader with a readahead thread
//  - monotonic clock + precise sleep helpers for pacing
//
// Build: make -C native   (produces libceruntime.so)

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// ring buffer (byte-oriented; element size handled by the caller)
// ---------------------------------------------------------------------------
struct CeRing {
    uint8_t* data;
    size_t capacity;             // bytes
    std::atomic<uint64_t> head;  // total bytes written
    std::atomic<uint64_t> tail;  // total bytes consumed
    std::atomic<uint64_t> overflows;
    std::atomic<bool> closed;
    std::mutex m;
    std::condition_variable cv;
};

CeRing* ce_ring_create(size_t capacity_bytes) {
    auto* r = new CeRing();
    r->data = static_cast<uint8_t*>(std::malloc(capacity_bytes));
    if (r->data == nullptr) {
        delete r;
        return nullptr;
    }
    r->capacity = capacity_bytes;
    r->head = 0;
    r->tail = 0;
    r->overflows = 0;
    r->closed = false;
    return r;
}

void ce_ring_destroy(CeRing* r) {
    if (r == nullptr) return;
    std::free(r->data);
    delete r;
}

size_t ce_ring_occupancy(CeRing* r) {
    return static_cast<size_t>(r->head.load(std::memory_order_acquire) -
                               r->tail.load(std::memory_order_acquire));
}

uint64_t ce_ring_overflows(CeRing* r) { return r->overflows.load(); }

void ce_ring_close(CeRing* r) {
    {
        std::lock_guard<std::mutex> lk(r->m);
        r->closed.store(true);
    }
    r->cv.notify_all();
}

void ce_ring_reset(CeRing* r) {
    std::lock_guard<std::mutex> lk(r->m);
    r->head = 0;
    r->tail = 0;
    r->overflows = 0;
}

// producer: drop-oldest on overflow (never blocks)
void ce_ring_put(CeRing* r, const uint8_t* src, size_t n) {
    if (n >= r->capacity) {
        src += n - r->capacity;
        n = r->capacity;
    }
    uint64_t head = r->head.load(std::memory_order_relaxed);
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    if (head + n - tail > r->capacity) {
        // drop oldest: advance tail
        uint64_t new_tail = head + n - r->capacity;
        r->tail.store(new_tail, std::memory_order_release);
        r->overflows.fetch_add(1);
    }
    size_t pos = static_cast<size_t>(head % r->capacity);
    size_t first = r->capacity - pos;
    if (first >= n) {
        std::memcpy(r->data + pos, src, n);
    } else {
        std::memcpy(r->data + pos, src, first);
        std::memcpy(r->data, src + first, n - first);
    }
    {
        std::lock_guard<std::mutex> lk(r->m);
        r->head.store(head + n, std::memory_order_release);
    }
    r->cv.notify_all();
}

// consumer: blocking wait for n bytes; returns 1 ok, 0 timeout/closed
int ce_ring_wait_for_size(CeRing* r, size_t n, double timeout_s) {
    std::unique_lock<std::mutex> lk(r->m);
    auto pred = [&] {
        return r->closed.load() ||
               (r->head.load() - r->tail.load()) >= n;
    };
    if (timeout_s < 0) {
        r->cv.wait(lk, pred);
    } else if (!r->cv.wait_for(
                   lk, std::chrono::duration<double>(timeout_s), pred)) {
        return 0;
    }
    return r->closed.load() ? 0 : 1;
}

// consumer: pop exactly n bytes; returns 1 ok, 0 starved
int ce_ring_get(CeRing* r, uint8_t* dst, size_t n) {
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    uint64_t head = r->head.load(std::memory_order_acquire);
    if (head - tail < n) return 0;
    size_t pos = static_cast<size_t>(tail % r->capacity);
    size_t first = r->capacity - pos;
    if (first >= n) {
        std::memcpy(dst, r->data + pos, n);
    } else {
        std::memcpy(dst, r->data + pos, first);
        std::memcpy(dst + first, r->data, n - first);
    }
    r->tail.store(tail + n, std::memory_order_release);
    return 1;
}

// ---------------------------------------------------------------------------
// buffered raw IQ file reader with readahead thread
// ---------------------------------------------------------------------------
struct CeFile {
    FILE* fp;
    CeRing* ring;
    std::thread reader;
    std::atomic<bool> stop;
    std::atomic<bool> loop;
    std::atomic<uint64_t> position;
    uint64_t file_size;
    size_t chunk;
};

static void ce_file_reader_loop(CeFile* f) {
    std::vector<uint8_t> buf(f->chunk);
    while (!f->stop.load()) {
        if (ce_ring_occupancy(f->ring) + f->chunk > f->ring->capacity) {
            std::this_thread::sleep_for(std::chrono::microseconds(200));
            continue;
        }
        size_t got = std::fread(buf.data(), 1, f->chunk, f->fp);
        if (got > 0) {
            ce_ring_put(f->ring, buf.data(), got);
            f->position.fetch_add(got);
        }
        if (got < f->chunk) {
            if (!f->loop.load()) break;
            std::fseek(f->fp, 0, SEEK_SET);
            f->position.store(0);
        }
    }
}

CeFile* ce_file_open(const char* path, size_t buffer_bytes,
                     size_t chunk_bytes, int loop) {
    FILE* fp = std::fopen(path, "rb");
    if (fp == nullptr) return nullptr;
    auto* f = new CeFile();
    f->fp = fp;
    f->ring = ce_ring_create(buffer_bytes);
    f->stop = false;
    f->loop = loop != 0;
    f->position = 0;
    f->chunk = chunk_bytes;
    std::fseek(fp, 0, SEEK_END);
    f->file_size = static_cast<uint64_t>(std::ftell(fp));
    std::fseek(fp, 0, SEEK_SET);
    f->reader = std::thread(ce_file_reader_loop, f);
    return f;
}

int ce_file_read(CeFile* f, uint8_t* dst, size_t n, double timeout_s) {
    if (!ce_ring_wait_for_size(f->ring, n, timeout_s)) {
        // stream may have ended (no loop): drain what remains
        return 0;
    }
    return ce_ring_get(f->ring, dst, n);
}

uint64_t ce_file_size(CeFile* f) { return f->file_size; }
uint64_t ce_file_position(CeFile* f) { return f->position.load(); }

void ce_file_close(CeFile* f) {
    if (f == nullptr) return;
    f->stop.store(true);
    ce_ring_close(f->ring);
    if (f->reader.joinable()) f->reader.join();
    std::fclose(f->fp);
    ce_ring_destroy(f->ring);
    delete f;
}

// ---------------------------------------------------------------------------
// hot host-path kernels
//
// The reference runs these on the GPU render stack (turbo LUT in the
// lineplot/waterfall shaders, src/domains/visualization/lineplot/
// module_impl.cc) or in C++ SDR ingest (CS8/CS16 sample converters).
// Here they are the native legs of the host-side present/ingest
// paths: the per-frame colormap rasterization feeding the WS stream
// and the fixed-point IQ / PCM format converters.
// ---------------------------------------------------------------------------

// norm (n floats in [0,1], NaN/inf tolerated) -> RGBA8 via a
// (lut_size, 3) u8 LUT.
void ce_colormap(const float* norm, uint8_t* rgba, size_t n,
                 const uint8_t* lut, int lut_size) {
    const int maxi = lut_size - 1;
    const float scale = static_cast<float>(maxi);
    for (size_t i = 0; i < n; ++i) {
        float v = norm[i];
        if (!(v >= 0.0f)) v = 0.0f;        // NaN and negatives -> 0
        if (v > 1.0f) v = 1.0f;
        int idx = static_cast<int>(v * scale);
        if (idx > maxi) idx = maxi;
        const uint8_t* c = lut + idx * 3;
        uint8_t* o = rgba + i * 4;
        o[0] = c[0];
        o[1] = c[1];
        o[2] = c[2];
        o[3] = 255;
    }
}

// interleaved signed 8-bit IQ -> float32 pairs (scale 1/127)
void ce_ci8_to_f32(const int8_t* in, float* out, size_t n_pairs) {
    const float s = 1.0f / 127.0f;
    for (size_t i = 0; i < 2 * n_pairs; ++i) {
        out[i] = in[i] * s;
    }
}

// interleaved signed 16-bit IQ -> float32 pairs (scale 1/32767)
void ce_ci16_to_f32(const int16_t* in, float* out, size_t n_pairs) {
    const float s = 1.0f / 32767.0f;
    for (size_t i = 0; i < 2 * n_pairs; ++i) {
        out[i] = in[i] * s;
    }
}

// float32 PCM -> signed 16-bit with clamp (audio sinks/players)
void ce_f32_to_s16(const float* in, int16_t* out, size_t n) {
    for (size_t i = 0; i < n; ++i) {
        float v = in[i] * 32767.0f;
        if (v > 32767.0f) v = 32767.0f;
        if (v < -32768.0f) v = -32768.0f;
        out[i] = static_cast<int16_t>(v);
    }
}

// ---------------------------------------------------------------------------
// clock helpers
// ---------------------------------------------------------------------------
double ce_monotonic() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

void ce_precise_sleep(double seconds) {
    // sleep-then-spin for sub-millisecond pacing accuracy
    auto deadline = std::chrono::steady_clock::now() +
                    std::chrono::duration<double>(seconds);
    if (seconds > 0.002) {
        std::this_thread::sleep_for(
            std::chrono::duration<double>(seconds - 0.0015));
    }
    while (std::chrono::steady_clock::now() < deadline) {
        std::this_thread::yield();
    }
}

}  // extern "C"
