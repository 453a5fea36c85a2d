// openhush native runtime: lock-free SPSC audio ring buffer + sequential DSP.
//
// TPU-native counterpart of the reference's hot host-side paths:
// - ring buffer: lock-free single-producer/single-consumer with a
//   power-of-two capacity, monotonic write position and acquire/release
//   ordering (same safety argument as src/input/ring_buffer.rs:38-65) —
//   the audio-callback thread pushes without taking the GIL or any lock.
// - DSP: the compressor/limiter envelope followers are first-order IIRs
//   with data-dependent coefficients; they are inherently sequential, which
//   makes them slow both as Python loops and as lax.scan on TPU (1 element
//   per step). Semantics mirror src/input/audio.rs:131-247.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <new>

extern "C" {

// ---------------------------------------------------------------------------
// SPSC ring buffer
// ---------------------------------------------------------------------------

struct OhRing {
    float* buf;
    uint64_t capacity;   // power of two
    uint64_t mask;
    std::atomic<uint64_t> write_pos;   // monotonic
};

OhRing* oh_ring_create(uint64_t min_capacity) {
    uint64_t cap = 1;
    while (cap < min_capacity) cap <<= 1;
    auto* r = new (std::nothrow) OhRing;
    if (!r) return nullptr;
    r->buf = new (std::nothrow) float[cap]();
    if (!r->buf) { delete r; return nullptr; }
    r->capacity = cap;
    r->mask = cap - 1;
    r->write_pos.store(0, std::memory_order_relaxed);
    return r;
}

void oh_ring_destroy(OhRing* r) {
    if (!r) return;
    delete[] r->buf;
    delete r;
}

uint64_t oh_ring_capacity(const OhRing* r) { return r->capacity; }

// Producer side (single thread): copy samples, then publish with release.
void oh_ring_push(OhRing* r, const float* samples, uint64_t n) {
    if (n > r->capacity) {              // keep only the newest capacity
        samples += n - r->capacity;
        n = r->capacity;
    }
    uint64_t pos = r->write_pos.load(std::memory_order_relaxed);
    uint64_t start = pos & r->mask;
    uint64_t first = n < (r->capacity - start) ? n : (r->capacity - start);
    std::memcpy(r->buf + start, samples, first * sizeof(float));
    if (first < n)
        std::memcpy(r->buf, samples + first, (n - first) * sizeof(float));
    r->write_pos.store(pos + n, std::memory_order_release);
}

// Consumer side: snapshot position with acquire.
uint64_t oh_ring_position(const OhRing* r) {
    return r->write_pos.load(std::memory_order_acquire);
}

// Extract [from_pos, to_pos) into out (caller sizes it). Returns the number
// of samples written; spans beyond capacity clamp to the newest samples
// (parity: extract_range, ring_buffer.rs:240-280).
uint64_t oh_ring_extract(const OhRing* r, uint64_t from_pos,
                         uint64_t to_pos, float* out) {
    if (to_pos <= from_pos) return 0;
    uint64_t requested = to_pos - from_pos;
    uint64_t available = requested < r->capacity ? requested : r->capacity;
    if (requested > r->capacity) from_pos = to_pos - r->capacity;
    uint64_t start = from_pos & r->mask;
    uint64_t first = available < (r->capacity - start)
                         ? available : (r->capacity - start);
    std::memcpy(out, r->buf + start, first * sizeof(float));
    if (first < available)
        std::memcpy(out + first, r->buf, (available - first) * sizeof(float));
    return available;
}

// ---------------------------------------------------------------------------
// Sequential DSP (envelope followers)
// ---------------------------------------------------------------------------

// Dynamic-range compressor, in place. Parity: src/input/audio.rs:131-196.
void oh_dsp_compress(float* x, uint64_t n, float threshold_db, float ratio,
                     float attack_ms, float release_ms,
                     float makeup_gain_db, float sample_rate) {
    if (n == 0 || ratio <= 1.0f) return;
    const float threshold = std::pow(10.0f, threshold_db / 20.0f);
    const float attack = std::exp(-1.0f / (attack_ms * sample_rate / 1000.0f));
    const float release = std::exp(-1.0f / (release_ms * sample_rate / 1000.0f));
    float env = 0.0f;
    for (uint64_t i = 0; i < n; ++i) {
        float a = std::fabs(x[i]);
        float coeff = a > env ? attack : release;
        env = coeff * env + (1.0f - coeff) * a;
        float gain = 1.0f;
        if (env > threshold) {
            float over_db = 20.0f * std::log10(env / threshold);
            float reduction_db = over_db - over_db / ratio;
            gain = std::pow(10.0f, -reduction_db / 20.0f);
        }
        x[i] *= gain;
    }
    if (makeup_gain_db != 0.0f) {
        const float g = std::pow(10.0f, makeup_gain_db / 20.0f);
        for (uint64_t i = 0; i < n; ++i) x[i] *= g;
    }
}

// Brick-wall limiter, in place. Parity: src/input/audio.rs:198-247.
void oh_dsp_limit(float* x, uint64_t n, float ceiling_db, float release_ms,
                  float sample_rate) {
    if (n == 0) return;
    const float ceiling = std::pow(10.0f, ceiling_db / 20.0f);
    const float release = std::exp(-1.0f / (release_ms * sample_rate / 1000.0f));
    float gain = 1.0f;
    for (uint64_t i = 0; i < n; ++i) {
        float a = std::fabs(x[i]);
        float target = a > ceiling ? ceiling / a : 1.0f;
        if (target < gain) gain = target;               // instant attack
        else gain = release * gain + (1.0f - release) * target;
        x[i] *= gain;
    }
}

// RMS in dB (-inf → -1e30f sentinel). Parity: src/input/audio.rs:86-101.
float oh_dsp_rms_db(const float* x, uint64_t n) {
    if (n == 0) return -1e30f;
    double sum = 0.0;
    for (uint64_t i = 0; i < n; ++i) sum += (double)x[i] * x[i];
    double rms = std::sqrt(sum / (double)n);
    if (rms <= 0.0) return -1e30f;
    return 20.0f * (float)std::log10(rms);
}

}  // extern "C"
