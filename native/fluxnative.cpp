// fluxnative — native host-side runtime components for flux_tpu.
//
// The reference is 100% native (Rust); on TPU the compute path is compiled
// by XLA, but host-side hot paths still deserve native code.  The first one
// is the 16-bit ASCII PPM encoder (the reference writes it with buffered
// Rust I/O, fluxcore/src/image.rs:43-61): an 800x600 frame is 1.44M
// formatted integers, which costs ~1s in pure Python and ~10ms here.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this
// environment).  Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

// Write a non-negative integer < 100000 as decimal, return chars written.
inline int write_u16(char* out, uint32_t v) {
    char tmp[8];
    int n = 0;
    do {
        tmp[n++] = static_cast<char>('0' + (v % 10));
        v /= 10;
    } while (v != 0);
    for (int i = 0; i < n; ++i) out[i] = tmp[n - 1 - i];
    return n;
}

}  // namespace

extern "C" {

// Upper bound of the encoded size for an (h, w) image.
size_t flux_ppm_bound(int32_t h, int32_t w) {
    // header "P3\n<w> <h>\n65535\n" <= 32; per pixel 3 * (5 digits + sep) + 1
    return 32 + static_cast<size_t>(h) * static_cast<size_t>(w) * 19 + 16;
}

// Encode (h, w, 3) float32 pixels in [0, 1] to ASCII P3 with the
// reference's truncating `v * 65535.99` quantization (image.rs:49-52).
// Returns the number of bytes written (<= flux_ppm_bound(h, w)).
size_t flux_ppm_encode(const float* px, int32_t h, int32_t w, char* out) {
    char* p = out;
    std::memcpy(p, "P3\n", 3);
    p += 3;
    p += write_u16(p, static_cast<uint32_t>(w));
    *p++ = ' ';
    p += write_u16(p, static_cast<uint32_t>(h));
    std::memcpy(p, "\n65535\n", 7);
    p += 7;

    const size_t n = static_cast<size_t>(h) * static_cast<size_t>(w);
    for (size_t i = 0; i < n; ++i) {
        const float* c = px + i * 3;
        for (int k = 0; k < 3; ++k) {
            double v = static_cast<double>(c[k]) * 65535.99;
            if (v < 0.0) v = 0.0;
            uint32_t q = static_cast<uint32_t>(v);  // truncation, as image.rs
            if (q > 65535u) q = 65535u;
            p += write_u16(p, q);
            *p++ = (k == 2) ? '\n' : ' ';
        }
    }
    return static_cast<size_t>(p - out);
}

// Quantize (n,) float32 in [0,1] to uint16 with the same truncation rule.
void flux_quantize_u16(const float* src, uint16_t* dst, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        double v = static_cast<double>(src[i]) * 65535.99;
        if (v < 0.0) v = 0.0;
        uint32_t q = static_cast<uint32_t>(v);
        dst[i] = static_cast<uint16_t>(q > 65535u ? 65535u : q);
    }
}

}  // extern "C"
