// Native host-side image pipeline: fused grayscale + resize + canvas placement.
//
// The TPU-native equivalent of the reference's CPU dataloader worker pool
// (/root/reference/ace_trainer.py:312-321 spawns 12 torch workers doing PIL
// grayscale/resize per image): one OpenMP-parallel pass per batch that
//   1. converts RGB (or grayscale) uint8 to ITU-R 601 luma,
//   2. resizes so the short side matches `short_size` — area averaging for
//      downscale (antialiased, matching PIL semantics), bilinear for upscale,
//   3. centers the result on the shared static canvas.
// Exposed as a C ABI for ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -shared -fPIC -fopenmp -o libacezero_canvas.so canvas.cpp

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline float luma(const uint8_t* px, int channels) {
    if (channels == 1) return static_cast<float>(px[0]);
    return 0.299f * px[0] + 0.587f * px[1] + 0.114f * px[2];
}

// Area-average resample of one output pixel from the source footprint.
inline float area_sample(const float* gray, int in_h, int in_w,
                         float y0, float y1, float x0, float x1) {
    int iy0 = std::max(0, static_cast<int>(std::floor(y0)));
    int iy1 = std::min(in_h, static_cast<int>(std::ceil(y1)));
    int ix0 = std::max(0, static_cast<int>(std::floor(x0)));
    int ix1 = std::min(in_w, static_cast<int>(std::ceil(x1)));

    float total = 0.f, weight = 0.f;
    for (int y = iy0; y < iy1; ++y) {
        float wy = std::min<float>(y + 1.f, y1) - std::max<float>(static_cast<float>(y), y0);
        if (wy <= 0) continue;
        const float* row = gray + static_cast<size_t>(y) * in_w;
        for (int x = ix0; x < ix1; ++x) {
            float wx = std::min<float>(x + 1.f, x1) - std::max<float>(static_cast<float>(x), x0);
            if (wx <= 0) continue;
            total += row[x] * wy * wx;
            weight += wy * wx;
        }
    }
    return weight > 0 ? total / weight : 0.f;
}

inline float bilinear_sample(const float* gray, int in_h, int in_w, float sy, float sx) {
    sy = std::min(std::max(sy, 0.f), static_cast<float>(in_h - 1));
    sx = std::min(std::max(sx, 0.f), static_cast<float>(in_w - 1));
    int y0 = static_cast<int>(sy), x0 = static_cast<int>(sx);
    int y1 = std::min(y0 + 1, in_h - 1), x1 = std::min(x0 + 1, in_w - 1);
    float fy = sy - y0, fx = sx - x0;
    const float* r0 = gray + static_cast<size_t>(y0) * in_w;
    const float* r1 = gray + static_cast<size_t>(y1) * in_w;
    return r0[x0] * (1 - fy) * (1 - fx) + r0[x1] * (1 - fy) * fx +
           r1[x0] * fy * (1 - fx) + r1[x1] * fy * fx;
}

}  // namespace

extern "C" {

// Process one image: rgb (in_h*in_w*channels u8) -> canvas (canvas_h*canvas_w u8),
// content resized to (out_h, out_w) and centered. Returns 0 on success.
int acz_gray_resize_center(const uint8_t* rgb, int in_h, int in_w, int channels,
                           uint8_t* canvas, int canvas_h, int canvas_w,
                           int out_h, int out_w) {
    if (out_h > canvas_h || out_w > canvas_w || channels < 1) return 1;

    std::vector<float> gray(static_cast<size_t>(in_h) * in_w);
    for (int y = 0; y < in_h; ++y) {
        const uint8_t* src = rgb + static_cast<size_t>(y) * in_w * channels;
        float* dst = gray.data() + static_cast<size_t>(y) * in_w;
        for (int x = 0; x < in_w; ++x) dst[x] = luma(src + static_cast<size_t>(x) * channels, channels);
    }

    const float sy = static_cast<float>(in_h) / out_h;
    const float sx = static_cast<float>(in_w) / out_w;
    const bool downscale = sy >= 1.f && sx >= 1.f;
    const int y_off = (canvas_h - out_h) / 2;
    const int x_off = (canvas_w - out_w) / 2;

    for (int y = 0; y < out_h; ++y) {
        uint8_t* dst = canvas + static_cast<size_t>(y + y_off) * canvas_w + x_off;
        for (int x = 0; x < out_w; ++x) {
            float v;
            if (downscale) {
                v = area_sample(gray.data(), in_h, in_w, y * sy, (y + 1) * sy, x * sx, (x + 1) * sx);
            } else {
                v = bilinear_sample(gray.data(), in_h, in_w, (y + 0.5f) * sy - 0.5f, (x + 0.5f) * sx - 0.5f);
            }
            dst[x] = static_cast<uint8_t>(std::min(std::max(v + 0.5f, 0.f), 255.f));
        }
    }
    return 0;
}

// Batched variant over images with per-image geometry; OpenMP-parallel.
// offsets index into the packed rgb buffer.
int acz_gray_resize_center_batch(const uint8_t* rgb_packed, const int64_t* offsets,
                                 const int* in_hw, const int* channels,
                                 uint8_t* canvases, int n, int canvas_h, int canvas_w,
                                 const int* out_hw) {
    int status = 0;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
    for (int i = 0; i < n; ++i) {
        int rc = acz_gray_resize_center(
            rgb_packed + offsets[i], in_hw[2 * i], in_hw[2 * i + 1], channels[i],
            canvases + static_cast<size_t>(i) * canvas_h * canvas_w, canvas_h, canvas_w,
            out_hw[2 * i], out_hw[2 * i + 1]);
        if (rc != 0) status = rc;
    }
    return status;
}

int acz_version() { return 1; }

}  // extern "C"
