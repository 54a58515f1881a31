// Native host-side image kernels for bcnn-tpu.
//
// The reference implements these in C with AVX/NEON (src/bip/src/bip.c);
// on a TPU host the device does the math and the host's job is feeding it,
// so these kernels optimize the CPU-bound preprocessing path: crop, flip,
// bilinear resize, fixed-point rotate/contrast, brightness, perlin
// distortion, and the uint8-HWC -> float32-CHW normalization that feeds the
// input tensor. Exposed as a plain C ABI consumed via ctypes
// (bcnn_tpu/bip/native.py); OpenMP parallelizes the batched entry points.
//
// Semantics intentionally identical to the numpy implementations in
// bcnn_tpu/bip/ops.py (which mirror the reference's bip.c) — the test suite
// cross-checks the two.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline uint8_t clamp_u8(int32_t v) {
    return (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
}

}  // namespace

extern "C" {

// dst must be pre-filled with the pad value; copies the overlapping window
// (bip.c:319-349 semantics).
void bcnn_bip_crop(const uint8_t* src, int sh, int sw, int c, int x_ul,
                   int y_ul, uint8_t* dst, int dh, int dw) {
    int off_x = std::max(0, -x_ul);
    int off_y = std::max(0, -y_ul);
    int osx = std::max(0, x_ul);
    int osy = std::max(0, y_ul);
    int cw = std::min(sw - osx, dw - off_x);
    int ch = std::min(sh - osy, dh - off_y);
    if (cw <= 0 || ch <= 0) return;
    for (int y = 0; y < ch; ++y) {
        std::memcpy(dst + ((off_y + y) * dw + off_x) * c,
                    src + ((osy + y) * sw + osx) * c, (size_t)cw * c);
    }
}

void bcnn_bip_fliph(const uint8_t* src, int h, int w, int c, uint8_t* dst) {
    for (int y = 0; y < h; ++y) {
        const uint8_t* s = src + (size_t)y * w * c;
        uint8_t* d = dst + (size_t)y * w * c;
        for (int x = 0; x < w; ++x) {
            std::memcpy(d + (size_t)x * c, s + (size_t)(w - 1 - x) * c, c);
        }
    }
}

// Half-pixel bilinear resize (bip.c:1077-1200 index math, float weights).
void bcnn_bip_resize_bilinear(const uint8_t* src, int sh, int sw, int c,
                              uint8_t* dst, int dh, int dw) {
    std::vector<int> ix(dw), iy(dh);
    std::vector<float> ax(dw), ay(dh);
    auto axis = [](int dst_n, int src_n, int* idx, float* a) {
        double scale = (double)src_n / dst_n;
        for (int i = 0; i < dst_n; ++i) {
            double alpha = (i + 0.5) * scale - 0.5;
            int index = (int)std::floor(alpha);
            double frac = alpha - index;
            if (index < 0) { index = 0; frac = 0.0; }
            if (index > src_n - 2) { index = src_n - 2; frac = 1.0; }
            idx[i] = index;
            a[i] = (float)frac;
        }
    };
    axis(dw, sw, ix.data(), ax.data());
    axis(dh, sh, iy.data(), ay.data());
    for (int y = 0; y < dh; ++y) {
        const uint8_t* r0 = src + (size_t)iy[y] * sw * c;
        const uint8_t* r1 = r0 + (size_t)sw * c;
        float fy = ay[y];
        uint8_t* d = dst + (size_t)y * dw * c;
        for (int x = 0; x < dw; ++x) {
            int x0 = ix[x];
            float fx = ax[x];
            for (int k = 0; k < c; ++k) {
                float top = r0[x0 * c + k] * (1 - fx) + r0[(x0 + 1) * c + k] * fx;
                float bot = r1[x0 * c + k] * (1 - fx) + r1[(x0 + 1) * c + k] * fx;
                float v = top * (1 - fy) + bot * fy + 0.5f;
                d[x * c + k] = clamp_u8((int32_t)v);
            }
        }
    }
}

// 16.16 fixed-point inverse-map bilinear rotate (bip.c:1202-1307).
void bcnn_bip_rotate(const uint8_t* src, int h, int w, int c, uint8_t* dst,
                     float angle, int cx, int cy) {
    int64_t cosa = (int64_t)(std::cos(angle) * 65536);
    int64_t sina = (int64_t)(std::sin(angle) * 65536);
    int64_t tx0 = (int64_t)cx << 16;
    int64_t ty0 = (int64_t)cy << 16;
    for (int y = 0; y < h; ++y) {
        int64_t ty = y - cy;
        for (int x = 0; x < w; ++x) {
            int64_t tx = x - cx;
            int64_t rx = cosa * tx - sina * ty + tx0;
            int64_t ry = sina * tx + cosa * ty + ty0;
            int64_t xm = rx >> 16;
            int64_t ym = ry >> 16;
            uint8_t* d = dst + ((size_t)y * w + x) * c;
            if (xm >= 0 && xm < w - 1 && ym >= 0 && ym < h - 1) {
                float xd = (float)(rx - (xm << 16)) / 65536.0f;
                float yd = (float)(ry - (ym << 16)) / 65536.0f;
                const uint8_t* s = src + ((size_t)ym * w + xm) * c;
                for (int k = 0; k < c; ++k) {
                    float v = s[k] * (1 - xd) * (1 - yd) +
                              s[c + k] * xd * (1 - yd) +
                              s[(size_t)w * c + k] * (1 - xd) * yd +
                              s[(size_t)(w + 1) * c + k] * xd * yd;
                    d[k] = (uint8_t)v;  // truncation, like the reference
                }
            } else {
                std::memset(d, 0, c);
            }
        }
    }
}

// 12-bit fixed-point mean-centered contrast (bip.c:85-130).
void bcnn_bip_contrast(const uint8_t* src, int h, int w, int c, uint8_t* dst,
                       float contrast) {
    int64_t cc = (int64_t)(contrast * 4096 + 0.5f);
    std::vector<int64_t> mean(c, 0);
    for (size_t i = 0; i < (size_t)h * w; ++i) {
        for (int k = 0; k < c; ++k) mean[k] += src[i * c + k];
    }
    for (int k = 0; k < c; ++k) mean[k] /= (int64_t)h * w;
    for (size_t i = 0; i < (size_t)h * w; ++i) {
        for (int k = 0; k < c; ++k) {
            int64_t pix = (((src[i * c + k] - mean[k]) * cc + 2048) >> 12) +
                          mean[k];
            dst[i * c + k] = clamp_u8((int32_t)pix);
        }
    }
}

void bcnn_bip_brightness(const uint8_t* src, int n, uint8_t* dst,
                         int brightness) {
    for (int i = 0; i < n; ++i) {
        dst[i] = clamp_u8((int32_t)src[i] + brightness);
    }
}

// HWC uint8 -> CHW float32 (x - mean)*coeff, optional BGR swap
// (bcnn_convert_img_to_float, bcnn_data.c:70-100).
void bcnn_bip_to_float_chw(const uint8_t* src, int h, int w, int c,
                           float coeff, int swap_bgr, const float* mean,
                           float* dst) {
    for (int k = 0; k < c; ++k) {
        int out_k = swap_bgr ? (c - 1 - k) : k;
        float m = mean[k];
        float* d = dst + (size_t)out_k * h * w;
        const uint8_t* s = src + k;
        for (size_t i = 0; i < (size_t)h * w; ++i) {
            d[i] = ((float)s[i * c] - m) * coeff;
        }
    }
}

// Batched variant: n images HWC u8 -> (n, c, h, w) float, OpenMP over the
// batch — the hot path feeding the device.
void bcnn_bip_batch_to_float_chw(const uint8_t* src, int n, int h, int w,
                                 int c, float coeff, int swap_bgr,
                                 const float* mean, float* dst) {
#pragma omp parallel for schedule(static)
    for (int i = 0; i < n; ++i) {
        bcnn_bip_to_float_chw(src + (size_t)i * h * w * c, h, w, c, coeff,
                              swap_bgr, mean, dst + (size_t)i * c * h * w);
    }
}

// bcnn_set_num_threads analogue (bcnn_net.c:185-232): caps the OpenMP
// pool used by every native host kernel (bip + batched loader).
void bcnn_bip_set_num_threads(int n) {
#ifdef _OPENMP
    if (n > 0) omp_set_num_threads(n);
#endif
}

int bcnn_bip_num_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
