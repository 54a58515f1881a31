// Native batch assembly for the streaming dataset loaders — the C++
// equivalent of the reference's C data_loader/ layer (bcnn_mnist_loader.c,
// bcnn_cifar10_loader.c driven by bcnn_loader_next, bcnn_data.c:392-427).
//
// The Python side mmaps the dataset files and keeps the stream positions in
// its file objects (preserving the reference's sequential-FILE*-as-iterator
// semantics, including auto-rewind past the header at EOF and the eval
// stream rewind on mode switch); these kernels assemble a whole batch —
// record decode, center crop, CHW conversion, normalization, one-hot — in
// one call, OpenMP-parallel over samples. Used when no host augmentation is
// active (augmented paths go through the per-sample Python/bip route, which
// shares the RNG stream with the pure-Python fallback); outputs are
// bit-identical to the Python loaders (test-gated).

#include <cstdint>
#include <cstddef>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// idx-format MNIST pair. Positions advance like the per-sample reader:
// below-header positions snap to the first record, end-of-data rewinds to
// it (bcnn_mnist_loader.c:107-116). normalize: 0 -> raw float pixels,
// 1 -> (v - 127.5) * (1/127.5) (bcnn_convert_img_to_float defaults).
// Returns 0, or -1 on malformed data (caller raises).
int bcnn_loader_mnist_batch(const uint8_t* img, long img_len,
                            const uint8_t* lbl, long lbl_len,
                            long* img_pos, long* lbl_pos,
                            int batch, int img_h, int img_w,
                            int out_h, int out_w, int normalize,
                            float* out_x, float* out_y, int label_sz) {
    const long sz = (long)img_h * img_w;
    if (img_len < 16 + sz || lbl_len < 8 + 1) return -1;
    if (out_h > img_h || out_w > img_w) return -1;
    long ip = *img_pos, lp = *lbl_pos;
    std::vector<long> offs(batch), loffs(batch);
    for (int i = 0; i < batch; ++i) {
        if (ip < 16 || ip + sz > img_len) ip = 16;
        if (lp < 8 || lp + 1 > lbl_len) lp = 8;
        offs[i] = ip;
        loffs[i] = lp;
        ip += sz;
        lp += 1;
    }
    const int oy0 = (img_h - out_h) / 2, ox0 = (img_w - out_w) / 2;
    const float coeff = (float)(1.0 / 127.5);
    int bad = 0;
#pragma omp parallel for schedule(static)
    for (int i = 0; i < batch; ++i) {
        const uint8_t* s = img + offs[i];
        float* d = out_x + (size_t)i * out_h * out_w;
        for (int y = 0; y < out_h; ++y) {
            const uint8_t* row = s + (size_t)(y + oy0) * img_w + ox0;
            float* drow = d + (size_t)y * out_w;
            if (normalize) {
                for (int x = 0; x < out_w; ++x)
                    drow[x] = ((float)row[x] - 127.5f) * coeff;
            } else {
                for (int x = 0; x < out_w; ++x)
                    drow[x] = (float)row[x];
            }
        }
        int v = lbl[loffs[i]];
        if (v >= label_sz) {
#pragma omp atomic write
            bad = 1;
        } else {
            out_y[(size_t)i * label_sz + v] = 1.0f;
        }
    }
    if (bad) return -1;
    *img_pos = ip;
    *lbl_pos = lp;
    return 0;
}

// CIFAR-10 binary: per record 1 label byte + 3072 CHW bytes
// (bcnn_cifar10_loader.c:69-171). Normalization (v - mean[src_ch]) * coeff
// with optional BGR swap of the OUTPUT channel, exactly
// bcnn_convert_img_to_float. Rewinds to 0 at end-of-data.
int bcnn_loader_cifar_batch(const uint8_t* buf, long buf_len, long* pos,
                            int batch, int swap_bgr,
                            float mr, float mg, float mb, float coeff,
                            float* out_x, float* out_y, int label_sz) {
    const int H = 32, W = 32, C = 3;
    const long rec = 1 + (long)C * H * W;
    if (buf_len < rec) return -1;
    long p = *pos;
    std::vector<long> offs(batch);
    for (int i = 0; i < batch; ++i) {
        if (p < 0 || p + rec > buf_len) p = 0;
        offs[i] = p;
        p += rec;
    }
    const float mean[3] = {mr, mg, mb};
    int bad = 0;
#pragma omp parallel for schedule(static)
    for (int i = 0; i < batch; ++i) {
        const uint8_t* r = buf + offs[i];
        int v = r[0];
        if (v >= label_sz) {
#pragma omp atomic write
            bad = 1;
            continue;
        }
        out_y[(size_t)i * label_sz + v] = 1.0f;
        const uint8_t* chw = r + 1;
        float* d = out_x + (size_t)i * C * H * W;
        for (int k = 0; k < C; ++k) {
            int ok = swap_bgr ? (C - 1 - k) : k;
            const uint8_t* s = chw + (size_t)k * H * W;
            float* dk = d + (size_t)ok * H * W;
            const float m = mean[k];
            for (int j = 0; j < H * W; ++j)
                dk[j] = ((float)s[j] - m) * coeff;
        }
    }
    if (bad) return -1;
    *pos = p;
    return 0;
}

}  // extern "C"

extern "C" {

// BCRD raw-record batch gather (bcnn_tpu/data/records.py): records of
// (px uint8 pixels, label_sz float32 labels) starting at `hdr`; copies
// `batch` records starting at record index *pos (wrapping at n) into
// out_x (uint8) / out_y (float32) and advances *pos. Pure memcpy work,
// OpenMP across records.
int bcnn_loader_records_batch(const uint8_t* buf, long hdr, long n,
                              long px, long label_sz, long* pos,
                              int batch, uint8_t* out_x, float* out_y) {
    if (n <= 0 || px <= 0) return -1;
    const long rec = px + label_sz * 4;
    long p = *pos % n;
    std::vector<long> idx(batch);
    for (int i = 0; i < batch; ++i) {
        idx[i] = p;
        p = (p + 1) % n;
    }
#pragma omp parallel for schedule(static)
    for (int i = 0; i < batch; ++i) {
        const uint8_t* r = buf + hdr + idx[i] * rec;
        memcpy(out_x + (size_t)i * px, r, (size_t)px);
        memcpy(out_y + (size_t)i * label_sz, r + px,
               (size_t)label_sz * 4);
    }
    *pos = p;
    return 0;
}

}  // extern "C"
