// Native JPEG/PNG decode for the list-format dataset loaders — the C++
// answer to the reference's stb_image decode-at-train-time path
// (src/bip/src/bip.c:1837 bip_load_image). Built on the system
// libjpeg/libpng (the same codecs Pillow wraps), so outputs are
// bit-identical to the PIL fallback for PNG and for same-codec JPEG;
// the win is the removal of the Python/PIL per-image plumbing and the
// OpenMP batch entry point for multi-core hosts.
//
// Channel policy matches bcnn_tpu.bip.ops.load_image: grayscale stays
// 1 channel, everything else (palette, RGBA, 16-bit) lands as 8-bit RGB
// with alpha dropped (PIL convert("RGB") drops alpha the same way).

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <png.h>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// ---------------------------------------------------------------- PNG --

struct PngReadState {
    const uint8_t* data;
    size_t len;
    size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
    PngReadState* s = (PngReadState*)png_get_io_ptr(png);
    if (s->pos + n > s->len) {
        png_error(png, "truncated PNG");
        return;
    }
    memcpy(out, s->data + s->pos, n);
    s->pos += n;
}

int decode_png(const uint8_t* data, long len, uint8_t* out, long cap,
               int* w, int* h, int* c) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) return -1;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return -1;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return -1;
    }
    PngReadState st{data, (size_t)len, 0};
    png_set_read_fn(png, &st, png_mem_read);
    png_read_info(png, info);

    png_uint_32 pw, ph;
    int depth, color;
    png_get_IHDR(png, info, &pw, &ph, &depth, &color, nullptr, nullptr,
                 nullptr);
    // normalize to 8-bit; palette -> RGB; alpha dropped; gray stays gray
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (depth == 16) png_set_strip_16(png);
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) {
        png_set_tRNS_to_alpha(png);
        png_set_strip_alpha(png);
    }
    // gray+alpha -> gray (alpha stripped above); keep 1 channel
    png_read_update_info(png, info);
    int ch = png_get_channels(png, info);
    if (ch == 2) {  // gray+alpha not fully stripped: force gray
        png_set_strip_alpha(png);
        png_read_update_info(png, info);
        ch = png_get_channels(png, info);
    }
    *w = (int)pw;
    *h = (int)ph;
    *c = ch;
    long need = (long)pw * ph * ch;
    if (need > cap) {
        png_destroy_read_struct(&png, &info, nullptr);
        return -2;  // caller re-allocates using *w/*h/*c
    }
    std::vector<png_bytep> rows(ph);
    for (png_uint_32 y = 0; y < ph; ++y)
        rows[y] = out + (size_t)y * pw * ch;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
}

// --------------------------------------------------------------- JPEG --

struct JpegErr {
    jpeg_error_mgr pub;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = (JpegErr*)cinfo->err;
    longjmp(e->jb, 1);
}

int decode_jpeg(const uint8_t* data, long len, uint8_t* out, long cap,
                int* w, int* h, int* c) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, (unsigned char*)data, (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    // gray stays gray; everything else to RGB (CMYK/YCCK included)
    cinfo.out_color_space =
        (cinfo.jpeg_color_space == JCS_GRAYSCALE) ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_start_decompress(&cinfo);
    int ch = cinfo.output_components;
    *w = (int)cinfo.output_width;
    *h = (int)cinfo.output_height;
    *c = ch;
    long need = (long)cinfo.output_width * cinfo.output_height * ch;
    if (need > cap) {
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row =
            out + (size_t)cinfo.output_scanline * cinfo.output_width * ch;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

}  // namespace

extern "C" {

// Decode one in-memory JPEG/PNG blob (dispatch on magic bytes) into the
// caller's HWC uint8 buffer of capacity `cap` bytes. Returns 0 on
// success (dims in *w/*h/*c), -2 if the buffer is too small (dims are
// still filled — probe-then-decode uses cap=0), -1 on decode error.
int bcnn_decode_image(const uint8_t* data, long len, uint8_t* out,
                      long cap, int* w, int* h, int* c) {
    if (len >= 8 && data[0] == 0x89 && data[1] == 'P' && data[2] == 'N' &&
        data[3] == 'G')
        return decode_png(data, len, out, cap, w, h, c);
    if (len >= 3 && data[0] == 0xFF && data[1] == 0xD8)
        return decode_jpeg(data, len, out, cap, w, h, c);
    return -1;
}

// Batch decode: n blobs (concatenated in `data` at offsets[i],
// sizes[i]) decoded OpenMP-parallel, each into outs + out_offsets[i]
// with capacity caps[i]. Per-image status codes land in `status`
// (semantics as bcnn_decode_image); dims in ws/hs/cs. Returns 0 if
// every image decoded, else -1 (caller inspects `status`).
int bcnn_decode_batch(const uint8_t* data, const long* offsets,
                      const long* sizes, int n, uint8_t* outs,
                      const long* out_offsets, const long* caps,
                      int* ws, int* hs, int* cs, int* status) {
    int any_bad = 0;
#pragma omp parallel for schedule(dynamic)
    for (int i = 0; i < n; ++i) {
        status[i] = bcnn_decode_image(
            data + offsets[i], sizes[i], outs + out_offsets[i], caps[i],
            &ws[i], &hs[i], &cs[i]);
        if (status[i] != 0) {
#pragma omp atomic write
            any_bad = 1;
        }
    }
    return any_bad ? -1 : 0;
}

}  // extern "C"
