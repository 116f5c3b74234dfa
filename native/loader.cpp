// Native host data-loader: JPEG/PNG decode + letterbox resize.
//
// The TPU-native counterpart of the reference's native data path: yolo-dl's
// hot I/O loop runs through libtorch's C++ image decode inside a par-stream
// pipeline (yolo-dl/src/processor/file_cache.rs:131-223).  Here C++ decodes
// images (libjpeg/libpng), performs the aspect-preserving letterbox resize
// with bilinear sampling, and writes float32 CHW tensors in [0,1] into
// caller-owned buffers — Python's pipeline calls ldr_load via ctypes from
// ITS worker threads (the call is GIL-free and thread-safe: the Loader is
// stateless after construction), with zero copies on the result path.
//
// C ABI:
//   ldr_create(threads, out_h, out_w) -> handle   (threads is ignored)
//   ldr_load(handle, path, out[3*out_h*out_w])    synchronous decode
//   ldr_destroy(handle)
//
// Build: native/build.sh → native/libyolodl_loader.so

#include <cmath>
#include <csetjmp>
#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Image {
    int h = 0, w = 0, c = 0;
    // pre-scaling dims: letterbox GEOMETRY must come from the original
    // image so box transforms stay bit-identical whether or not the JPEG
    // was DCT-scale-decoded (0 = not scaled, use h/w)
    int orig_h = 0, orig_w = 0;
    std::vector<uint8_t> data;  // HWC, 8-bit
};

// letterbox content dims for an (h, w) image into an (out_h, out_w) frame;
// lrint = round-half-even, matching letterbox_geometry (see letterbox_into)
void content_dims(int h, int w, int out_h, int out_w, int* new_h, int* new_w) {
    if ((int64_t)out_h * w <= (int64_t)out_w * h) {
        *new_h = out_h;
        *new_w = (int)lrint((int64_t)w * out_h / (double)h);
        if (*new_w < 1) *new_w = 1;
    } else {
        *new_h = (int)lrint((int64_t)h * out_w / (double)w);
        if (*new_h < 1) *new_h = 1;
        *new_w = out_w;
    }
}

struct JpegErrorMgr {
    jpeg_error_mgr pub;
    jmp_buf jump;
};

void jpeg_error_exit_longjmp(j_common_ptr cinfo) {
    // libjpeg's default error_exit calls exit(); a corrupt JPEG must fail
    // the one decode (rc!=0 → Python PIL fallback), not kill training
    longjmp(reinterpret_cast<JpegErrorMgr*>(cinfo->err)->jump, 1);
}

// target_h/target_w > 0 enables DCT-domain scaled decode: pick the smallest
// libjpeg scale M/8 whose output still covers the letterbox content size, so
// a 4000px photograph headed for a 608px frame decodes ~4-8x less IDCT +
// color-convert work.  Geometry parity is preserved by recording the
// original dims (letterbox_into computes placement from them).
bool decode_jpeg(FILE* f, Image* out, int target_h, int target_w) {
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit_longjmp;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    cinfo.out_color_space = JCS_RGB;
    out->orig_h = (int)cinfo.image_height;
    out->orig_w = (int)cinfo.image_width;
    if (target_h > 0 && target_w > 0) {
        int need_h, need_w;
        content_dims(out->orig_h, out->orig_w, target_h, target_w,
                     &need_h, &need_w);
        // power-of-two scales only (like PIL's draft): fractional M/8
        // scales buy little and visibly soften noisy content; if even 1/2
        // doesn't cover the content, decode at full resolution
        for (int num : {1, 2, 4}) {
            cinfo.scale_num = (unsigned)num;
            cinfo.scale_denom = 8;
            jpeg_calc_output_dimensions(&cinfo);  // honors what the lib supports
            if ((int)cinfo.output_width >= need_w &&
                (int)cinfo.output_height >= need_h)
                break;
            cinfo.scale_num = cinfo.scale_denom = 8;  // reset to full res
        }
        jpeg_calc_output_dimensions(&cinfo);
    }
    jpeg_start_decompress(&cinfo);
    out->w = cinfo.output_width;
    out->h = cinfo.output_height;
    out->c = 3;
    out->data.resize((size_t)out->h * out->w * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out->data.data() + (size_t)cinfo.output_scanline * out->w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return true;
}

bool decode_png(FILE* f, Image* out) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!png) return false;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return false;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    png_init_io(png, f);
    png_read_info(png, info);

    png_set_strip_16(png);
    png_set_palette_to_rgb(png);
    png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    png_set_strip_alpha(png);
    png_set_gray_to_rgb(png);
    png_read_update_info(png, info);

    out->w = png_get_image_width(png, info);
    out->h = png_get_image_height(png, info);
    out->c = 3;
    out->data.resize((size_t)out->h * out->w * 3);
    std::vector<png_bytep> rows(out->h);
    for (int y = 0; y < out->h; ++y)
        rows[y] = out->data.data() + (size_t)y * out->w * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

// target dims enable JPEG scaled decode (0 = always full-resolution)
bool decode_file(const char* path, Image* out, int target_h = 0,
                 int target_w = 0) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    uint8_t magic[8] = {0};
    size_t got = fread(magic, 1, 8, f);
    rewind(f);
    bool ok = false;
    if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
        ok = decode_jpeg(f, out, target_h, target_w);
    } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
        ok = decode_png(f, out);  // PNG has no scaled-decode fast path
    }
    fclose(f);
    return ok;
}

// letterbox into a float32 CHW buffer: integer-rounded geometry, matching
// yolodl_tpu.data.letterbox.letterbox_geometry (parity with the Python path)
void letterbox_into(const Image& img, int out_h, int out_w, float pad, float* out) {
    int new_h, new_w;
    // lrint = round-half-even under the default FP environment, matching
    // Python's round() in letterbox_geometry — half-up here would misplace
    // the content (and thus the box transforms) by 1px on exact halves.
    // Geometry comes from the ORIGINAL dims (scaled JPEG decode changes the
    // sampling source, never the placement), keeping box transforms exact.
    int gh = img.orig_h > 0 ? img.orig_h : img.h;
    int gw = img.orig_w > 0 ? img.orig_w : img.w;
    content_dims(gh, gw, out_h, out_w, &new_h, &new_w);
    int off_y = (out_h - new_h) / 2;
    int off_x = (out_w - new_w) / 2;

    const size_t plane = (size_t)out_h * out_w;
    for (size_t i = 0; i < plane * 3; ++i) out[i] = pad;

    // bilinear resample (align-corners=false, PIL-like box centers)
    const float sy = (float)img.h / new_h;
    const float sx = (float)img.w / new_w;
    for (int y = 0; y < new_h; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        int y0 = (int)fy;
        if (fy < 0) { fy = 0; y0 = 0; }
        int y1 = y0 + 1 < img.h ? y0 + 1 : img.h - 1;
        float wy = fy - y0;
        for (int x = 0; x < new_w; ++x) {
            float fx = (x + 0.5f) * sx - 0.5f;
            int x0 = (int)fx;
            if (fx < 0) { fx = 0; x0 = 0; }
            int x1 = x0 + 1 < img.w ? x0 + 1 : img.w - 1;
            float wx = fx - x0;
            const uint8_t* p00 = &img.data[((size_t)y0 * img.w + x0) * 3];
            const uint8_t* p01 = &img.data[((size_t)y0 * img.w + x1) * 3];
            const uint8_t* p10 = &img.data[((size_t)y1 * img.w + x0) * 3];
            const uint8_t* p11 = &img.data[((size_t)y1 * img.w + x1) * 3];
            const size_t dst = (size_t)(off_y + y) * out_w + (off_x + x);
            for (int ch = 0; ch < 3; ++ch) {
                float v = (1 - wy) * ((1 - wx) * p00[ch] + wx * p01[ch]) +
                          wy * ((1 - wx) * p10[ch] + wx * p11[ch]);
                out[ch * plane + dst] = v / 255.0f;
            }
        }
    }
}

struct Loader {
    int out_h, out_w;
    bool scaled_decode;

    Loader(int h, int w, bool scaled)
        : out_h(h), out_w(w), scaled_decode(scaled) {}
};

}  // namespace

extern "C" {

void* ldr_create(int threads, int out_h, int out_w) {
    (void)threads;  // kept for ABI compatibility; ldr_load is synchronous
    return new Loader(out_h, out_w, /*scaled=*/false);
}

// flags bit 0: JPEG DCT-scaled decode (decode big photos at the smallest
// M/8 scale that still covers the letterbox content — same geometry,
// resampling source is the scaled image)
void* ldr_create2(int threads, int out_h, int out_w, int flags) {
    (void)threads;  // kept for ABI compatibility; ldr_load is synchronous
    return new Loader(out_h, out_w, (flags & 1) != 0);
}

void ldr_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// synchronous decode+letterbox; returns 0 on success
int ldr_load(void* handle, const char* path, float* out) {
    Loader* l = static_cast<Loader*>(handle);
    Image img;
    if (!decode_file(path, &img, l->scaled_decode ? l->out_h : 0,
                     l->scaled_decode ? l->out_w : 0)) return -1;
    letterbox_into(img, l->out_h, l->out_w, 0.5f, out);
    return 0;
}

// ---------------------------------------------------------------------------
// augmentation kernels (the per-record numpy hotspots of the training
// pipeline: random_affine warp ~67 ms and HSV jitter ~52 ms per 608² record
// in numpy/scipy; these run in a few ms)

// Affine warp with scipy.ndimage.affine_transform(order=1, mode="constant",
// cval=0) semantics: output pixel (row, col) samples the input at
// in = m @ (row, col) + off, bilinear, out-of-range taps contribute 0.
// m is row-major 2×2 [m_rr, m_rc, m_cr, m_cc]; src/dst are CHW float32.
void ydl_affine_warp(const float* src, int c, int h, int w,
                     const double* m, const double* off, float* dst) {
    for (int ch = 0; ch < c; ++ch) {
        const float* s = src + (size_t)ch * h * w;
        float* d = dst + (size_t)ch * h * w;
        for (int r = 0; r < h; ++r) {
            double ir_base = m[0] * r + off[0];
            double ic_base = m[2] * r + off[1];
            float* drow = d + (size_t)r * w;
            for (int col = 0; col < w; ++col) {
                double ir = ir_base + m[1] * col;
                double ic = ic_base + m[3] * col;
                // scipy mode="constant": a coordinate outside [0, size-1]
                // yields cval outright (no blending with edge pixels)
                if (ir < 0.0 || ir > h - 1 || ic < 0.0 || ic > w - 1) {
                    drow[col] = 0.f;
                    continue;
                }
                int r0 = (int)ir;
                int c0 = (int)ic;
                int r1 = r0 + 1 < h ? r0 + 1 : h - 1;
                int c1 = c0 + 1 < w ? c0 + 1 : w - 1;
                float fr = (float)(ir - r0);
                float fc = (float)(ic - c0);
                const float* row0 = s + (size_t)r0 * w;
                const float* row1 = s + (size_t)r1 * w;
                float top = row0[c0] + fc * (row0[c1] - row0[c0]);
                float bot = row1[c0] + fc * (row1[c1] - row1[c0]);
                drow[col] = top + fr * (bot - top);
            }
        }
    }
}

// Fused RGB→HSV→(shift)→RGB jitter, in place on a CHW float32 [0,1] image.
// Matches yolodl_tpu/data/color.py (itself tensor.rs:957-1041 parity):
// hue wraps modulo 1, saturation/value clamp to [0,1]; ties in the channel
// max resolve r-then-g like the numpy np.where chain.
void ydl_color_jitter(float* img, int h, int w,
                      float hue_shift, float sat_shift, float val_shift) {
    size_t n = (size_t)h * w;
    float* R = img;
    float* G = img + n;
    float* B = img + 2 * n;
    for (size_t i = 0; i < n; ++i) {
        float r = R[i], g = G[i], b = B[i];
        float maxc = r > g ? (r > b ? r : b) : (g > b ? g : b);
        float minc = r < g ? (r < b ? r : b) : (g < b ? g : b);
        float v = maxc;
        float delta = maxc - minc;
        float s = maxc > 0.f ? delta / maxc : 0.f;
        float hh = 0.f;
        if (delta > 0.f) {
            float rc = (maxc - r) / delta;
            float gc = (maxc - g) / delta;
            float bc = (maxc - b) / delta;
            if (maxc == r) hh = bc - gc;
            else if (maxc == g) hh = 2.f + rc - bc;
            else hh = 4.f + gc - rc;
            hh /= 6.f;
            hh -= std::floor(hh);  // % 1.0
        }
        hh += hue_shift + 1.f;
        hh -= std::floor(hh);
        s += sat_shift;
        s = s < 0.f ? 0.f : (s > 1.f ? 1.f : s);
        v += val_shift;
        v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);

        float h6 = hh * 6.f;
        int sector = ((int)std::floor(h6)) % 6;
        float f = h6 - std::floor(h6);
        float p = v * (1.f - s);
        float q = v * (1.f - s * f);
        float t = v * (1.f - s * (1.f - f));
        switch (sector) {
            case 0: R[i] = v; G[i] = t; B[i] = p; break;
            case 1: R[i] = q; G[i] = v; B[i] = p; break;
            case 2: R[i] = p; G[i] = v; B[i] = t; break;
            case 3: R[i] = p; G[i] = q; B[i] = v; break;
            case 4: R[i] = t; G[i] = p; B[i] = v; break;
            default: R[i] = v; G[i] = p; B[i] = q; break;
        }
    }
}

}  // extern "C"
