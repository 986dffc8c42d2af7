// fastimage: native host-side image ops for the TPU input pipeline.
//
// The reference identifies host-side PIL decode+augmentation as the CPU
// bottleneck and recommends pillow-SIMD (reference SETUP.md:21-24). This
// library is our equivalent: libjpeg-turbo decode with DCT-domain
// scaling (decode directly at 1/2, 1/4, 1/8 resolution — most of the
// win for 224px training crops from large JPEGs), plus a PIL-compatible
// antialiased separable resize fused with crop, horizontal flip, and
// ImageNet normalisation into the final float32 NHWC tensor.
//
// Exposed via ctypes (multimae_tpu/native/__init__.py); no Python.h
// dependency. Auto-built by multimae_tpu/native/__init__.py:_build on
// first import (g++ -O3 -march=native, cached as libfastimage.so).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// --- PNG decode (libpng16) --------------------------------------------------
//
// The pretrain pipeline reads uint16 depth PNGs and palette ('P') semseg
// PNGs; PIL's decoder measured 4.7 ms per ~500x380 uint16 file — the
// single largest host stage (PIPELINE.md). This decodes from memory:
//   want_rgb=1: force RGB8 (palette/gray expanded, 16-bit stripped).
//   want_rgb=0: raw representation — palette -> 1-byte indices, gray16
//     stays 16-bit (native little-endian), gray8 stays 8-bit; alpha is
//     stripped (unused by every dataset here).

struct PngReadCtx {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

static void mm_png_read_cb(png_structp p, png_bytep out, png_size_t n) {
  PngReadCtx* c = static_cast<PngReadCtx*>(png_get_io_ptr(p));
  if (c->pos + n > c->len) png_error(p, "unexpected eof");
  memcpy(out, c->data + c->pos, n);
  c->pos += n;
}

int mm_decode_png(const uint8_t* data, long len, int want_rgb, uint8_t* out,
                  long cap_bytes, int* out_h, int* out_w, int* out_c,
                  int* out_depth) {
  png_structp p = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                         nullptr, nullptr);
  if (!p) return -1;
  png_infop info = png_create_info_struct(p);
  if (!info) {
    png_destroy_read_struct(&p, nullptr, nullptr);
    return -1;
  }
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(p))) {
    png_destroy_read_struct(&p, &info, nullptr);
    return -2;
  }
  PngReadCtx ctx{data, static_cast<size_t>(len), 0};
  png_set_read_fn(p, &ctx, mm_png_read_cb);
  png_read_info(p, info);
  const int ct = png_get_color_type(p, info);
  const int bd = png_get_bit_depth(p, info);
  if (want_rgb) {
    if (ct == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(p);
    if (ct == PNG_COLOR_TYPE_GRAY && bd < 8) png_set_expand_gray_1_2_4_to_8(p);
    if (bd == 16) png_set_strip_16(p);
    if (ct == PNG_COLOR_TYPE_GRAY || ct == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(p);
    png_set_strip_alpha(p);
  } else {
    if (ct == PNG_COLOR_TYPE_PALETTE) {
      png_set_packing(p);  // 1/2/4-bit palette -> one index byte per pixel
    } else if (bd < 8) {
      png_set_expand_gray_1_2_4_to_8(p);
    }
    if (bd == 16) png_set_swap(p);  // PNG is big-endian; host is LE
    png_set_strip_alpha(p);
  }
  png_set_interlace_handling(p);
  png_read_update_info(p, info);
  const size_t rowbytes = png_get_rowbytes(p, info);
  const long h = png_get_image_height(p, info);
  const long w = png_get_image_width(p, info);
  if (static_cast<long>(rowbytes) * h > cap_bytes) {
    png_destroy_read_struct(&p, &info, nullptr);
    return -3;
  }
  rows.resize(h);
  for (long y = 0; y < h; ++y) rows[y] = out + y * rowbytes;
  png_read_image(p, rows.data());
  *out_c = png_get_channels(p, info);
  *out_depth = png_get_bit_depth(p, info);
  *out_h = static_cast<int>(h);
  *out_w = static_cast<int>(w);
  png_destroy_read_struct(&p, &info, nullptr);
  return 0;
}

struct mm_error_mgr {
  struct jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void mm_error_exit(j_common_ptr cinfo) {
  mm_error_mgr* err = reinterpret_cast<mm_error_mgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG from memory into an RGB8 buffer.
//   min_size > 0: pick the largest DCT scale_denom in {8,4,2,1} such that
//   min(out_h, out_w) >= min_size (cheap decode for training crops).
// out must hold cap_bytes; returns 0 on success, writes out_h/out_w.
int mm_decode_jpeg(const uint8_t* data, long len, int min_size,
                   uint8_t* out, long cap_bytes, int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  mm_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = mm_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  if (min_size > 0) {
    int full_min = static_cast<int>(std::min(cinfo.image_width,
                                             cinfo.image_height));
    for (int denom = 8; denom >= 2; denom /= 2) {
      if (full_min / denom >= min_size) {
        cinfo.scale_denom = denom;
        break;
      }
    }
  }
  cinfo.dct_method = JDCT_ISLOW;
  jpeg_calc_output_dimensions(&cinfo);
  const long h = cinfo.output_height, w = cinfo.output_width;
  if (h * w * 3 > cap_bytes) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  jpeg_start_decompress(&cinfo);
  const int row_stride = cinfo.output_width * cinfo.output_components;
  std::vector<uint8_t> gray_row;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<long>(cinfo.output_scanline) * w * 3;
    if (cinfo.output_components == 3) {
      JSAMPROW rows[1] = {row};
      jpeg_read_scanlines(&cinfo, rows, 1);
    } else {  // grayscale: expand to RGB
      gray_row.resize(row_stride);
      JSAMPROW rows[1] = {gray_row.data()};
      jpeg_read_scanlines(&cinfo, rows, 1);
      for (long x = 0; x < w; ++x) {
        row[3 * x] = row[3 * x + 1] = row[3 * x + 2] = gray_row[x];
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_h = static_cast<int>(h);
  *out_w = static_cast<int>(w);
  return 0;
}

// --- PIL-style antialiased separable resampling -----------------------------

struct FilterSpec {
  double support;
  double (*fn)(double);
};

static double bilinear_filter(double x) {
  x = std::fabs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

static double bicubic_filter(double x) {  // PIL: Catmull-Rom style a=-0.5
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// Precompute contribution windows for one axis (PIL's ImagingResampleHorizontal
// coefficient scheme: support scaled by the downscale ratio = antialiasing).
static void build_coeffs(int in_size, double in0, double in1, int out_size,
                         const FilterSpec& f, std::vector<int>& bounds,
                         std::vector<double>& coeffs, int& ksize) {
  double scale = (in1 - in0) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = f.support * filterscale;
  ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  bounds.resize(out_size * 2);
  coeffs.assign(static_cast<size_t>(out_size) * ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = in0 + (xx + 0.5) * scale;
    int xmin = std::max(0, static_cast<int>(center - support + 0.5));
    int xmax = std::min(in_size, static_cast<int>(center + support + 0.5));
    double* k = &coeffs[static_cast<size_t>(xx) * ksize];
    double total = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      double weight = f.fn((x - center + 0.5) / filterscale);
      k[x - xmin] = weight;
      total += weight;
    }
    if (total != 0.0)
      for (int x = 0; x < xmax - xmin; ++x) k[x] /= total;
    bounds[xx * 2] = xmin;
    bounds[xx * 2 + 1] = xmax - xmin;
  }
}

// Crop src[crop_y:crop_y+crop_h, crop_x:crop_x+crop_w], resize to (dh, dw)
// with PIL-style antialiased bilinear/bicubic, optional horizontal flip,
// then out = (x/255 - mean) / std as float32 HWC.
int mm_crop_resize_normalize(const uint8_t* src, int sh, int sw, int channels,
                             int crop_y, int crop_x, int crop_h, int crop_w,
                             float* dst, int dh, int dw, const float* mean,
                             const float* stddev, int bicubic, int hflip) {
  if (crop_y < 0 || crop_x < 0 || crop_y + crop_h > sh || crop_x + crop_w > sw)
    return -1;
  FilterSpec f = bicubic ? FilterSpec{2.0, bicubic_filter}
                         : FilterSpec{1.0, bilinear_filter};

  std::vector<int> xb, yb;
  std::vector<double> xc, yc;
  int xk, yk;
  build_coeffs(sw, crop_x, crop_x + crop_w, dw, f, xb, xc, xk);
  build_coeffs(sh, crop_y, crop_y + crop_h, dh, f, yb, yc, yk);

  // Horizontal pass into a temp (crop rows only matter for y-pass bounds).
  // temp is (sh, dw, c) but we only fill rows [ymin_all, ymax_all).
  std::vector<float> temp(static_cast<size_t>(sh) * dw * channels);
  int y_lo = sh, y_hi = 0;
  for (int yy = 0; yy < dh; ++yy) {
    y_lo = std::min(y_lo, yb[yy * 2]);
    y_hi = std::max(y_hi, yb[yy * 2] + yb[yy * 2 + 1]);
  }
  for (int y = y_lo; y < y_hi; ++y) {
    const uint8_t* srow = src + (static_cast<size_t>(y) * sw) * channels;
    float* trow = &temp[(static_cast<size_t>(y) * dw) * channels];
    for (int xx = 0; xx < dw; ++xx) {
      const double* k = &xc[static_cast<size_t>(xx) * xk];
      int xmin = xb[xx * 2], n = xb[xx * 2 + 1];
      for (int c = 0; c < channels; ++c) {
        double acc = 0.0;
        for (int i = 0; i < n; ++i)
          acc += srow[(xmin + i) * channels + c] * k[i];
        trow[xx * channels + c] = static_cast<float>(acc);
      }
    }
  }
  // Vertical pass + flip + normalize.
  for (int yy = 0; yy < dh; ++yy) {
    const double* k = &yc[static_cast<size_t>(yy) * yk];
    int ymin = yb[yy * 2], n = yb[yy * 2 + 1];
    float* drow = dst + (static_cast<size_t>(yy) * dw) * channels;
    for (int xx = 0; xx < dw; ++xx) {
      int out_x = hflip ? (dw - 1 - xx) : xx;
      for (int c = 0; c < channels; ++c) {
        double acc = 0.0;
        for (int i = 0; i < n; ++i)
          acc += temp[(static_cast<size_t>(ymin + i) * dw + xx) * channels + c] *
                 k[i];
        float v = static_cast<float>(acc) / 255.0f;
        drow[out_x * channels + c] = (v - mean[c]) / stddev[c];
      }
    }
  }
  return 0;
}

// Same resample, but uint8 -> uint8 (for chains that keep augmenting).
int mm_crop_resize_u8(const uint8_t* src, int sh, int sw, int channels,
                      int crop_y, int crop_x, int crop_h, int crop_w,
                      uint8_t* dst, int dh, int dw, int bicubic, int hflip) {
  std::vector<float> tmp(static_cast<size_t>(dh) * dw * channels);
  float zeros[16] = {0}, ones[16];
  for (int i = 0; i < 16; ++i) ones[i] = 1.0f / 255.0f;  // identity transform
  int rc = mm_crop_resize_normalize(src, sh, sw, channels, crop_y, crop_x,
                                    crop_h, crop_w, tmp.data(), dh, dw, zeros,
                                    ones, bicubic, hflip);
  if (rc != 0) return rc;
  for (size_t i = 0; i < tmp.size(); ++i) {
    float v = tmp[i];
    dst[i] = static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, std::round(v))));
  }
  return 0;
}

}  // extern "C"
