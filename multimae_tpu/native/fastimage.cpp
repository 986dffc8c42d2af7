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

extern "C" {

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
