// Native image-loading core: JPEG decode + fused bilinear resize +
// normalize, one pass, no Python involvement (GIL-free under ctypes).
//
// The pipeline's host-side work is image decode/resize feeding the device
// (the reference does this synchronously in torch Datasets); this core lets
// the thread-pool prefetcher scale past the GIL. Resize semantics are the
// same half-pixel, edge-clamped bilinear as ops/resize.py (torch
// F.interpolate align_corners=False, no antialias).
//
// Build: see stablekeypoints_tpu/utils/native.py (g++ -O3 -fPIC -shared
// -ljpeg). Exposed via ctypes; PIL remains the fallback path.

#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// bilinear sample weights for one output index (half-pixel, edge clamp)
inline void tap(int out_i, int in_size, double scale, int* i0, int* i1, float* t) {
  double src = (out_i + 0.5) * scale - 0.5;
  double f = std::floor(src);
  *t = static_cast<float>(src - f);
  int a = static_cast<int>(f);
  int b = a + 1;
  *i0 = a < 0 ? 0 : (a >= in_size ? in_size - 1 : a);
  *i1 = b < 0 ? 0 : (b >= in_size ? in_size - 1 : b);
}

// resize [in_h, in_w, 3] uint8 -> [out_h, out_w, 3] float32 in [0, 1]
void resize_normalize(const uint8_t* src, int in_h, int in_w, float* dst,
                      int out_h, int out_w) {
  const double sy = static_cast<double>(in_h) / out_h;
  const double sx = static_cast<double>(in_w) / out_w;
  std::vector<int> x0(out_w), x1(out_w);
  std::vector<float> tx(out_w);
  for (int x = 0; x < out_w; ++x) tap(x, in_w, sx, &x0[x], &x1[x], &tx[x]);

  for (int y = 0; y < out_h; ++y) {
    int y0, y1;
    float ty;
    tap(y, in_h, sy, &y0, &y1, &ty);
    const uint8_t* r0 = src + static_cast<size_t>(y0) * in_w * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * in_w * 3;
    float* out_row = dst + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      const int a = x0[x] * 3, b = x1[x] * 3;
      const float t = tx[x];
      for (int c = 0; c < 3; ++c) {
        const float top = r0[a + c] + t * (r0[b + c] - r0[a + c]);
        const float bot = r1[a + c] + t * (r1[b + c] - r1[a + c]);
        // divide (not multiply by 1/255) so identity resizes are bit-equal
        // to numpy's uint8 / 255.0 in the PIL path
        out_row[x * 3 + c] = (top + ty * (bot - top)) / 255.0f;
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode a JPEG byte buffer and write a resized, normalized float32 RGB
// image into `out` (out_h * out_w * 3 floats). Returns 0 on success.
int skt_decode_resize_jpeg(const uint8_t* data, size_t len, int out_h,
                           int out_w, float* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  std::vector<uint8_t> rgb(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  resize_normalize(rgb.data(), h, w, out, out_h, out_w);
  return 0;
}

// Resize + normalize an already-decoded uint8 RGB buffer.
int skt_resize_normalize(const uint8_t* rgb, int in_h, int in_w, int out_h,
                         int out_w, float* out) {
  resize_normalize(rgb, in_h, in_w, out, out_h, out_w);
  return 0;
}

}  // extern "C"
