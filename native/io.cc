// ccvpe_io: native image decode + resize + normalize for the input pipeline.
//
// The reference's input bottleneck is single-threaded PIL decode per sample
// (reference datasets.py:98-177 with DataLoader num_workers<=1,
// train_KITTI.py:93-100). This library decodes JPEG (libjpeg) / PNG (libpng),
// resizes with a PIL-compatible triangle (bilinear-with-antialias) filter and
// ImageNet-normalizes into caller-provided float32 HWC buffers, with an
// internal thread pool for batch loads. Exposed to Python via ctypes
// (ccvpe_tpu/data/native_io.py).
//
// C API (all return 0 on success):
//   ccvpe_decode_resize(path, out, out_h, out_w, mean3, std3)
//   ccvpe_load_batch(paths, n, out, out_h, out_w, mean3, std3, threads)
//   ccvpe_version()

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // HWC, 3 channels
};

// ---------------- JPEG ----------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image* img) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->w = cinfo.output_width;
  img->h = cinfo.output_height;
  img->rgb.resize(size_t(img->w) * img->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img->rgb.data() + size_t(cinfo.output_scanline) * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------- PNG ----------------

bool decode_png(FILE* f, Image* img) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
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
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // normalize to 8-bit RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  img->w = int(w);
  img->h = int(h);
  img->rgb.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = img->rgb.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* img) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, img);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, img);
  }
  fclose(f);
  return ok;
}

// ---------------- PIL-compatible triangle resize ----------------
//
// Pillow's BILINEAR resample uses a triangle filter whose support scales
// with the downscale factor (built-in antialias). Contributions per output
// pixel are precomputed exactly as in Pillow's ImagingResampleHorizontal.

struct Contrib {
  int xmin;
  int n;
  std::vector<double> weights;
};

void build_contribs(int in_size, int out_size, std::vector<Contrib>* out) {
  double scale = double(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;  // triangle filter support = 1
  int ksize = int(std::ceil(support)) * 2 + 1;
  out->resize(out_size);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    Contrib& c = (*out)[xx];
    c.xmin = xmin;
    c.n = xmax - xmin;
    c.weights.assign(ksize, 0.0);
    for (int x = 0; x < c.n; ++x) {
      double arg = (x + xmin - center + 0.5) / filterscale;
      double w = arg < 0 ? 1.0 + arg : 1.0 - arg;  // triangle
      if (w < 0) w = 0;
      c.weights[x] = w;
      ww += w;
    }
    if (ww != 0.0)
      for (int x = 0; x < c.n; ++x) c.weights[x] /= ww;
  }
}

// resize RGB8 -> float32 HWC normalized.
// Vertical pass first (sequential full-row AXPYs, vectorizable), then the
// horizontal gather on the reduced number of rows.
void resize_normalize(const Image& img, float* out, int out_h, int out_w,
                      const float* mean, const float* stdv) {
  std::vector<Contrib> cx, cy;
  build_contribs(img.w, out_w, &cx);
  build_contribs(img.h, out_h, &cy);

  const int in_row = img.w * 3;
  // vertical pass: [out_h, img.w, 3] float
  std::vector<float> tmp(size_t(out_h) * in_row);
  std::vector<float> u8f(in_row);
  for (int y = 0; y < out_h; ++y) {
    const Contrib& c = cy[y];
    float* trow = tmp.data() + size_t(y) * in_row;
    {
      const uint8_t* src = img.rgb.data() + size_t(c.xmin) * in_row;
      const float w = float(c.weights[0]);
      for (int i = 0; i < in_row; ++i) trow[i] = w * src[i];
    }
    for (int k = 1; k < c.n; ++k) {
      const uint8_t* src = img.rgb.data() + size_t(c.xmin + k) * in_row;
      const float w = float(c.weights[k]);
      for (int i = 0; i < in_row; ++i) trow[i] += w * src[i];
    }
  }
  // horizontal pass + normalize
  const float s = 1.0f / 255.0f;
  const float inv_std[3] = {s / stdv[0], s / stdv[1], s / stdv[2]};
  const float bias[3] = {mean[0] * 255.0f, mean[1] * 255.0f, mean[2] * 255.0f};
  for (int y = 0; y < out_h; ++y) {
    const float* trow = tmp.data() + size_t(y) * in_row;
    float* orow = out + size_t(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      const Contrib& c = cx[x];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      const float* p = trow + size_t(c.xmin) * 3;
      for (int k = 0; k < c.n; ++k, p += 3) {
        const float w = float(c.weights[k]);
        acc0 += w * p[0];
        acc1 += w * p[1];
        acc2 += w * p[2];
      }
      orow[x * 3 + 0] = (acc0 - bias[0]) * inv_std[0];
      orow[x * 3 + 1] = (acc1 - bias[1]) * inv_std[1];
      orow[x * 3 + 2] = (acc2 - bias[2]) * inv_std[2];
    }
  }
}

// resize RGB8 -> uint8 HWC (no normalization): same two-pass triangle
// filter, rounded to nearest like Pillow's fixed-point resample. This is the
// "ship uint8, normalize on device" ingest path - 4x less host->device
// traffic than the float32 variant.
void resize_u8(const Image& img, uint8_t* out, int out_h, int out_w) {
  std::vector<Contrib> cx, cy;
  build_contribs(img.w, out_w, &cx);
  build_contribs(img.h, out_h, &cy);

  const int in_row = img.w * 3;
  std::vector<float> tmp(size_t(out_h) * in_row);
  for (int y = 0; y < out_h; ++y) {
    const Contrib& c = cy[y];
    float* trow = tmp.data() + size_t(y) * in_row;
    {
      const uint8_t* src = img.rgb.data() + size_t(c.xmin) * in_row;
      const float w = float(c.weights[0]);
      for (int i = 0; i < in_row; ++i) trow[i] = w * src[i];
    }
    for (int k = 1; k < c.n; ++k) {
      const uint8_t* src = img.rgb.data() + size_t(c.xmin + k) * in_row;
      const float w = float(c.weights[k]);
      for (int i = 0; i < in_row; ++i) trow[i] += w * src[i];
    }
  }
  for (int y = 0; y < out_h; ++y) {
    const float* trow = tmp.data() + size_t(y) * in_row;
    uint8_t* orow = out + size_t(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      const Contrib& c = cx[x];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      const float* p = trow + size_t(c.xmin) * 3;
      for (int k = 0; k < c.n; ++k, p += 3) {
        const float w = float(c.weights[k]);
        acc0 += w * p[0];
        acc1 += w * p[1];
        acc2 += w * p[2];
      }
      auto clip8 = [](float v) -> uint8_t {
        int i = int(v + 0.5f);
        return uint8_t(i < 0 ? 0 : (i > 255 ? 255 : i));
      };
      orow[x * 3 + 0] = clip8(acc0);
      orow[x * 3 + 1] = clip8(acc1);
      orow[x * 3 + 2] = clip8(acc2);
    }
  }
}

}  // namespace

extern "C" {

int ccvpe_version() { return 2; }

int ccvpe_decode_resize(const char* path, float* out, int out_h, int out_w,
                        const float* mean, const float* stdv) {
  Image img;
  if (!decode_file(path, &img)) return 1;
  resize_normalize(img, out, out_h, out_w, mean, stdv);
  return 0;
}

// decode raw image into uint8 HWC; caller passes capacity, receives w/h.
int ccvpe_decode_raw(const char* path, uint8_t* out, int capacity, int* w,
                     int* h) {
  Image img;
  if (!decode_file(path, &img)) return 1;
  if (int(img.rgb.size()) > capacity) return 2;
  memcpy(out, img.rgb.data(), img.rgb.size());
  *w = img.w;
  *h = img.h;
  return 0;
}

// decode + resize to uint8 HWC (for the on-device-normalization ingest path)
int ccvpe_decode_resize_u8(const char* path, uint8_t* out, int out_h,
                           int out_w) {
  Image img;
  if (!decode_file(path, &img)) return 1;
  resize_u8(img, out, out_h, out_w);
  return 0;
}

int ccvpe_load_batch(const char** paths, int n, float* out, int out_h,
                     int out_w, const float* mean, const float* stdv,
                     int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  size_t stride = size_t(out_h) * out_w * 3;
  auto work = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      if (ccvpe_decode_resize(paths[i], out + stride * i, out_h, out_w, mean,
                              stdv) != 0)
        failures.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int nt = std::min(num_threads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
