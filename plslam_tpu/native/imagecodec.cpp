// Native image decode + prefetch runtime for the TPU SLAM data path.
//
// Reference parity: the reference's data loader is native C++ (OpenCV
// imread inside stvo-pl src/dataset.cpp). This module provides the same
// role without OpenCV: grayscale decode of PNG (libpng) and PGM/PPM,
// plus a background prefetch pool so image IO overlaps device compute
// (the reference overlaps IO with its tracking thread implicitly by
// being CPU-bound; here the host must stay ahead of the TPU).
//
// Exposed C ABI (consumed via ctypes from plslam_tpu/native/imageio.py):
//   image_size(path, &h, &w)            -> 0 ok
//   image_decode_gray(path, out_f32)    -> 0 ok (row-major h*w, [0,1])
//   prefetch_create(paths, n, capacity, n_threads) -> handle
//   prefetch_get(handle, idx, out, h*w) -> 0 ok (blocks until decoded)
//   prefetch_destroy(handle)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <png.h>

namespace {

struct Image {
  int h = 0, w = 0;
  std::vector<float> data;
};

bool ends_with(const std::string& s, const char* suf) {
  size_t n = std::strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; i++) {
    char a = s[s.size() - n + i];
    char b = suf[i];
    if (std::tolower(a) != std::tolower(b)) return false;
  }
  return true;
}

// ---------- PGM/PPM (P2/P3/P5/P6) ----------
int decode_pnm(FILE* f, Image* out) {
  char magic[3] = {0};
  if (fscanf(f, "%2s", magic) != 1) return -1;
  int channels;
  bool binary;
  if (!strcmp(magic, "P5")) { channels = 1; binary = true; }
  else if (!strcmp(magic, "P6")) { channels = 3; binary = true; }
  else if (!strcmp(magic, "P2")) { channels = 1; binary = false; }
  else if (!strcmp(magic, "P3")) { channels = 3; binary = false; }
  else return -2;
  // skip whitespace + comments
  auto skip = [&]() {
    int c;
    while ((c = fgetc(f)) != EOF) {
      if (c == '#') { while ((c = fgetc(f)) != EOF && c != '\n') {} }
      else if (!isspace(c)) { ungetc(c, f); break; }
    }
  };
  int w, h, maxval;
  skip(); if (fscanf(f, "%d", &w) != 1) return -3;
  skip(); if (fscanf(f, "%d", &h) != 1) return -3;
  skip(); if (fscanf(f, "%d", &maxval) != 1) return -3;
  fgetc(f);  // single whitespace after header
  out->h = h; out->w = w;
  out->data.resize((size_t)h * w);
  const float inv = 1.0f / (float)maxval;
  if (binary) {
    std::vector<uint8_t> row((size_t)w * channels * (maxval > 255 ? 2 : 1));
    for (int y = 0; y < h; y++) {
      if (fread(row.data(), 1, row.size(), f) != row.size()) return -4;
      for (int x = 0; x < w; x++) {
        float v;
        if (channels == 1) v = row[x] * inv;
        else v = (0.299f * row[3 * x] + 0.587f * row[3 * x + 1] +
                  0.114f * row[3 * x + 2]) * inv;
        out->data[(size_t)y * w + x] = v;
      }
    }
  } else {
    for (size_t i = 0; i < (size_t)h * w; i++) {
      long acc = 0;
      for (int c = 0; c < channels; c++) {
        long v; if (fscanf(f, "%ld", &v) != 1) return -4;
        acc += v;
      }
      out->data[i] = (float)acc / channels * inv;
    }
  }
  return 0;
}

// ---------- PNG via libpng ----------
int decode_png(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return -10;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return -10; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -11;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  // normalize everything to 8-bit gray
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (depth == 16) png_set_strip_16(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  png_read_update_info(png, info);

  out->h = (int)h; out->w = (int)w;
  out->data.resize((size_t)h * w);
  std::vector<uint8_t> row(png_get_rowbytes(png, info));
  const float inv = 1.0f / 255.0f;
  for (png_uint_32 y = 0; y < h; y++) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out->data.data() + (size_t)y * w;
    for (png_uint_32 x = 0; x < w; x++) dst[x] = row[x] * inv;
  }
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

int decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int rc;
  std::string p(path);
  if (ends_with(p, ".png")) rc = decode_png(f, out);
  else rc = decode_pnm(f, out);
  fclose(f);
  return rc;
}

// ---------- bilinear remap (cv::remap parity, border clamp) ----------
void remap_bilinear(const Image& src, const float* map, int oh, int ow,
                    Image* out) {
  out->h = oh; out->w = ow;
  out->data.resize((size_t)oh * ow);
  const int sh = src.h, sw = src.w;
  const float* s = src.data.data();
  for (int y = 0; y < oh; y++) {
    float* dst = out->data.data() + (size_t)y * ow;
    const float* m = map + (size_t)y * ow * 2;
    for (int x = 0; x < ow; x++) {
      float u = m[2 * x], v = m[2 * x + 1];
      if (u < 0.f) u = 0.f;
      if (u > sw - 1.001f) u = sw - 1.001f;
      if (v < 0.f) v = 0.f;
      if (v > sh - 1.001f) v = sh - 1.001f;
      int x0 = (int)u, y0 = (int)v;
      float fx = u - x0, fy = v - y0;
      const float* r0 = s + (size_t)y0 * sw + x0;
      const float* r1 = r0 + sw;
      dst[x] = (r0[0] * (1.f - fx) + r0[1] * fx) * (1.f - fy)
             + (r1[0] * (1.f - fx) + r1[1] * fx) * fy;
    }
  }
}

// ---------- prefetch pool ----------
struct Prefetcher {
  std::vector<std::string> paths;
  size_t capacity;
  // optional undistort-rectify map: out_h*out_w (u, v) source coords,
  // interleaved. Applied by the decode workers (cv::remap parity) so the
  // host hands rectified frames straight to the device.
  std::vector<float> rect_map;
  int out_h = 0, out_w = 0;
  std::map<size_t, Image> cache;           // decoded, not yet consumed
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::atomic<size_t> next_to_decode{0};
  std::atomic<bool> stop{false};
  size_t consumed_watermark = 0;           // lowest index still wanted
  std::vector<std::thread> workers;

  void worker() {
    while (!stop.load()) {
      size_t idx = next_to_decode.fetch_add(1);
      if (idx >= paths.size()) break;
      Image img;
      int rc = decode_file(paths[idx].c_str(), &img);
      if (rc != 0) { img.h = img.w = 0; }
      if (rc == 0 && !rect_map.empty()) {
        Image rect;
        remap_bilinear(img, rect_map.data(), out_h, out_w, &rect);
        img = std::move(rect);
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] {
        return stop.load() || cache.size() < capacity ||
               idx < consumed_watermark + capacity;
      });
      if (stop.load()) break;
      cache.emplace(idx, std::move(img));
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

int image_size(const char* path, int* h, int* w) {
  Image img;  // full decode; size-only fast path not worth the code
  int rc = decode_file(path, &img);
  if (rc != 0) return rc;
  *h = img.h; *w = img.w;
  return 0;
}

int image_decode_gray(const char* path, float* out, int cap) {
  Image img;
  int rc = decode_file(path, &img);
  if (rc != 0) return rc;
  if ((int)img.data.size() > cap) return -20;
  std::memcpy(out, img.data.data(), img.data.size() * sizeof(float));
  return (int)img.data.size();
}

void* prefetch_create(const char** paths, int n, int capacity, int n_threads) {
  auto* p = new Prefetcher();
  p->paths.assign(paths, paths + n);
  p->capacity = (size_t)capacity;
  for (int i = 0; i < n_threads; i++)
    p->workers.emplace_back(&Prefetcher::worker, p);
  return p;
}

void* prefetch_create_rect(const char** paths, int n, int capacity,
                           int n_threads, const float* map,
                           int out_h, int out_w) {
  auto* p = new Prefetcher();
  p->paths.assign(paths, paths + n);
  p->capacity = (size_t)capacity;
  if (map != nullptr && out_h > 0 && out_w > 0) {
    p->rect_map.assign(map, map + (size_t)out_h * out_w * 2);
    p->out_h = out_h;
    p->out_w = out_w;
  }
  for (int i = 0; i < n_threads; i++)
    p->workers.emplace_back(&Prefetcher::worker, p);
  return p;
}

int image_remap(const float* src, int sh, int sw, const float* map,
                int oh, int ow, float* out) {
  Image s;
  s.h = sh; s.w = sw;
  s.data.assign(src, src + (size_t)sh * sw);
  Image o;
  remap_bilinear(s, map, oh, ow, &o);
  std::memcpy(out, o.data.data(), o.data.size() * sizeof(float));
  return 0;
}

int prefetch_get(void* handle, int idx, float* out, int cap) {
  auto* p = (Prefetcher*)handle;
  std::unique_lock<std::mutex> lk(p->mu);
  p->consumed_watermark = (size_t)idx;
  p->cv_space.notify_all();
  p->cv_ready.wait(lk, [&] { return p->cache.count((size_t)idx) > 0; });
  Image img = std::move(p->cache[(size_t)idx]);
  p->cache.erase((size_t)idx);
  p->cv_space.notify_all();
  lk.unlock();
  if (img.h == 0) return -1;
  if ((int)img.data.size() > cap) return -20;
  std::memcpy(out, img.data.data(), img.data.size() * sizeof(float));
  return (int)img.data.size();
}

void prefetch_destroy(void* handle) {
  auto* p = (Prefetcher*)handle;
  p->stop.store(true);
  p->cv_space.notify_all();
  p->cv_ready.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
