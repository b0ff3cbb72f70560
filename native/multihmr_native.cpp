// multihmr_native — native runtime pieces for the multihmr_tpu framework.
//
// The reference (naver/multi-hmr) feeds its model with a Python/PIL pipeline
// (demo.py:27-51, datasets/bedlam.py:208-236): decode → aspect-preserving
// resize → center pad → ImageNet normalize. At TPU inference rates
// (<15 ms/img target) the Python host path becomes the bottleneck, so this
// library implements it natively:
//
//   * JPEG (libjpeg) and PNG (libpng) decoding,
//   * bilinear contain-resize + centered zero-pad + ImageNet normalization
//     straight into a caller-provided float32 NHWC buffer,
//   * a prefetching multi-threaded batch loader (worker pool + bounded
//     queue) that keeps the TPU fed during folder inference / training.
//
// C ABI, consumed from Python via ctypes (multihmr_tpu/io/native.py).
//
// Build: see native/build.sh (g++ -O3 -march=native -shared -fPIC).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <initializer_list>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

constexpr float kMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kStd[3] = {0.229f, 0.224f, 0.225f};

struct ImageU8 {
  std::vector<uint8_t> data;  // HWC, RGB
  int h = 0, w = 0;
  bool ok = false;
};

// ---------------- JPEG ----------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

ImageU8 decode_jpeg(const uint8_t* buf, size_t len) {
  ImageU8 img;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.data.resize(size_t(img.w) * img.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.data.data() + size_t(cinfo.output_scanline) * img.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

// ---------------- PNG ----------------

struct PngReadState {
  const uint8_t* data;
  size_t len, pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* st = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (st->pos + n > st->len) {
    png_error(png, "png: read past end");
  }
  memcpy(out, st->data + st->pos, n);
  st->pos += n;
}

ImageU8 decode_png(const uint8_t* buf, size_t len) {
  ImageU8 img;
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return img;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  PngReadState st{buf, len, 0};
  png_set_read_fn(png, &st, png_read_fn);
  png_read_info(png, info);
  png_set_expand(png);           // palette/gray → rgb, bit depth ≥ 8
  png_set_strip_16(png);         // 16-bit → 8-bit
  png_set_strip_alpha(png);      // drop alpha
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  img.w = png_get_image_width(png, info);
  img.h = png_get_image_height(png, info);
  if (png_get_channels(png, info) != 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  img.data.resize(size_t(img.w) * img.h * 3);
  std::vector<png_bytep> rows(img.h);
  for (int y = 0; y < img.h; ++y)
    rows[y] = img.data.data() + size_t(y) * img.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

ImageU8 decode_image(const uint8_t* buf, size_t len) {
  if (len >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf, len);
  return decode_png(buf, len);
}

ImageU8 load_file(const char* path) {
  ImageU8 img;
  FILE* f = fopen(path, "rb");
  if (!f) return img;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n);
  size_t rd = fread(buf.data(), 1, n, f);
  fclose(f);
  if ((long)rd != n) return img;
  return decode_image(buf.data(), n);
}

// -------- contain-resize + pad + normalize --------

// PIL ImageOps.contain sizing (round half up on the scaled side).
void contain_size(int w, int h, int target, int* nw, int* nh) {
  if (w >= h) {
    *nw = target;
    *nh = (int)((double)h * target / w + 0.5);
    if (*nh < 1) *nh = 1;
  } else {
    *nh = target;
    *nw = (int)((double)w * target / h + 0.5);
    if (*nw < 1) *nw = 1;
  }
}

// Bilinear resize HWC u8 → normalized float32 written into the padded
// target canvas (half-pixel centers, edges clamped).
void resize_normalize_into(const ImageU8& img, int target, float* dst,
                           bool imagenet_norm) {
  int nw, nh;
  contain_size(img.w, img.h, target, &nw, &nh);
  const int off_x = (target - nw) / 2;
  const int off_y = (target - nh) / 2;
  memset(dst, 0, sizeof(float) * target * target * 3);
  // zero-padding corresponds to pixel value 0 → normalized (0-mean)/std
  if (imagenet_norm) {
    for (int y = 0; y < target; ++y) {
      for (int x = 0; x < target; ++x) {
        float* px = dst + (size_t(y) * target + x) * 3;
        px[0] = (0.f - kMean[0]) / kStd[0];
        px[1] = (0.f - kMean[1]) / kStd[1];
        px[2] = (0.f - kMean[2]) / kStd[2];
      }
    }
  }
  for (int y = 0; y < nh; ++y) {
    double sy = (y + 0.5) * (double)img.h / nh - 0.5;
    int y0 = (int)sy;
    if (sy < 0) { sy = 0; y0 = 0; }
    if (y0 > img.h - 1) y0 = img.h - 1;
    int y1 = y0 + 1 > img.h - 1 ? img.h - 1 : y0 + 1;
    float wy = (float)(sy - y0);
    for (int x = 0; x < nw; ++x) {
      double sx = (x + 0.5) * (double)img.w / nw - 0.5;
      int x0 = (int)sx;
      if (sx < 0) { sx = 0; x0 = 0; }
      if (x0 > img.w - 1) x0 = img.w - 1;
      int x1 = x0 + 1 > img.w - 1 ? img.w - 1 : x0 + 1;
      float wx = (float)(sx - x0);
      const uint8_t* p00 = img.data.data() + (size_t(y0) * img.w + x0) * 3;
      const uint8_t* p01 = img.data.data() + (size_t(y0) * img.w + x1) * 3;
      const uint8_t* p10 = img.data.data() + (size_t(y1) * img.w + x0) * 3;
      const uint8_t* p11 = img.data.data() + (size_t(y1) * img.w + x1) * 3;
      float* out = dst + (size_t(y + off_y) * target + (x + off_x)) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                  wy * ((1 - wx) * p10[c] + wx * p11[c]);
        v /= 255.f;
        out[c] = imagenet_norm ? (v - kMean[c]) / kStd[c] : v;
      }
    }
  }
}

// ---------------- prefetching batch loader ----------------

struct Loader {
  std::vector<std::string> paths;
  int img_size = 0;
  int n_threads = 0;
  bool imagenet_norm = true;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::queue<std::pair<int, std::vector<float>>> ready;  // (index, tensor)
  size_t max_queue = 8;
  std::atomic<int> next_idx{0};
  std::atomic<bool> stop{false};
  int delivered = 0;  // guarded by mu; every valid index is enqueued exactly once

  void worker() {
    while (!stop.load()) {
      int idx = next_idx.fetch_add(1);
      if (idx >= (int)paths.size()) break;
      ImageU8 img = load_file(paths[idx].c_str());
      std::vector<float> out(size_t(img_size) * img_size * 3, 0.f);
      if (img.ok) resize_normalize_into(img, img_size, out.data(), imagenet_norm);
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return ready.size() < max_queue || stop.load(); });
      if (stop.load()) break;
      ready.emplace(img.ok ? idx : -(idx + 1), std::move(out));
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

// Z-buffer triangle rasterizer with flat Lambertian shading.
// verts: [V,3] camera-space float32; faces: [F,3] int32; K: [9] row-major.
// rgb (in/out): [H,W,3] float32 premultiplied shade*color written at covered
// pixels; depth (in/out): [H,W] float32 (caller initializes to +inf).
void mh_rasterize(const float* verts, int n_verts, const int32_t* faces,
                  int n_faces, const float* K, int width, int height,
                  float cr, float cg, float cb, float* rgb, float* depth) {
  std::vector<float> vx(n_verts), vy(n_verts), vz(n_verts);
  for (int i = 0; i < n_verts; ++i) {
    float X = verts[3 * i], Y = verts[3 * i + 1], Z = verts[3 * i + 2];
    float z = Z > 1e-9f ? Z : 1e-9f;
    vx[i] = (K[0] * X + K[1] * Y + K[2] * Z) / z;
    vy[i] = (K[3] * X + K[4] * Y + K[5] * Z) / z;
    vz[i] = Z;
  }
  for (int f = 0; f < n_faces; ++f) {
    int i0 = faces[3 * f], i1 = faces[3 * f + 1], i2 = faces[3 * f + 2];
    if (i0 < 0 || i1 < 0 || i2 < 0 || i0 >= n_verts || i1 >= n_verts || i2 >= n_verts)
      continue;
    if (vz[i0] <= 1e-6f || vz[i1] <= 1e-6f || vz[i2] <= 1e-6f) continue;
    float ax = vx[i0], ay = vy[i0], bx = vx[i1], by = vy[i1], cx = vx[i2], cy = vy[i2];
    float det = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay);
    if (std::abs(det) < 1e-12f) continue;
    int x0 = std::max(0, (int)std::floor(std::min({ax, bx, cx})));
    int x1 = std::min(width - 1, (int)std::ceil(std::max({ax, bx, cx})));
    int y0 = std::max(0, (int)std::floor(std::min({ay, by, cy})));
    int y1 = std::min(height - 1, (int)std::ceil(std::max({ay, by, cy})));
    if (x1 < x0 || y1 < y0) continue;
    // camera-space normal for shading (double-sided)
    float e1x = verts[3 * i1] - verts[3 * i0], e1y = verts[3 * i1 + 1] - verts[3 * i0 + 1],
          e1z = verts[3 * i1 + 2] - verts[3 * i0 + 2];
    float e2x = verts[3 * i2] - verts[3 * i0], e2y = verts[3 * i2 + 1] - verts[3 * i0 + 1],
          e2z = verts[3 * i2 + 2] - verts[3 * i0 + 2];
    float nx = e1y * e2z - e1z * e2y, ny = e1z * e2x - e1x * e2z, nz = e1x * e2y - e1y * e2x;
    float nn = std::sqrt(nx * nx + ny * ny + nz * nz);
    float shade = 0.35f + 0.65f * (nn > 1e-12f ? std::abs(nz) / nn : 1.0f);
    float inv_det = 1.0f / det;
    for (int y = y0; y <= y1; ++y) {
      float py = y + 0.5f;
      for (int x = x0; x <= x1; ++x) {
        float px = x + 0.5f;
        float l1 = ((px - ax) * (cy - ay) - (cx - ax) * (py - ay)) * inv_det;
        float l2 = ((bx - ax) * (py - ay) - (px - ax) * (by - ay)) * inv_det;
        float l0 = 1.0f - l1 - l2;
        if (l0 < 0 || l1 < 0 || l2 < 0) continue;
        float z = l0 * vz[i0] + l1 * vz[i1] + l2 * vz[i2];
        float* d = depth + (size_t)y * width + x;
        if (z < *d) {
          *d = z;
          float* p = rgb + ((size_t)y * width + x) * 3;
          p[0] = shade * cr;
          p[1] = shade * cg;
          p[2] = shade * cb;
        }
      }
    }
  }
}

// Decode + preprocess one file into dst [img_size, img_size, 3] float32.
// Returns 1 on success, 0 on failure.
int mh_preprocess_file(const char* path, int img_size, int imagenet_norm,
                       float* dst) {
  ImageU8 img = load_file(path);
  if (!img.ok) return 0;
  resize_normalize_into(img, img_size, dst, imagenet_norm != 0);
  return 1;
}

// Preprocess raw HWC u8 pixels (already decoded) into dst.
int mh_preprocess_pixels(const uint8_t* pixels, int h, int w, int img_size,
                         int imagenet_norm, float* dst) {
  ImageU8 img;
  img.w = w;
  img.h = h;
  img.data.assign(pixels, pixels + size_t(h) * w * 3);
  img.ok = true;
  resize_normalize_into(img, img_size, dst, imagenet_norm != 0);
  return 1;
}

// Decode only: returns w/h via out params; writes RGB u8 into dst if
// dst_capacity is large enough. Call with dst=null to query the size.
int mh_decode_file(const char* path, int* out_h, int* out_w, uint8_t* dst,
                   int64_t dst_capacity) {
  ImageU8 img = load_file(path);
  if (!img.ok) return 0;
  *out_h = img.h;
  *out_w = img.w;
  if (dst != nullptr) {
    if ((int64_t)img.data.size() > dst_capacity) return 0;
    memcpy(dst, img.data.data(), img.data.size());
  }
  return 1;
}

void* mh_loader_create(const char** paths, int n_paths, int img_size,
                       int n_threads, int imagenet_norm, int max_queue) {
  auto* L = new Loader();
  L->paths.assign(paths, paths + n_paths);
  L->img_size = img_size;
  L->imagenet_norm = imagenet_norm != 0;
  L->n_threads = n_threads > 0 ? n_threads : (int)std::thread::hardware_concurrency();
  if (max_queue > 0) L->max_queue = max_queue;
  for (int i = 0; i < L->n_threads; ++i)
    L->workers.emplace_back(&Loader::worker, L);
  return L;
}

// Blocks until the next preprocessed image is ready. Returns the image index
// (order is NOT guaranteed), or -1 - index when decoding failed (tensor is
// zeros), or -2^30 when the loader is exhausted.
int mh_loader_next(void* handle, float* dst) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->delivered >= (int)L->paths.size()) return -(1 << 30);
  L->cv_ready.wait(lk, [&] { return !L->ready.empty(); });
  auto item = std::move(L->ready.front());
  L->ready.pop();
  L->delivered++;
  L->cv_space.notify_one();
  lk.unlock();
  memcpy(dst, item.second.data(),
         sizeof(float) * L->img_size * L->img_size * 3);
  int idx = item.first;
  return idx >= 0 ? idx : idx;  // negative encodes decode failure
}

int mh_loader_total(void* handle) {
  return (int)static_cast<Loader*>(handle)->paths.size();
}

void mh_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
