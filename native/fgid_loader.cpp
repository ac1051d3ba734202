// Native FGID data loader: threaded JPEG/PNG decode + bilinear resize +
// normalize, feeding the JAX input pipeline through ctypes.
//
// TPU-native counterpart of the runtime the reference gets from torch's C++
// DataLoader workers (reference train.py:201-207 num_workers) and its
// single-image PIL loops in data production (data/FGID_mask.py throughput
// note :146). A worker pool decodes images straight into preallocated
// batch buffers with a prefetch queue, so the host never blocks device steps
// on image IO.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 fgid_loader.cpp -o libfgid_loader.so -ljpeg -lpng -lpthread
// (io/native_loader.py builds lazily and falls back to PIL if unavailable.)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  std::vector<uint8_t> rgb;  // HWC uint8
  int h = 0, w = 0;
};

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(const uint8_t* data, size_t size, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadState {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + n > s->size) {
    png_error(png, "png: out of data");
  }
  std::memcpy(out, s->data + s->pos, n);
  s->pos += n;
}

bool decode_png(const uint8_t* data, size_t size, Image* out) {
  if (size < 8 || png_sig_cmp(data, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
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
  PngReadState state{data, size, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);
  png_set_expand(png);          // palette/gray->8bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->rgb.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->rgb.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n > 0 ? size_t(n) : 0);
  if (n <= 0 || std::fread(buf.data(), 1, size_t(n), f) != size_t(n)) {
    std::fclose(f);
    return false;
  }
  std::fclose(f);
  if (buf.size() >= 2 && buf[0] == 0xFF && buf[1] == 0xD8)
    return decode_jpeg(buf.data(), buf.size(), out);
  return decode_png(buf.data(), buf.size(), out);
}

// bilinear resize + normalize (half-pixel centers) HWC u8 -> HWC f32;
// center_crop: sample from the centered square region (ArcFace-style
// pre-alignment crop) instead of the full frame
void resize_normalize(const Image& img, int out_h, int out_w,
                      const float* mean, const float* std_, int center_crop,
                      float* out) {
  int src_h = img.h, src_w = img.w, off_y = 0, off_x = 0;
  if (center_crop) {
    int side = img.h < img.w ? img.h : img.w;
    off_y = (img.h - side) / 2;
    off_x = (img.w - side) / 2;
    src_h = src_w = side;
  }
  const float sy = float(src_h) / out_h;
  const float sx = float(src_w) / out_w;
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : int(fy);
    if (y0 > src_h - 1) y0 = src_h - 1;
    int y1 = y0 + 1 < src_h ? y0 + 1 : src_h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int ox = 0; ox < out_w; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : int(fx);
      if (x0 > src_w - 1) x0 = src_w - 1;
      int x1 = x0 + 1 < src_w ? x0 + 1 : src_w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      const size_t r0 = size_t(off_y + y0) * img.w + off_x;
      const size_t r1 = size_t(off_y + y1) * img.w + off_x;
      for (int c = 0; c < 3; ++c) {
        float tl = img.rgb[(r0 + x0) * 3 + c];
        float tr = img.rgb[(r0 + x1) * 3 + c];
        float bl = img.rgb[(r1 + x0) * 3 + c];
        float br = img.rgb[(r1 + x1) * 3 + c];
        float top = tl + (tr - tl) * wx;
        float bot = bl + (br - bl) * wx;
        float v = (top + (bot - top) * wy) / 255.0f;
        out[(size_t(oy) * out_w + ox) * 3 + c] = (v - mean[c]) / std_[c];
      }
    }
  }
}

struct Batch {
  size_t start = 0;               // index of the batch's first path
  std::vector<uint8_t> ok;        // per-image decode success flags
  std::vector<float> buf;
};

struct Loader {
  std::vector<std::string> paths;
  int out_h, out_w, batch, threads, center_crop = 0;
  float mean[3], std_[3];

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  // workers finish out of order; batches are keyed by start index and the
  // consumer always takes the next IN-ORDER batch, so labels/captions
  // paired by position on the Python side can never mispair
  std::map<size_t, Batch> ready;
  size_t next_index = 0;          // next path to schedule
  size_t next_consume = 0;        // start index the consumer waits for
  size_t batches_total = 0, batches_consumed = 0;
  size_t max_queue = 4;
  std::atomic<bool> stop{false};

  void worker() {
    while (true) {
      size_t start;
      {
        std::unique_lock<std::mutex> lk(mu);
        if (stop || next_index >= paths.size()) return;
        start = next_index;
        next_index += batch;
      }
      Batch b;
      b.start = start;
      b.ok.assign(batch, 0);
      b.buf.assign(size_t(batch) * out_h * out_w * 3, 0.0f);
      for (int i = 0; i < batch && start + i < paths.size(); ++i) {
        Image img;
        if (decode_file(paths[start + i].c_str(), &img) && img.h && img.w) {
          resize_normalize(img, out_h, out_w, mean, std_, center_crop,
                           b.buf.data() + size_t(i) * out_h * out_w * 3);
          b.ok[i] = 1;
        }
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        // the consumer-wanted batch always bypasses the space limit, else a
        // full queue of out-of-order batches would deadlock against the
        // blocked in-order consumer
        cv_space.wait(lk, [&] {
          return stop || ready.size() < max_queue || start == next_consume;
        });
        if (stop) return;
        ready.emplace(start, std::move(b));
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* fgid_loader_create(const char** paths, int n_paths, int out_h,
                         int out_w, int batch, int threads,
                         const float* mean, const float* std_,
                         int center_crop) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n_paths);
  l->out_h = out_h;
  l->out_w = out_w;
  l->batch = batch;
  l->center_crop = center_crop;
  l->threads = threads > 0 ? threads : 4;
  std::memcpy(l->mean, mean, 3 * sizeof(float));
  std::memcpy(l->std_, std_, 3 * sizeof(float));
  l->batches_total = (l->paths.size() + batch - 1) / batch;
  for (int i = 0; i < l->threads; ++i)
    l->workers.emplace_back(&Loader::worker, l);
  return l;
}

// Blocks until the next IN-ORDER batch is ready; returns number of batches
// remaining after this one, or -1 when exhausted. out must hold
// batch*H*W*3 floats; start_index receives the batch's first path index;
// ok (len batch) receives per-image decode-success flags (failed or padded
// slots are all-zero images with ok=0).
int fgid_loader_next(void* handle, float* out, long long* start_index,
                     uint8_t* ok) {
  auto* l = static_cast<Loader*>(handle);
  Batch b;
  size_t remaining;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    if (l->batches_consumed >= l->batches_total) return -1;
    const size_t want = l->next_consume;
    l->cv_ready.wait(lk, [&] { return l->ready.count(want) != 0; });
    auto it = l->ready.find(want);
    b = std::move(it->second);
    l->ready.erase(it);
    l->next_consume += l->batch;
    ++l->batches_consumed;
    remaining = l->batches_total - l->batches_consumed;
  }
  l->cv_space.notify_all();  // next_consume moved; re-check bypass predicate
  std::memcpy(out, b.buf.data(), b.buf.size() * sizeof(float));
  if (start_index) *start_index = (long long)b.start;
  if (ok) std::memcpy(ok, b.ok.data(), b.ok.size());
  return int(remaining);
}

void fgid_loader_destroy(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->stop = true;
  }
  l->cv_ready.notify_all();
  l->cv_space.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

// single-image decode helper (data-production paths)
int fgid_decode_resize(const char* path, int out_h, int out_w,
                       const float* mean, const float* std_, int center_crop,
                       float* out) {
  Image img;
  if (!decode_file(path, &img) || !img.h || !img.w) return -1;
  resize_normalize(img, out_h, out_w, mean, std_, center_crop, out);
  return 0;
}

}  // extern "C"
