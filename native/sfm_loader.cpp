// Native data loader for structure_from_motion_tpu.
//
// Role: the host-side IO runtime. The reference leans on OpenCV's native
// imread (view_processor.py / ba_processor.py main); here a small C++
// library does the image decode + grayscale conversion + background
// prefetch so the Python orchestrator never blocks on IO between frames:
// decode of frame k+1 overlaps TPU compute of frame k.
//
// Exposed as a plain C ABI consumed via ctypes (io/native_loader.py).
// Supported formats: uncompressed 24/32-bit BMP (the upenn fixtures) and
// binary PGM (P5). Anything else falls back to the Python decoder.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int width = 0;
  int height = 0;
  std::vector<float> gray;  // H*W, BT.601 luma in [0, 255]
  bool ok = false;
  std::string error;
};

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
int32_t rd_i32(const uint8_t* p) { return static_cast<int32_t>(rd_u32(p)); }
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = std::fread(out.data(), 1, out.size(), f);
  std::fclose(f);
  return got == out.size();
}

Image decode_bmp(const std::vector<uint8_t>& d) {
  Image img;
  if (d.size() < 54 || d[0] != 'B' || d[1] != 'M') {
    img.error = "not a BMP";
    return img;
  }
  const uint32_t pixel_offset = rd_u32(&d[10]);
  const uint32_t header_size = rd_u32(&d[14]);
  if (header_size < 40) {
    img.error = "unsupported BMP header";
    return img;
  }
  const int32_t width = rd_i32(&d[18]);
  int32_t height = rd_i32(&d[22]);
  const uint16_t bpp = rd_u16(&d[28]);
  const uint32_t compression = rd_u32(&d[30]);
  if (compression != 0 || (bpp != 24 && bpp != 32) || width <= 0) {
    img.error = "unsupported BMP variant";
    return img;
  }
  const bool flip = height > 0;
  height = height > 0 ? height : -height;
  const int channels = bpp / 8;
  const size_t row_stride = (static_cast<size_t>(width) * channels + 3) & ~3ul;
  if (d.size() < pixel_offset + row_stride * height) {
    img.error = "truncated BMP";
    return img;
  }
  img.width = width;
  img.height = height;
  img.gray.resize(static_cast<size_t>(width) * height);
  for (int y = 0; y < height; ++y) {
    const int src_y = flip ? (height - 1 - y) : y;
    const uint8_t* row = d.data() + pixel_offset + row_stride * src_y;
    float* dst = img.gray.data() + static_cast<size_t>(y) * width;
    for (int x = 0; x < width; ++x) {
      const uint8_t b = row[x * channels + 0];
      const uint8_t g = row[x * channels + 1];
      const uint8_t r = row[x * channels + 2];
      dst[x] = 0.114f * b + 0.587f * g + 0.299f * r;
    }
  }
  img.ok = true;
  return img;
}

Image decode_pgm(const std::vector<uint8_t>& d) {
  Image img;
  if (d.size() < 2 || d[0] != 'P' || d[1] != '5') {
    img.error = "not a P5 PGM";
    return img;
  }
  size_t pos = 2;
  auto skip_ws = [&]() {
    while (pos < d.size()) {
      if (d[pos] == '#') {
        while (pos < d.size() && d[pos] != '\n') ++pos;
      } else if (std::isspace(d[pos])) {
        ++pos;
      } else {
        break;
      }
    }
  };
  auto read_int = [&]() -> long {
    skip_ws();
    long v = 0;
    while (pos < d.size() && std::isdigit(d[pos])) v = v * 10 + (d[pos++] - '0');
    return v;
  };
  const long w = read_int(), h = read_int(), maxv = read_int();
  ++pos;  // single whitespace after maxval
  if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255 ||
      d.size() < pos + static_cast<size_t>(w) * h) {
    img.error = "unsupported PGM";
    return img;
  }
  img.width = static_cast<int>(w);
  img.height = static_cast<int>(h);
  img.gray.resize(static_cast<size_t>(w) * h);
  const float scale = 255.0f / static_cast<float>(maxv);
  for (size_t i = 0; i < img.gray.size(); ++i)
    img.gray[i] = scale * d[pos + i];
  img.ok = true;
  return img;
}

Image decode_path(const std::string& path) {
  std::vector<uint8_t> data;
  Image img;
  if (!read_file(path.c_str(), data)) {
    img.error = "cannot read " + path;
    return img;
  }
  if (data.size() >= 2 && data[0] == 'B' && data[1] == 'M')
    return decode_bmp(data);
  if (data.size() >= 2 && data[0] == 'P' && data[1] == '5')
    return decode_pgm(data);
  img.error = "unsupported format";
  return img;
}

// ---------------------------------------------------------------------------
// Prefetching loader: worker threads decode ahead of the consumer.
// ---------------------------------------------------------------------------

struct Loader {
  std::vector<std::string> paths;
  std::vector<Image> slots;
  std::vector<std::atomic<int>> ready;  // 0 = pending, 1 = done
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<size_t> next_job{0};
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  explicit Loader(std::vector<std::string> p, int n_threads)
      : paths(std::move(p)), slots(paths.size()), ready(paths.size()) {
    for (auto& r : ready) r.store(0);
    const int n = std::max(1, n_threads);
    for (int t = 0; t < n; ++t) {
      workers.emplace_back([this]() {
        for (;;) {
          const size_t i = next_job.fetch_add(1);
          if (i >= paths.size() || stop.load()) return;
          slots[i] = decode_path(paths[i]);
          ready[i].store(1);
          cv.notify_all();
        }
      });
    }
  }
  ~Loader() {
    stop.store(true);
    for (auto& w : workers)
      if (w.joinable()) w.join();
  }
  Image* wait(size_t i) {
    if (i >= paths.size()) return nullptr;
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [&]() { return ready[i].load() == 1; });
    return &slots[i];
  }
};

}  // namespace

extern "C" {

// One-shot decode. Returns 0 on success; fills *width/*height. Call
// sfm_copy_gray afterwards with a buffer of width*height floats.
static thread_local Image g_last;

int sfm_decode(const char* path, int* width, int* height) {
  g_last = decode_path(path);
  if (!g_last.ok) return -1;
  *width = g_last.width;
  *height = g_last.height;
  return 0;
}

int sfm_copy_gray(float* out, long capacity) {
  if (!g_last.ok) return -1;
  const long n = static_cast<long>(g_last.gray.size());
  if (capacity < n) return -2;
  std::memcpy(out, g_last.gray.data(), n * sizeof(float));
  return 0;
}

// Prefetching loader API.
void* sfm_loader_open(const char** paths, long n_paths, int n_threads) {
  std::vector<std::string> p(paths, paths + n_paths);
  return new Loader(std::move(p), n_threads);
}

int sfm_loader_get(void* handle, long index, int* width, int* height) {
  auto* ld = static_cast<Loader*>(handle);
  Image* img = ld->wait(static_cast<size_t>(index));
  if (!img || !img->ok) return -1;
  *width = img->width;
  *height = img->height;
  return 0;
}

int sfm_loader_copy(void* handle, long index, float* out, long capacity) {
  auto* ld = static_cast<Loader*>(handle);
  Image* img = ld->wait(static_cast<size_t>(index));
  if (!img || !img->ok) return -1;
  const long n = static_cast<long>(img->gray.size());
  if (capacity < n) return -2;
  std::memcpy(out, img->gray.data(), n * sizeof(float));
  return 0;
}

void sfm_loader_close(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
