// Native asynchronous image-loading pipeline for the SLAM frame loop.
//
// The runtime counterpart of the reference's driver-side image IO
// (Examples/Monocular/mono_tum.cc LoadImages + the per-frame cv::imread
// in the main loop): a C++ worker pool decodes frames ahead of the
// consumer into a bounded ring buffer, so disk IO and PNG inflate never
// sit on the Python/JAX dispatch path.  Python binds via ctypes
// (io/native_loader.py) — no pybind11 dependency.
//
// Formats: 8-bit grayscale/RGB/RGBA PNG (non-interlaced; zlib inflate +
// per-row unfilter, converted to grayscale) and binary PGM (P5, 8/16
// bit).  16-bit PGM/PNG values are passed through scaled for depth maps.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC loader.cpp -lz).

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

#include <zlib.h>

namespace {

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;   // decoded source channels
  int bit_depth = 8;  // 8 or 16
  std::vector<float> gray;  // h*w grayscale (or depth) in float32
  bool ok = false;
  std::string error;
};

// ---------------------------------------------------------------------
// PNG decoding (8/16-bit, non-interlaced, color types 0/2/4/6)
// ---------------------------------------------------------------------

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool decode_png(const std::vector<uint8_t>& data, Image* out) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (data.size() < 8 || memcmp(data.data(), kSig, 8) != 0) {
    out->error = "bad PNG signature";
    return false;
  }
  size_t pos = 8;
  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= data.size()) {
    uint32_t len = be32(&data[pos]);
    if (pos + 12 + len > data.size()) break;
    const char* type = reinterpret_cast<const char*>(&data[pos + 4]);
    const uint8_t* payload = &data[pos + 8];
    if (!memcmp(type, "IHDR", 4)) {
      w = be32(payload);
      h = be32(payload + 4);
      bit_depth = payload[8];
      color_type = payload[9];
      interlace = payload[12];
    } else if (!memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (w == 0 || h == 0) { out->error = "no IHDR"; return false; }
  if (interlace != 0) { out->error = "interlaced PNG unsupported"; return false; }
  if (bit_depth != 8 && bit_depth != 16) {
    out->error = "unsupported bit depth";
    return false;
  }
  int channels;
  switch (color_type) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // rgb
    case 4: channels = 2; break;  // gray+alpha
    case 6: channels = 4; break;  // rgba
    default: out->error = "unsupported color type"; return false;
  }

  const int bypp = channels * (bit_depth / 8);       // bytes per pixel
  const size_t stride = size_t(w) * bypp;            // bytes per row
  std::vector<uint8_t> raw(h * (stride + 1));
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    out->error = "zlib inflate failed";
    return false;
  }

  // unfilter row by row
  std::vector<uint8_t> img(h * stride);
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* src = &raw[y * (stride + 1)];
    uint8_t filter = src[0];
    const uint8_t* s = src + 1;
    uint8_t* d = &img[y * stride];
    const uint8_t* up = y ? &img[(y - 1) * stride] : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bypp) ? d[x - bypp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(bypp)) ? up[x - bypp] : 0;
      int v = s[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: out->error = "bad filter"; return false;
      }
      d[x] = uint8_t(v);
    }
  }

  // to grayscale float (16-bit: big-endian samples)
  out->width = int(w);
  out->height = int(h);
  out->channels = channels;
  out->bit_depth = bit_depth;
  out->gray.resize(size_t(w) * h);
  const int samples = channels;
  for (size_t i = 0; i < size_t(w) * h; ++i) {
    const uint8_t* px = &img[i * bypp];
    float v;
    if (bit_depth == 8) {
      if (samples >= 3)
        v = 0.299f * px[0] + 0.587f * px[1] + 0.114f * px[2];
      else
        v = float(px[0]);
    } else {  // 16-bit
      auto rd = [&](int s_) {
        return float((uint32_t(px[2 * s_]) << 8) | px[2 * s_ + 1]);
      };
      if (samples >= 3)
        v = 0.299f * rd(0) + 0.587f * rd(1) + 0.114f * rd(2);
      else
        v = rd(0);
    }
    out->gray[i] = v;
  }
  out->ok = true;
  return true;
}

// ---------------------------------------------------------------------
// PGM (P5) decoding
// ---------------------------------------------------------------------

bool decode_pgm(const std::vector<uint8_t>& data, Image* out) {
  if (data.size() < 2 || data[0] != 'P' || data[1] != '5') {
    out->error = "not a P5 PGM";
    return false;
  }
  size_t pos = 2;
  auto skip_ws = [&]() {
    while (pos < data.size()) {
      if (data[pos] == '#') {
        while (pos < data.size() && data[pos] != '\n') ++pos;
      } else if (isspace(data[pos])) {
        ++pos;
      } else {
        break;
      }
    }
  };
  auto read_int = [&]() {
    skip_ws();
    long v = 0;
    while (pos < data.size() && isdigit(data[pos])) v = v * 10 + (data[pos++] - '0');
    return v;
  };
  long w = read_int(), h = read_int(), maxval = read_int();
  ++pos;  // single whitespace after maxval
  if (w <= 0 || h <= 0 || maxval <= 0) { out->error = "bad PGM header"; return false; }
  const int bytes = maxval > 255 ? 2 : 1;
  if (pos + size_t(w) * h * bytes > data.size()) {
    out->error = "truncated PGM";
    return false;
  }
  out->width = int(w);
  out->height = int(h);
  out->channels = 1;
  out->bit_depth = bytes * 8;
  out->gray.resize(size_t(w) * h);
  const uint8_t* p = &data[pos];
  for (long i = 0; i < w * h; ++i) {
    out->gray[i] = bytes == 1 ? float(p[i])
                              : float((uint32_t(p[2 * i]) << 8) | p[2 * i + 1]);
  }
  out->ok = true;
  return true;
}

bool decode_file(const std::string& path, Image* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) { out->error = "open failed: " + path; return false; }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(sz);
  size_t rd = fread(data.data(), 1, sz, f);
  fclose(f);
  if (long(rd) != sz) { out->error = "short read"; return false; }
  if (sz >= 8 && data[0] == 137 && data[1] == 'P') return decode_png(data, out);
  if (sz >= 2 && data[0] == 'P' && data[1] == '5') return decode_pgm(data, out);
  out->error = "unknown format";
  return false;
}

// ---------------------------------------------------------------------
// Prefetching pipeline: worker pool decodes into slots, consumer pops
// strictly in order
// ---------------------------------------------------------------------

struct Loader {
  std::vector<std::string> files;
  std::vector<Image> slots;
  std::vector<std::atomic<int>> state;  // 0 = pending, 1 = busy, 2 = ready
  std::atomic<size_t> next_job{0};
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv;
  size_t window = 16;  // max decode-ahead
  std::atomic<size_t> consumed{0};

  explicit Loader(std::vector<std::string> fs, int n_threads, int ahead)
      : files(std::move(fs)), slots(files.size()),
        state(files.size()), window(ahead) {
    for (auto& s : state) s.store(0);
    for (int i = 0; i < n_threads; ++i) {
      workers.emplace_back([this] { work(); });
    }
  }

  ~Loader() {
    stop.store(true);
    cv.notify_all();
    for (auto& w : workers) w.join();
  }

  void work() {
    while (!stop.load()) {
      size_t j = next_job.load();
      if (j >= files.size()) break;
      // respect the decode-ahead window (bounds memory)
      if (j >= consumed.load() + window) {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait_for(lk, std::chrono::milliseconds(20));
        continue;
      }
      if (!next_job.compare_exchange_strong(j, j + 1)) continue;
      int expect = 0;
      if (!state[j].compare_exchange_strong(expect, 1)) continue;
      decode_file(files[j], &slots[j]);
      state[j].store(2);
      cv.notify_all();
    }
  }

  // blocks until frame idx is decoded
  Image* get(size_t idx) {
    if (idx >= files.size()) return nullptr;
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [&] { return state[idx].load() == 2 || stop.load(); });
    consumed.store(idx + 1);
    cv.notify_all();
    return &slots[idx];
  }

  void release(size_t idx) {
    if (idx < slots.size()) {
      slots[idx].gray.clear();
      slots[idx].gray.shrink_to_fit();
    }
  }
};

}  // namespace

extern "C" {

void* loader_create(const char** paths, int n, int n_threads, int ahead) {
  std::vector<std::string> fs(paths, paths + n);
  return new Loader(std::move(fs), n_threads, ahead);
}

void loader_destroy(void* h) { delete static_cast<Loader*>(h); }

// Returns 0 on success; fills w/h; caller then calls loader_copy.
int loader_get_info(void* h, int idx, int* w, int* hh) {
  Loader* l = static_cast<Loader*>(h);
  Image* im = l->get(idx);
  if (!im || !im->ok) return -1;
  *w = im->width;
  *hh = im->height;
  return 0;
}

// Copies the decoded grayscale floats into out (w*h) and frees the slot.
int loader_copy(void* h, int idx, float* out) {
  Loader* l = static_cast<Loader*>(h);
  Image* im = l->get(idx);
  if (!im || !im->ok) return -1;
  memcpy(out, im->gray.data(), im->gray.size() * sizeof(float));
  l->release(idx);
  return 0;
}

const char* loader_error(void* h, int idx) {
  Loader* l = static_cast<Loader*>(h);
  if (idx < 0 || size_t(idx) >= l->slots.size()) return "bad index";
  return l->slots[idx].error.c_str();
}

// One-shot synchronous decode (testing / simple use)
int decode_image(const char* path, float* out, int max_len, int* w, int* h) {
  Image im;
  if (!decode_file(path, &im)) return -1;
  if (int(im.gray.size()) > max_len) return -2;
  *w = im.width;
  *h = im.height;
  memcpy(out, im.gray.data(), im.gray.size() * sizeof(float));
  return 0;
}

}  // extern "C"
