// Native dataset loader: PNG (via zlib) + PGM/PPM decode and a threaded
// read-ahead prefetcher.
//
// The reference's data path is native C++ (OpenCV imread + the Examples/
// mains' load loops, e.g. Examples/RGB-D/rgbd_tum.cc LoadImages + cv::imread
// per frame). This is the TPU build's equivalent: a small, dependency-light
// decoder (zlib only) with a std::thread prefetch pool so image decode
// overlaps device compute, exposed through a C ABI consumed via ctypes
// (dani_slam_tpu/utils/native.py).
//
// Supported: PNG color types 0 (gray) and 2 (RGB) at bit depth 8 and 16
// (TUM depth maps are 16-bit gray PNGs), non-interlaced; PGM (P5) / PPM
// (P6) binary, 8/16-bit. That covers TUM, EuRoC, Bonn and the synthetic
// dataset writer.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 dataset_loader.cpp -lz -lpthread
//        -o libdataset_loader.so

#include <zlib.h>

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
  int w = 0, h = 0, channels = 0, bytes_per_sample = 0;
  std::vector<uint8_t> data;  // row-major, interleaved, native endian
  bool ok = false;
  std::string err;
};

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

Image decode_png(const uint8_t* buf, size_t len) {
  Image im;
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || memcmp(buf, sig, 8) != 0) {
    im.err = "bad png signature";
    return im;
  }
  size_t pos = 8;
  int bitdepth = 0, colortype = -1;
  std::vector<uint8_t> idat;
  while (pos + 8 <= len) {
    uint32_t clen = be32(buf + pos);
    const uint8_t* type = buf + pos + 4;
    const uint8_t* data = buf + pos + 8;
    if (pos + 12 + clen > len) {
      im.err = "truncated chunk";
      return im;
    }
    if (!memcmp(type, "IHDR", 4)) {
      im.w = (int)be32(data);
      im.h = (int)be32(data + 4);
      bitdepth = data[8];
      colortype = data[9];
      if (data[12] != 0) {
        im.err = "interlaced png unsupported";
        return im;
      }
    } else if (!memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + clen);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  int channels;
  switch (colortype) {
    case 0: channels = 1; break;
    case 2: channels = 3; break;
    case 4: channels = 2; break;
    case 6: channels = 4; break;
    default: im.err = "unsupported color type"; return im;
  }
  if (bitdepth != 8 && bitdepth != 16) {
    im.err = "unsupported bit depth";
    return im;
  }
  int bps = bitdepth / 8;
  size_t stride = size_t(im.w) * channels * bps;
  size_t raw_size = (stride + 1) * im.h;
  std::vector<uint8_t> raw(raw_size);
  uLongf out_len = raw_size;
  if (uncompress(raw.data(), &out_len, idat.data(), idat.size()) != Z_OK ||
      out_len != raw_size) {
    im.err = "zlib inflate failed";
    return im;
  }
  im.channels = channels;
  im.bytes_per_sample = bps;
  im.data.resize(stride * im.h);
  int bpp = channels * bps;  // filter unit
  for (int y = 0; y < im.h; ++y) {
    const uint8_t* src = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = im.data.data() + size_t(y) * stride;
    const uint8_t* up =
        y > 0 ? im.data.data() + size_t(y - 1) * stride : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: im.err = "bad filter"; return im;
      }
      dst[x] = uint8_t(v);
    }
  }
  // 16-bit samples are big-endian in PNG -> convert to host little-endian
  if (bps == 2) {
    for (size_t i = 0; i + 1 < im.data.size(); i += 2)
      std::swap(im.data[i], im.data[i + 1]);
  }
  im.ok = true;
  return im;
}

Image decode_pnm(const uint8_t* buf, size_t len) {
  Image im;
  if (len < 2 || buf[0] != 'P' || (buf[1] != '5' && buf[1] != '6')) {
    im.err = "not pnm";
    return im;
  }
  int channels = buf[1] == '6' ? 3 : 1;
  size_t pos = 2;
  int fields[3], nf = 0;
  while (nf < 3 && pos < len) {
    while (pos < len && (buf[pos] == ' ' || buf[pos] == '\n' ||
                         buf[pos] == '\t' || buf[pos] == '\r'))
      ++pos;
    if (pos < len && buf[pos] == '#') {
      while (pos < len && buf[pos] != '\n') ++pos;
      continue;
    }
    int v = 0;
    bool any = false;
    while (pos < len && buf[pos] >= '0' && buf[pos] <= '9') {
      v = v * 10 + (buf[pos] - '0');
      ++pos;
      any = true;
    }
    if (any) fields[nf++] = v;
  }
  ++pos;  // single whitespace after maxval
  if (nf < 3) {
    im.err = "bad pnm header";
    return im;
  }
  im.w = fields[0];
  im.h = fields[1];
  int maxv = fields[2];
  im.channels = channels;
  im.bytes_per_sample = maxv > 255 ? 2 : 1;
  size_t sz = size_t(im.w) * im.h * channels * im.bytes_per_sample;
  if (pos + sz > len) {
    im.err = "truncated pnm";
    return im;
  }
  im.data.assign(buf + pos, buf + pos + sz);
  if (im.bytes_per_sample == 2) {  // PNM 16-bit is big-endian too
    for (size_t i = 0; i + 1 < im.data.size(); i += 2)
      std::swap(im.data[i], im.data[i + 1]);
  }
  im.ok = true;
  return im;
}

Image decode_file(const char* path) {
  Image im;
  FILE* f = fopen(path, "rb");
  if (!f) {
    im.err = "open failed";
    return im;
  }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n);
  if (fread(buf.data(), 1, n, f) != size_t(n)) {
    fclose(f);
    im.err = "read failed";
    return im;
  }
  fclose(f);
  if (n >= 8 && buf[0] == 137 && buf[1] == 'P') return decode_png(buf.data(), n);
  return decode_pnm(buf.data(), n);
}

// ---------------------------------------------------------------------------
// Prefetcher: worker threads decode a window of files ahead of the consumer
// (the reference reads + decodes synchronously inside the tracking loop;
// overlapping decode with device compute is the two-rate analogue of its
// OS page cache + spinning-disk pipeline)
// ---------------------------------------------------------------------------

struct Prefetcher {
  std::vector<std::string> paths;
  std::vector<Image> slots;
  std::vector<std::atomic<int>> state;  // 0 empty, 1 decoding, 2 ready, 3 released
  std::atomic<size_t> next_fetch{0};
  std::atomic<bool> stop{false};
  size_t window;
  std::atomic<size_t> consumed{0};
  std::vector<std::thread> workers;
  std::mutex m;
  std::condition_variable cv;

  Prefetcher(std::vector<std::string> p, int n_threads, int win)
      : paths(std::move(p)), slots(paths.size()),
        state(paths.size()), window(win) {
    for (auto& s : state) s.store(0);
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { work(); });
  }
  ~Prefetcher() {
    stop.store(true);
    cv.notify_all();
    for (auto& w : workers) w.join();
  }
  void work() {
    while (!stop.load()) {
      size_t i = next_fetch.load();
      if (i >= paths.size() || i >= consumed.load() + window) {
        std::unique_lock<std::mutex> lk(m);
        cv.wait_for(lk, std::chrono::milliseconds(20));
        continue;
      }
      if (!next_fetch.compare_exchange_strong(i, i + 1)) continue;
      state[i].store(1);
      slots[i] = decode_file(paths[i].c_str());
      // publish under the mutex: a store+notify landing between the
      // consumer's predicate check and its sleep would otherwise be a lost
      // wakeup (get() waits without timeout)
      {
        std::lock_guard<std::mutex> lk(m);
        state[i].store(2);
      }
      cv.notify_all();
    }
  }
  Image* get(size_t i) {
    if (i >= paths.size()) return nullptr;
    {
      std::unique_lock<std::mutex> lk(m);
      cv.wait(lk, [&] {
        int s = state[i].load();
        return s == 2 || s == 3 || stop.load();
      });
    }
    if (state[i].load() != 2) return nullptr;  // released or shutting down
    consumed.store(i + 1);
    cv.notify_all();
    return &slots[i];
  }
  void release(size_t i) {
    if (i < slots.size()) {
      slots[i].data.clear();
      slots[i].data.shrink_to_fit();
      // re-access of a released slot must error (dsl_prefetcher_get returns
      // rc=-1 and the Python side falls back to the sync loader) instead of
      // wrapping an untouched output buffer as an image
      state[i].store(3);
    }
  }
};

}  // namespace

extern "C" {

// Single-file decode. Caller passes a buffer of cap bytes; on success the
// image is copied there. Returns 0 ok / negative error. Metadata out params.
int dsl_decode(const char* path, uint8_t* out, int64_t cap, int32_t* w,
               int32_t* h, int32_t* channels, int32_t* bytes_per_sample) {
  Image im = decode_file(path);
  if (!im.ok) return -1;
  if ((int64_t)im.data.size() > cap) return -2;
  memcpy(out, im.data.data(), im.data.size());
  *w = im.w;
  *h = im.h;
  *channels = im.channels;
  *bytes_per_sample = im.bytes_per_sample;
  return 0;
}

// Probe metadata without copying pixels.
int dsl_probe(const char* path, int32_t* w, int32_t* h, int32_t* channels,
              int32_t* bytes_per_sample) {
  Image im = decode_file(path);
  if (!im.ok) return -1;
  *w = im.w;
  *h = im.h;
  *channels = im.channels;
  *bytes_per_sample = im.bytes_per_sample;
  return 0;
}

void* dsl_prefetcher_create(const char** paths, int n, int n_threads,
                            int window) {
  std::vector<std::string> p(paths, paths + n);
  return new Prefetcher(std::move(p), n_threads, window);
}

int dsl_prefetcher_get(void* pf, int64_t idx, uint8_t* out, int64_t cap,
                       int32_t* w, int32_t* h, int32_t* channels,
                       int32_t* bytes_per_sample) {
  auto* p = static_cast<Prefetcher*>(pf);
  Image* im = p->get(idx);
  if (!im || !im->ok) return -1;
  if ((int64_t)im->data.size() > cap) return -2;
  memcpy(out, im->data.data(), im->data.size());
  *w = im->w;
  *h = im->h;
  *channels = im->channels;
  *bytes_per_sample = im->bytes_per_sample;
  p->release(idx);
  return 0;
}

void dsl_prefetcher_destroy(void* pf) { delete static_cast<Prefetcher*>(pf); }

}  // extern "C"
