// ibl_data: native data-loading runtime for ibl_nerf_tpu.
//
// The reference's data layer leans on torch DataLoader worker processes
// for parallel image decode at startup (dataset_interface.py:205-254).
// This library is the TPU-native equivalent: a minimal, dependency-light
// PNG decoder (zlib inflate + per-scanline unfilter) with a
// std::thread-pooled batch API and integer/area resampling, exposed via
// a C ABI for ctypes.
//
// Supported PNGs: 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced
// (what cv2.imwrite and the reference datasets produce). Falls back to
// an error code otherwise (python side then uses cv2).
//
// Build: g++ -O3 -march=native -shared -fPIC ibl_data.cc -o libibl_data.so -lz -pthread

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint8_t kPngSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

struct PngImage {
  int width = 0;
  int height = 0;
  int channels = 0;
  std::vector<uint8_t> pixels;  // h * w * channels, row-major
};

uint32_t ReadBE32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int PaethPredictor(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Returns 0 on success, negative error code otherwise.
int DecodePng(const char* path, PngImage* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if (fread(buf.data(), 1, size, f) != size_t(size)) {
    fclose(f);
    return -2;
  }
  fclose(f);

  if (size < 8 || memcmp(buf.data(), kPngSig, 8) != 0) return -3;

  int width = 0, height = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;

  size_t pos = 8;
  while (pos + 8 <= size_t(size)) {
    uint32_t len = ReadBE32(&buf[pos]);
    const char* type = reinterpret_cast<const char*>(&buf[pos + 4]);
    const uint8_t* data = &buf[pos + 8];
    if (pos + 12 + len > size_t(size)) return -4;

    if (memcmp(type, "IHDR", 4) == 0) {
      width = ReadBE32(data);
      height = ReadBE32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }

  if (width <= 0 || height <= 0 || bit_depth != 8 || interlace != 0)
    return -5;
  int channels;
  switch (color_type) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // rgb
    case 4: channels = 2; break;  // gray+alpha
    case 6: channels = 4; break;  // rgba
    default: return -6;           // palette unsupported
  }

  const size_t stride = size_t(width) * channels;
  std::vector<uint8_t> raw((stride + 1) * height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size())
    return -7;

  out->width = width;
  out->height = height;
  out->channels = channels;
  out->pixels.resize(stride * height);

  const int bpp = channels;  // bytes per pixel (8-bit)
  for (int y = 0; y < height; ++y) {
    const uint8_t* src = &raw[(stride + 1) * y];
    uint8_t filter = src[0];
    src += 1;
    uint8_t* dst = &out->pixels[stride * y];
    const uint8_t* prev = y ? &out->pixels[stride * (y - 1)] : nullptr;

    switch (filter) {
      case 0:
        memcpy(dst, src, stride);
        break;
      case 1:  // Sub
        for (size_t x = 0; x < stride; ++x)
          dst[x] = src[x] + (x >= size_t(bpp) ? dst[x - bpp] : 0);
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x)
          dst[x] = src[x] + (prev ? prev[x] : 0);
        break;
      case 3:  // Average
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          dst[x] = src[x] + uint8_t((a + b) / 2);
        }
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          int c = (prev && x >= size_t(bpp)) ? prev[x - bpp] : 0;
          dst[x] = src[x] + uint8_t(PaethPredictor(a, b, c));
        }
        break;
      default:
        return -8;
    }
  }
  return 0;
}

// Area-average resize uint8 -> float32 [0,1], channel count preserved,
// arbitrary scale via box sampling in source space.
void ResizeToFloat(const PngImage& img, int out_h, int out_w, float* out,
                   int out_channels) {
  const int c_in = img.channels;
  const float sy = float(img.height) / out_h;
  const float sx = float(img.width) / out_w;
  for (int oy = 0; oy < out_h; ++oy) {
    int y0 = int(oy * sy), y1 = int((oy + 1) * sy);
    if (y1 <= y0) y1 = y0 + 1;
    if (y1 > img.height) y1 = img.height;
    for (int ox = 0; ox < out_w; ++ox) {
      int x0 = int(ox * sx), x1 = int((ox + 1) * sx);
      if (x1 <= x0) x1 = x0 + 1;
      if (x1 > img.width) x1 = img.width;
      float acc[4] = {0, 0, 0, 0};
      int n = 0;
      for (int y = y0; y < y1; ++y) {
        const uint8_t* row = &img.pixels[size_t(y) * img.width * c_in];
        for (int x = x0; x < x1; ++x) {
          for (int ch = 0; ch < c_in; ++ch)
            acc[ch] += row[x * c_in + ch];
          ++n;
        }
      }
      float* dst = &out[(size_t(oy) * out_w + ox) * out_channels];
      for (int ch = 0; ch < out_channels; ++ch) {
        int src_ch = ch < c_in ? ch : (c_in >= 3 ? ch % c_in : 0);
        dst[ch] = acc[src_ch] / (255.0f * n);
      }
    }
  }
}

}  // namespace

extern "C" {

// Probe image dimensions. Returns 0 on success.
int ibl_probe_png(const char* path, int* h, int* w, int* c) {
  PngImage img;  // full decode; probe is only used once per dataset
  int rc = DecodePng(path, &img);
  if (rc) return rc;
  *h = img.height;
  *w = img.width;
  *c = img.channels;
  return 0;
}

// Decode one PNG into float32 [0,1] RGB (out must hold h*w*3).
int ibl_load_png_rgb(const char* path, int out_h, int out_w, float* out) {
  PngImage img;
  int rc = DecodePng(path, &img);
  if (rc) return rc;
  ResizeToFloat(img, out_h, out_w, out, 3);
  return 0;
}

// Batch-decode n PNGs in parallel into (n, out_h, out_w, 3) float32.
// status[i] receives the per-file return code. Returns the number of
// failures.
int ibl_batch_load_png_rgb(const char** paths, int n, int out_h, int out_w,
                           float* out, int* status, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = ibl_load_png_rgb(paths[i], out_h, out_w,
                                out + size_t(i) * out_h * out_w * 3);
      status[i] = rc;
      if (rc) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads && t < n; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
