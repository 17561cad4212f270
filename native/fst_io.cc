// fst_io — native file decoders for the host data pipeline.
//
// The reference's only native component is a CUDA correlation kernel; this
// framework's device-side equivalent is the MXU matmul lookup (ops/corr.py).
// Host-side, the hot loop is file decoding inside the data pipeline — this
// library provides zero-copy C decoders for the flow formats plus a threaded
// batch API, loaded via ctypes (flow_supervisor_tpu/data/native.py) with a
// pure-numpy fallback when unbuilt.
//
// Formats (parity with raft_utils/frame_utils.py and util/things_io.py):
//   - Middlebury .flo: magic 202021.25f, [w, h] int32, interleaved (u, v) f32.
//   - PPM P6 (FlyingChairs): maxval 255, RGB bytes -> float [0, 1].
//   - PFM (FlyingThings): PF/Pf header, scale sign = endianness, rows flipped.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr float kFloMagic = 202021.25f;

bool read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    std::fclose(f);
    return false;
  }
  buf.resize(static_cast<size_t>(n));
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  return got == buf.size();
}

// Skips PNM whitespace/comments; returns next int or -1.
int pnm_next_int(const uint8_t* p, size_t n, size_t& i) {
  while (i < n) {
    if (p[i] == '#') {
      while (i < n && p[i] != '\n') ++i;
    } else if (p[i] == ' ' || p[i] == '\t' || p[i] == '\r' || p[i] == '\n') {
      ++i;
    } else {
      break;
    }
  }
  int v = 0;
  bool any = false;
  while (i < n && p[i] >= '0' && p[i] <= '9') {
    v = v * 10 + (p[i] - '0');
    ++i;
    any = true;
  }
  return any ? v : -1;
}

}  // namespace

extern "C" {

// ---- .flo ------------------------------------------------------------

// Returns 0 on success and writes (h, w) into dims[2].
int fst_flo_dims(const char* path, int32_t* dims) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  float magic;
  int32_t wh[2];
  bool ok = std::fread(&magic, 4, 1, f) == 1 && magic == kFloMagic &&
            std::fread(wh, 4, 2, f) == 2;
  std::fclose(f);
  if (!ok) return 2;
  dims[0] = wh[1];  // h
  dims[1] = wh[0];  // w
  return 0;
}

// out must hold h*w*2 floats.
int fst_read_flo(const char* path, float* out, int32_t h, int32_t w) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return 1;
  if (buf.size() < 12) return 2;
  float magic;
  std::memcpy(&magic, buf.data(), 4);
  if (magic != kFloMagic) return 3;
  int32_t wh[2];
  std::memcpy(wh, buf.data() + 4, 8);
  if (wh[0] != w || wh[1] != h) return 4;
  size_t need = static_cast<size_t>(h) * w * 2 * 4;
  if (buf.size() < 12 + need) return 5;
  std::memcpy(out, buf.data() + 12, need);
  return 0;
}

// ---- PPM (P6) ----------------------------------------------------------

int fst_ppm_dims(const char* path, int32_t* dims) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return 1;
  if (buf.size() < 2 || buf[0] != 'P' || buf[1] != '6') return 2;
  size_t i = 2;
  int w = pnm_next_int(buf.data(), buf.size(), i);
  int h = pnm_next_int(buf.data(), buf.size(), i);
  if (w <= 0 || h <= 0) return 3;
  dims[0] = h;
  dims[1] = w;
  return 0;
}

// out must hold h*w*3 floats; values scaled to [0, 1].
int fst_read_ppm(const char* path, float* out, int32_t h, int32_t w) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return 1;
  if (buf.size() < 2 || buf[0] != 'P' || buf[1] != '6') return 2;
  size_t i = 2;
  int fw = pnm_next_int(buf.data(), buf.size(), i);
  int fh = pnm_next_int(buf.data(), buf.size(), i);
  int maxv = pnm_next_int(buf.data(), buf.size(), i);
  if (fw != w || fh != h || maxv != 255) return 3;
  ++i;  // single whitespace after maxval
  size_t need = static_cast<size_t>(h) * w * 3;
  if (buf.size() < i + need) return 4;
  const uint8_t* p = buf.data() + i;
  const float scale = 1.0f / 255.0f;
  size_t n = need;
  for (size_t k = 0; k < n; ++k) out[k] = p[k] * scale;
  return 0;
}

// ---- PFM ---------------------------------------------------------------

// dims[3] = (h, w, channels)
int fst_pfm_dims(const char* path, int32_t* dims) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return 1;
  if (buf.size() < 2 || buf[0] != 'P' || (buf[1] != 'F' && buf[1] != 'f')) return 2;
  int channels = buf[1] == 'F' ? 3 : 1;
  size_t i = 2;
  int w = pnm_next_int(buf.data(), buf.size(), i);
  int h = pnm_next_int(buf.data(), buf.size(), i);
  if (w <= 0 || h <= 0) return 3;
  dims[0] = h;
  dims[1] = w;
  dims[2] = channels;
  return 0;
}

// out must hold h*w*c floats; output is row-flipped (top-down) like the
// reference reader and byte-swapped for big-endian files.
int fst_read_pfm(const char* path, float* out, int32_t h, int32_t w, int32_t c) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return 1;
  if (buf.size() < 2 || buf[0] != 'P' || (buf[1] != 'F' && buf[1] != 'f')) return 2;
  size_t i = 2;
  int fw = pnm_next_int(buf.data(), buf.size(), i);
  int fh = pnm_next_int(buf.data(), buf.size(), i);
  if (fw != w || fh != h) return 3;
  // scale line (float, sign = endianness)
  while (i < buf.size() && (buf[i] == ' ' || buf[i] == '\n' || buf[i] == '\r')) ++i;
  size_t j = i;
  while (j < buf.size() && buf[j] != '\n') ++j;
  std::string scale_str(reinterpret_cast<const char*>(buf.data() + i), j - i);
  float scale = std::strtof(scale_str.c_str(), nullptr);
  i = j + 1;
  bool little = scale < 0.0f;
  size_t count = static_cast<size_t>(h) * w * c;
  if (buf.size() < i + count * 4) return 4;
  const uint8_t* p = buf.data() + i;
  for (int row = 0; row < h; ++row) {
    // PFM stores rows bottom-up; emit top-down
    const uint8_t* src = p + static_cast<size_t>(h - 1 - row) * w * c * 4;
    float* dst = out + static_cast<size_t>(row) * w * c;
    if (little) {
      std::memcpy(dst, src, static_cast<size_t>(w) * c * 4);
    } else {
      for (int k = 0; k < w * c; ++k) {
        uint8_t b[4] = {src[k * 4 + 3], src[k * 4 + 2], src[k * 4 + 1],
                        src[k * 4 + 0]};
        std::memcpy(&dst[k], b, 4);
      }
    }
  }
  return 0;
}

// ---- threaded batch API -----------------------------------------------

// Load n .flo files (all h x w) into out[n, h, w, 2] with `threads` workers.
// Returns the number of failures.
int fst_read_flo_batch(const char** paths, int32_t n, float* out, int32_t h,
                       int32_t w, int32_t threads) {
  if (threads < 1) threads = 1;
  std::vector<int> failures(threads, 0);
  std::vector<std::thread> pool;
  size_t stride = static_cast<size_t>(h) * w * 2;
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int k = t; k < n; k += threads) {
        if (fst_read_flo(paths[k], out + stride * k, h, w) != 0) ++failures[t];
      }
    });
  }
  for (auto& th : pool) th.join();
  int total = 0;
  for (int v : failures) total += v;
  return total;
}

int fst_read_ppm_batch(const char** paths, int32_t n, float* out, int32_t h,
                       int32_t w, int32_t threads) {
  if (threads < 1) threads = 1;
  std::vector<int> failures(threads, 0);
  std::vector<std::thread> pool;
  size_t stride = static_cast<size_t>(h) * w * 3;
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int k = t; k < n; k += threads) {
        if (fst_read_ppm(paths[k], out + stride * k, h, w) != 0) ++failures[t];
      }
    });
  }
  for (auto& th : pool) th.join();
  int total = 0;
  for (int v : failures) total += v;
  return total;
}

}  // extern "C"
