// RIFF/WAVE reader & writer → planar float32.
// Original implementation (chunk-walking parser; PCM 16/24/32 + IEEE
// float32/float64), part of the meters.lv2-tpu native runtime.

#include "meters_native.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Reader {
  FILE* f;
  bool ok = true;
  uint32_t u32() {
    unsigned char b[4];
    if (std::fread(b, 1, 4, f) != 4) { ok = false; return 0; }
    return b[0] | (b[1] << 8) | ((uint32_t)b[2] << 16) | ((uint32_t)b[3] << 24);
  }
  uint16_t u16() {
    unsigned char b[2];
    if (std::fread(b, 1, 2, f) != 2) { ok = false; return 0; }
    return b[0] | (b[1] << 8);
  }
  bool tag(char* out4) { return std::fread(out4, 1, 4, f) == 4; }
};

inline float pcm16(const unsigned char* p) {
  int16_t v = (int16_t)(p[0] | (p[1] << 8));
  return (float)v / 32768.0f;
}
inline float pcm24(const unsigned char* p) {
  int32_t v = (p[0] << 8) | (p[1] << 16) | ((int32_t)p[2] << 24);
  return (float)(v >> 8) / 8388608.0f;
}
inline float pcm32(const unsigned char* p) {
  int32_t v = p[0] | (p[1] << 8) | ((int32_t)p[2] << 16) | ((int32_t)p[3] << 24);
  return (float)v / 2147483648.0f;
}

}  // namespace

extern "C" int mt_wav_read(const char* path, float** data, int32_t* nchan,
                           int64_t* nframes, int32_t* rate) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Reader r{f};
  char tag[5] = {0};
  if (!r.tag(tag) || std::strncmp(tag, "RIFF", 4)) { std::fclose(f); return -2; }
  r.u32();  // riff size
  if (!r.tag(tag) || std::strncmp(tag, "WAVE", 4)) { std::fclose(f); return -2; }

  uint16_t fmt = 0, ch = 0, bits = 0;
  uint32_t sr = 0;
  long data_pos = -1;
  uint32_t data_len = 0;

  while (r.tag(tag)) {
    uint32_t len = r.u32();
    if (!r.ok) break;
    if (!std::strncmp(tag, "fmt ", 4)) {
      fmt = r.u16();
      ch = r.u16();
      sr = r.u32();
      r.u32();  // byte rate
      r.u16();  // block align
      bits = r.u16();
      if (fmt == 0xFFFE && len >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        r.u16();                          // cbSize
        r.u16();                          // valid bits
        r.u32();                          // channel mask
        fmt = r.u16();                    // sub-format GUID leading u16
        // 14 GUID tail bytes + any extension beyond the canonical 40,
        // so the chunk walker stays aligned for oversized fmt chunks
        std::fseek(f, 14 + (long)(len - 40), SEEK_CUR);
        len = 0;  // consumed
      } else if (len > 16) {
        std::fseek(f, len - 16, SEEK_CUR);
        len = 0;
      } else {
        len = 0;
      }
    } else if (!std::strncmp(tag, "data", 4)) {
      data_pos = std::ftell(f);
      data_len = len;
      std::fseek(f, (len + 1) & ~1u, SEEK_CUR);
      len = 0;
    } else {
      std::fseek(f, (len + 1) & ~1u, SEEK_CUR);
      len = 0;
    }
  }
  // bits gates the sample decode AND the frame-count division below —
  // a malformed fmt chunk with bits 0 would SIGFPE on (bytes * ch)
  if (!ch || !sr || data_pos < 0 ||
      !(bits == 16 || bits == 24 || bits == 32 || bits == 64)) {
    std::fclose(f);
    return -3;
  }

  int bytes = bits / 8;
  int64_t frames = (int64_t)data_len / (bytes * ch);
  std::vector<unsigned char> raw(data_len);
  std::fseek(f, data_pos, SEEK_SET);
  if (std::fread(raw.data(), 1, data_len, f) != data_len) {
    std::fclose(f);
    return -4;
  }
  std::fclose(f);

  float* out = (float*)std::malloc(sizeof(float) * frames * ch);
  if (!out) return -5;
  const unsigned char* p = raw.data();
  for (int64_t t = 0; t < frames; ++t) {
    for (int c = 0; c < ch; ++c, p += bytes) {
      float v;
      if (fmt == 3 && bits == 32) {
        std::memcpy(&v, p, 4);
      } else if (fmt == 3 && bits == 64) {
        double d;
        std::memcpy(&d, p, 8);
        v = (float)d;
      } else if (bits == 16) {
        v = pcm16(p);
      } else if (bits == 24) {
        v = pcm24(p);
      } else if (bits == 32) {
        v = pcm32(p);
      } else {
        std::free(out);
        return -6;
      }
      out[(int64_t)c * frames + t] = v;  // planar
    }
  }
  *data = out;
  *nchan = ch;
  *nframes = frames;
  *rate = (int32_t)sr;
  return 0;
}

extern "C" int mt_wav_write(const char* path, const float* data, int32_t nchan,
                            int64_t nframes, int32_t rate, int32_t format) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const int bytes = (format == 16) ? 2 : 4;
  const uint16_t fmt = (format == 16) ? 1 : 3;
  const uint32_t dlen = (uint32_t)(nframes * nchan * bytes);

  auto w16 = [&](uint16_t v) { std::fputc(v & 0xFF, f); std::fputc(v >> 8, f); };
  auto w32 = [&](uint32_t v) {
    for (int i = 0; i < 4; ++i) std::fputc((v >> (8 * i)) & 0xFF, f);
  };
  std::fwrite("RIFF", 1, 4, f);
  w32(36 + dlen);
  std::fwrite("WAVE", 1, 4, f);
  std::fwrite("fmt ", 1, 4, f);
  w32(16);
  w16(fmt);
  w16((uint16_t)nchan);
  w32((uint32_t)rate);
  w32((uint32_t)(rate * nchan * bytes));
  w16((uint16_t)(nchan * bytes));
  w16((uint16_t)(bytes * 8));
  std::fwrite("data", 1, 4, f);
  w32(dlen);
  for (int64_t t = 0; t < nframes; ++t) {
    for (int c = 0; c < nchan; ++c) {
      float v = data[(int64_t)c * nframes + t];
      if (format == 16) {
        float cl = v < -1.f ? -1.f : (v > 1.f ? 1.f : v);
        int16_t s = (int16_t)(cl * 32767.0f);
        w16((uint16_t)s);
      } else {
        uint32_t u;
        std::memcpy(&u, &v, 4);
        w32(u);
      }
    }
  }
  std::fclose(f);
  return 0;
}

extern "C" void mt_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// Parallel batch decode: the production ingest path.  The reference's
// runtime is a realtime host feeding one stream; a batch framework's
// data-loader must keep the accelerator fed, so decoding fans out over a
// thread pool (one malloc'd planar buffer per file, like mt_wav_read).
// ---------------------------------------------------------------------------

#include <atomic>
#include <thread>

extern "C" int mt_wav_read_batch(const char** paths, int32_t n,
                                 int32_t n_threads, float** data,
                                 int32_t* nchan, int64_t* nframes,
                                 int32_t* rate, int32_t* rc) {
  if (n <= 0) return 0;
  int workers = n_threads > 0 ? n_threads
                              : (int)std::thread::hardware_concurrency();
  if (workers < 1) workers = 1;
  if (workers > n) workers = n;
  std::atomic<int32_t> next(0);
  std::atomic<int32_t> failures(0);
  auto run = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) break;
      rc[i] = mt_wav_read(paths[i], &data[i], &nchan[i], &nframes[i],
                          &rate[i]);
      if (rc[i] != 0) {
        data[i] = nullptr;
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int w = 0; w < workers; ++w) pool.emplace_back(run);
  for (auto& t : pool) t.join();
  return failures.load();
}
