// Golden-reference driver: compiles the *reference* DSP cores (read-only
// checkout at /root/reference, passed via -I/REF= at build time) into a CLI
// that streams raw float32 audio through a chosen meter and prints JSON
// readouts.  Used once to generate committed fixtures
// (tests/fixtures/*.json); the TPU framework is tested against those.
//
// This file is original driver code; it links against the unmodified
// reference sources (jmeters/*, ebumeter/*, zita-resampler/*, src/spectr.c).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "jmeters/vumeterdsp.h"
#include "jmeters/iec1ppmdsp.h"
#include "jmeters/iec2ppmdsp.h"
#include "jmeters/msppmdsp.h"
#include "jmeters/kmeterdsp.h"
#include "jmeters/truepeakdsp.h"
#include "jmeters/stcorrdsp.h"
#include "ebumeter/ebu_r128_proc.h"

// the 1/3-octave filter bank is written for direct inclusion
#include "src/spectr.c"

using namespace LV2M;

static std::vector<float> read_f32(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::perror("open"); std::exit(1); }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f) / sizeof(float);
  std::fseek(f, 0, SEEK_SET);
  std::vector<float> v(n);
  if (std::fread(v.data(), sizeof(float), n, f) != (size_t)n) std::exit(1);
  std::fclose(f);
  return v;
}

int main(int argc, char** argv) {
  if (argc < 7) {
    std::fprintf(stderr,
                 "usage: %s <meter> <fs> <block> <read_every> <nchan> <raw_f32_interleaved>\n"
                 "meters: vu iec1 iec2 kmeter truepeak stcorr ebur128 spectrum msppm\n",
                 argv[0]);
    return 2;
  }
  std::string meter = argv[1];
  float fs = std::atof(argv[2]);
  int block = std::atoi(argv[3]);
  int read_every = std::atoi(argv[4]);
  int nchan = std::atoi(argv[5]);
  std::vector<float> inter = read_f32(argv[6]);
  long nfr = inter.size() / nchan;

  // deinterleave
  std::vector<std::vector<float>> ch(nchan, std::vector<float>(nfr));
  for (long t = 0; t < nfr; ++t)
    for (int c = 0; c < nchan; ++c) ch[c][t] = inter[t * nchan + c];

  long nblocks = nfr / block;

  if (meter == "vu" || meter == "iec1" || meter == "iec2") {
    std::vector<JmeterDSP*> m;
    for (int c = 0; c < nchan; ++c) {
      JmeterDSP* p;
      if (meter == "vu") { p = new Vumeterdsp(); static_cast<Vumeterdsp*>(p)->init(fs); }
      else if (meter == "iec1") { p = new Iec1ppmdsp(); static_cast<Iec1ppmdsp*>(p)->init(fs); }
      else { p = new Iec2ppmdsp(); static_cast<Iec2ppmdsp*>(p)->init(fs); }
      m.push_back(p);
    }
    for (long b = 0; b < nblocks; ++b) {
      for (int c = 0; c < nchan; ++c) m[c]->process(&ch[c][b * block], block);
      if ((b + 1) % read_every == 0) {
        std::printf("{\"block\": %ld, \"values\": [", b);
        for (int c = 0; c < nchan; ++c)
          std::printf("%s%.9g", c ? ", " : "", m[c]->read());
        std::printf("]}\n");
      }
    }
  } else if (meter == "msppm") {
    Msppmdsp mM(-6), mS(-6);
    mM.init(fs);
    for (long b = 0; b < nblocks; ++b) {
      mM.processM(&ch[0][b * block], &ch[1][b * block], block);
      mS.processS(&ch[0][b * block], &ch[1][b * block], block);
      if ((b + 1) % read_every == 0)
        std::printf("{\"block\": %ld, \"values\": [%.9g, %.9g]}\n", b, mM.read(), mS.read());
    }
  } else if (meter == "kmeter") {
    std::vector<Kmeterdsp*> m;
    for (int c = 0; c < nchan; ++c) { m.push_back(new Kmeterdsp()); m[c]->init(fs); }
    for (long b = 0; b < nblocks; ++b) {
      for (int c = 0; c < nchan; ++c) m[c]->process(&ch[c][b * block], block);
      if ((b + 1) % read_every == 0) {
        std::printf("{\"block\": %ld, \"values\": [", b);
        for (int c = 0; c < nchan; ++c) {
          float r, p;
          m[c]->read(r, p);
          std::printf("%s%.9g, %.9g", c ? ", " : "", r, p);
        }
        std::printf("]}\n");
      }
    }
  } else if (meter == "truepeak") {
    std::vector<TruePeakdsp*> m;
    for (int c = 0; c < nchan; ++c) { m.push_back(new TruePeakdsp()); m[c]->init(fs); }
    for (long b = 0; b < nblocks; ++b) {
      for (int c = 0; c < nchan; ++c) m[c]->process(&ch[c][b * block], block);
      if ((b + 1) % read_every == 0) {
        std::printf("{\"block\": %ld, \"values\": [", b);
        for (int c = 0; c < nchan; ++c) {
          float mm, pp;
          m[c]->read(mm, pp);
          std::printf("%s%.9g, %.9g", c ? ", " : "", mm, pp);
        }
        std::printf("]}\n");
      }
    }
  } else if (meter == "stcorr") {
    Stcorrdsp m;
    m.init((int)fs, 2e3f, 0.3f);
    for (long b = 0; b < nblocks; ++b) {
      m.process(&ch[0][b * block], &ch[1][b * block], block);
      if ((b + 1) % read_every == 0)
        std::printf("{\"block\": %ld, \"values\": [%.9g]}\n", b, m.read());
    }
  } else if (meter == "ebur128") {
    Ebu_r128_proc m;
    m.init(nchan, fs);
    m.integr_start();
    std::vector<float*> ptrs(nchan);
    for (long b = 0; b < nblocks; ++b) {
      for (int c = 0; c < nchan; ++c) ptrs[c] = &ch[c][b * block];
      m.process(block, ptrs.data());
      if ((b + 1) % read_every == 0) {
        std::printf(
            "{\"block\": %ld, \"M\": %.9g, \"S\": %.9g, \"maxM\": %.9g, "
            "\"maxS\": %.9g, \"I\": %.9g, \"LRAmin\": %.9g, \"LRAmax\": %.9g}\n",
            b, m.loudness_M(), m.loudness_S(), m.maxloudn_M(), m.maxloudn_S(),
            m.integrated(), m.range_min(), m.range_max());
      }
    }
    // final state incl. histograms
    std::printf("{\"final\": true, \"M\": %.9g, \"S\": %.9g, \"maxM\": %.9g, "
                "\"maxS\": %.9g, \"I\": %.9g, \"Ithr\": %.9g, \"LRAmin\": %.9g, "
                "\"LRAmax\": %.9g, \"LRAthr\": %.9g, \"countM\": %d, \"countS\": %d, "
                "\"histM\": [",
                m.loudness_M(), m.loudness_S(), m.maxloudn_M(), m.maxloudn_S(),
                m.integrated(), m.integ_thr(), m.range_min(), m.range_max(),
                m.range_thr(), m.hist_M_count(), m.hist_S_count());
    for (int i = 0; i < 751; ++i) std::printf("%s%d", i ? "," : "", m.histogram_M()[i]);
    std::printf("], \"histS\": [");
    for (int i = 0; i < 751; ++i) std::printf("%s%d", i ? "," : "", m.histogram_S()[i]);
    std::printf("]}\n");
  } else if (meter == "spectrum") {
    // 30-band 1/3-octave bank + display smoothing, as spectrumlv2.c:100-248
    const int NB = 30;
    struct FilterBank flt[NB];
    float val_f[NB] = {0}, max_f[NB] = {0};
    const double f1f = pow(2, -1. / 6.), f2f = pow(2, 1. / 6.);
    for (int i = 0; i < NB; ++i) {
      const double f_m = pow(2, (i - 16) / 3.) * 1000.0;
      bandpass_setup(&flt[i], fs, f_m, f_m * f2f - f_m * f1f, 6);
    }
    float omega = 1.0f - expf(-2.0 * M_PI * 1.0 / fs);
    for (long b = 0; b < nblocks; ++b) {
      for (int j = 0; j < block; ++j) {
        float in = nchan == 2
                       ? (ch[0][b * block + j] + ch[1][b * block + j]) / 2.0f
                       : ch[0][b * block + j];
        for (int i = 0; i < NB; ++i) {
          const float v = bandpass_process(&flt[i], in);
          const float s = v * v;
          val_f[i] += omega * (s - val_f[i]);
          if (val_f[i] > max_f[i]) max_f[i] = val_f[i];
        }
      }
      for (int i = 0; i < NB; ++i) {
        if (!isfinite(val_f[i])) val_f[i] = 0;
        val_f[i] += 1e-20f;
      }
      if ((b + 1) % read_every == 0) {
        std::printf("{\"block\": %ld, \"bands\": [", b);
        for (int i = 0; i < NB; ++i) {
          const float vs = sqrtf(2. * val_f[i]);
          std::printf("%s%.9g", i ? ", " : "", vs > .00001f ? 20.0 * log10f(vs) : -100.0);
        }
        std::printf("], \"peaks\": [");
        for (int i = 0; i < NB; ++i) {
          const float mx = sqrtf(2. * max_f[i]);
          std::printf("%s%.9g", i ? ", " : "", mx > .00001f ? 20.0 * log10f(mx) : -100.0);
        }
        std::printf("]}\n");
      }
    }
  } else if (meter == "resample") {
    // zita polyphase upsampler, goniometer config: setup(fs, fs*factor, 2,
    // hlen, 1.0) with an 8192-zero prefeed (gui/goniometer.c:155-189).
    // block = oversample factor, read_every = hlen (CLI arg reuse).
    int factor = block;
    int hlen = read_every;
    Resampler src;
    if (src.setup((unsigned)fs, (unsigned)(fs * factor), 2, hlen, 1.0)) {
      std::fprintf(stderr, "resampler setup failed\n");
      return 3;
    }
    std::vector<float> zeros(8192 * 2, 0.f);
    std::vector<float> obuf(8192 * 2 * factor);
    src.inp_count = 8192;
    src.inp_data = zeros.data();
    src.out_count = 8192 * factor;
    src.out_data = obuf.data();
    src.process();
    std::vector<float> out(nfr * factor * 2);
    src.inp_count = nfr;
    src.inp_data = inter.data();
    src.out_count = nfr * factor;
    src.out_data = out.data();
    src.process();
    std::printf("{\"factor\": %d, \"hlen\": %d, \"n\": %ld, \"data\": [", factor,
                hlen, (long)(nfr * factor * 2));
    for (long i = 0; i < nfr * factor * 2; ++i)
      std::printf("%s%.9g", i ? "," : "", out[i]);
    std::printf("]}\n");
  } else {
    std::fprintf(stderr, "unknown meter %s\n", meter.c_str());
    return 2;
  }
  return 0;
}
