// Golden-reference driver: compiles the *reference* DSP cores (read-only
// checkout at /root/reference, passed via -I/REF= at build time) into a CLI
// that streams raw float32 audio through a chosen meter and prints JSON
// readouts.  Used once to generate committed fixtures
// (tests/fixtures/*.json); the TPU framework is tested against those.
//
// This file is original driver code; it links against the unmodified
// reference sources (jmeters/*, ebumeter/*, zita-resampler/*, src/spectr.c).

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstdint>
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

// ---------------------------------------------------------------------------
// fftw-free golden path for the FFT meters: gui/fft.c's exact streaming
// semantics (ring buffer, ceil(rate/fps) hop quantization, window
// generation+2/sum normalization, r2hc boundary-bin handling) transcribed
// here, with the FFT itself computed in double precision (radix-2, same
// e^{-2.pi.i} sign convention as fftwf's r2hc) — the transform is exact
// math, the streaming semantics are what parity must pin down.
static void fft_r2hc(const float* in, int n, double* out) {
  std::vector<std::complex<double>> a(n);
  for (int i = 0; i < n; ++i) a[i] = (double)in[i];
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j |= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (int len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * M_PI / len;
    const std::complex<double> wl(cos(ang), sin(ang));
    for (int i = 0; i < n; i += len) {
      std::complex<double> w(1.0, 0.0);
      for (int k = 0; k < len / 2; ++k) {
        const std::complex<double> u = a[i + k];
        const std::complex<double> v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wl;
      }
    }
  }
  out[0] = a[0].real();
  for (int i = 1; i <= n / 2; ++i) out[i] = a[i].real();
  for (int i = 1; i < n / 2; ++i) out[n - i] = a[i].imag();
}

// Streaming STFT per gui/fft.c:209-340 (fftx_init/_fftx_run/ft_analyze).
struct FFTX {
  int ws, ds, sps;
  int rboff, smps, step;
  double phasediff_step, freq_per_bin, phasediff_bin;
  std::vector<float> ring, fin, win, power, phase, phase_h;
  std::vector<double> out;

  void init(int window_size, double rate, double fps) {
    ws = window_size;
    ds = ws / 2;
    sps = (fps > 0) ? (int)ceil(rate / fps) : 0;  // fft.c:221
    rboff = smps = step = 0;
    freq_per_bin = rate / ds / 2.f;        // fft.c:222
    phasediff_step = M_PI / ds;            // fft.c:223
    phasediff_bin = 0;
    ring.assign(ws, 0.f);
    fin.assign(ws, 0.f);
    power.assign(ds, 0.f);
    phase.assign(ds, 0.f);
    phase_h.assign(ds, 0.f);
    out.assign(ws, 0.0);
    // Hann window, float-cast terms summed in double, scaled 2/sum
    // (ft_hannhamm + ft_gen_window, fft.c:84-98,122-160)
    win.assign(ws, 0.f);
    double sum = 0.0;
    const double c = 2.0 * M_PI / (ws - 1.0);
    for (int i = 0; i < ws; ++i) {
      win[i] = (float)(0.5 - 0.5 * cos(c * i));
      sum += win[i];
    }
    const double isum = 2.0 / sum;
    for (int i = 0; i < ws; ++i) win[i] = (float)(win[i] * isum);
  }

  void analyze() {  // ft_analyze (fft.c:163-180)
    fft_r2hc(fin.data(), ws, out.data());
    std::memcpy(phase_h.data(), phase.data(), sizeof(float) * ds);
    power[0] = (float)(out[0] * out[0]);
    phase[0] = 0;
    for (int i = 1; i < ds - 1; ++i) {
      const double re = out[i], im = out[ws - i];
      power[i] = (float)(re * re + im * im);
      phase[i] = atan2f((float)im, (float)re);
    }
  }

  bool run_block(const float* data, int n) {  // _fftx_run (fft.c:288-340)
    const int n_off = rboff;
    const int n_old = ws - n;
    for (int i = 0; i < n; ++i) {
      ring[(i + n_off) % ws] = data[i];
      fin[n_old + i] = data[i];
    }
    rboff = (rboff + n) % ws;
    smps += n;
    if (smps < sps) return false;
    step = smps;
    smps = 0;
    const int p0s = (n_off + n) % ws;
    if (p0s + n_old >= ws) {
      const int n_p1 = ws - p0s;
      const int n_p2 = n_old - n_p1;
      std::memcpy(fin.data(), &ring[p0s], sizeof(float) * n_p1);
      std::memcpy(&fin[n_p1], &ring[0], sizeof(float) * n_p2);
    } else {
      std::memcpy(&fin[0], &ring[p0s], sizeof(float) * n_old);
    }
    for (int i = 0; i < ws; ++i) fin[i] *= win[i];
    analyze();
    phasediff_bin = phasediff_step * (double)step;
    return true;
  }

  bool run(const float* data, int n) {  // fftx_run (fft.c:344-363)
    if (n <= ws) return run_block(data, n);
    bool rv = false;
    int done = 0;
    while (done < n) {
      int s = std::min(ws, n - done);
      if (run_block(&data[done], s)) rv = true;
      done += s;
    }
    return rv;
  }

  float freq_at_bin(int b) const {  // fftx_freq_at_bin (fft.c:448-461)
    float ph = phase[b] - phase_h[b] - (float)b * (float)phasediff_bin;
    int over = ph / M_PI;
    over += (over >= 0) ? (over & 1) : -(over & 1);
    ph -= M_PI * (float)over;
    ph *= (ds / (float)step) / M_PI;
    return (float)freq_per_bin * ((float)b + ph);
  }
};

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
                 "meters: vu iec1 iec2 kmeter truepeak stcorr ebur128 spectrum msppm\n"
                 "        dr14 tpnrms sigdist bitmeter resample\n",
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
  } else if (meter == "msppm" || meter == "msppm_s20") {
    // msppm_s20: the side gain toggles -6 -> +14 dB at the halfway block,
    // as the BBCM6 wrapper does from its port-7 "S20" control per run()
    // (src/meters.cc:562-563,577-580 via Msppmdsp::set_gain)
    Msppmdsp mM(-6), mS(-6);
    mM.init(fs);
    for (long b = 0; b < nblocks; ++b) {
      if (meter == "msppm_s20" && b == nblocks / 2) mS.set_gain(14.0f);
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
    // radar-history wrapper state, transcribed from src/ebulv2.cc:160-176
    // (init), :75-78 (speed) and :390-421 (per-run() update) — incl. the
    // radarSC carry being gated on lm (not ls), an apparent quirk kept
    // verbatim so EbuR128Meter(reference_radar=True) can golden-diff rings
    const int RP = 360;
    std::vector<float> radarM(RP, -INFINITY), radarS(RP, -INFINITY);
    float radarMC = -INFINITY, radarSC = -INFINITY;
    long radar_spd_cur = 0, radar_pos_cur = 0;
    long radar_spd_max = (long)rint(120.0 * fs / RP);
    if (radar_spd_max < 4096) radar_spd_max = 4096;
    std::vector<float*> ptrs(nchan);
    for (long b = 0; b < nblocks; ++b) {
      for (int c = 0; c < nchan; ++c) ptrs[c] = &ch[c][b * block];
      m.process(block, ptrs.data());
      const float lm = m.loudness_M();
      const float ls = m.loudness_S();
      if (lm > radarMC) radarMC = lm;
      if (lm > radarSC) radarSC = ls;  // quirk: gate on lm (ebulv2.cc:392)
      radar_spd_cur += block;
      if (radar_spd_cur > radar_spd_max) {
        radarM[radar_pos_cur] = radarMC;
        radarS[radar_pos_cur] = radarSC;
        radar_spd_cur = radar_spd_cur % radar_spd_max;
        radar_pos_cur = (radar_pos_cur + 1) % RP;
        radarSC = radarMC = -INFINITY;
      }
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
    std::printf("], \"radarPos\": %ld, \"radarM\": [", radar_pos_cur);
    for (int i = 0; i < RP; ++i)
      std::printf("%s%.9g", i ? "," : "",
                  std::isfinite(radarM[i]) ? radarM[i] : -999.0);
    std::printf("], \"radarS\": [");
    for (int i = 0; i < RP; ++i)
      std::printf("%s%.9g", i ? "," : "",
                  std::isfinite(radarS[i]) ? radarS[i] : -999.0);
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
  } else if (meter == "dr14" || meter == "tpnrms") {
    // DR-14 / TP+RMS measurement, transcribed from the reference LV2
    // wrapper (src/dr14.c) which cannot be linked standalone:
    // coeff_to_db/db_to_coeff :236-244, dr14_calc_rms_score :286-352,
    // the run loop :396-445.  Kmeterdsp/TruePeakdsp are the linked
    // reference classes.
    const bool dr_mode = (meter == "dr14");
    const int HB = 8000;  // DR_HISTBINS (dr14.c:46)
    auto coeff_to_db = [](float c) -> float {
      if (c < .0001f) return -80;
      return 20.f * log10f(c);
    };
    auto db_to_coeff = [](float db) -> float {
      if (db <= -80) return 0;
      return powf(10, 0.05 * db);
    };
    std::vector<Kmeterdsp*> km(nchan);
    std::vector<TruePeakdsp*> tp(nchan);
    std::vector<float> m_rms(nchan, -81), m_peak(nchan, -81), m_dbtp(nchan, 0);
    std::vector<float> rms_sum(nchan, 0), peak_cur(nchan, 0);
    std::vector<float> peak_hist0(nchan, 0), peak_hist1(nchan, 0);
    std::vector<std::vector<uint32_t>> hist(nchan, std::vector<uint32_t>(HB, 0));
    uint64_t num_fragments = 0;
    const uint64_t n_sample_cnt = (uint64_t)rintf(fs * 3.0);  // dr14.c:151
    uint64_t scnt = 0;
    for (int c = 0; c < nchan; ++c) {
      km[c] = new Kmeterdsp(); km[c]->init(fs);
      tp[c] = new TruePeakdsp(); tp[c]->init(fs);
    }
    // dr14_calc_rms_score (dr14.c:286-352)
    auto calc_rms_score = [&]() {
      bool silent = true;
      for (int c = 0; c < nchan; ++c)
        if (rms_sum[c] > 1e-9 * (float)n_sample_cnt) silent = false;
      if (silent) {
        for (int c = 0; c < nchan; ++c) rms_sum[c] = 0;
        return;
      }
      num_fragments++;
      uint32_t m_cut = std::max<uint32_t>(1, (uint32_t)floorf(num_fragments / 5.0));
      for (int c = 0; c < nchan; ++c) {
        float rms = sqrt(2.f * rms_sum[c] / (float)n_sample_cnt);
        rms_sum[c] = 0;
        int bin = (int)rintf(100.f * (80.f + coeff_to_db(rms))) - 1;
        if (bin >= HB) bin = HB - 1;
        if (bin > 0) hist[c][bin]++;
        uint32_t n_cut = 0;
        float rms_score = 0;
        if (num_fragments > 2) {
          for (int32_t b = HB - 1; b > 0 && n_cut < m_cut; --b) {
            const uint32_t bc = hist[c][b];
            if (bc == 0) continue;
            const float cd = db_to_coeff((b - HB + 1) / 100.0);
            rms_score += cd * cd * (float)bc;
            n_cut += bc;
          }
        }
        m_rms[c] = (n_cut > 0) ? coeff_to_db(sqrtf(rms_score / n_cut)) : -81;
        if (peak_cur[c] >= peak_hist0[c]) {
          peak_hist1[c] = peak_hist0[c];
          peak_hist0[c] = peak_cur[c];
        } else if (peak_cur[c] > peak_hist1[c]) {
          peak_hist1[c] = peak_cur[c];
        }
        peak_cur[c] = 0;
        m_peak[c] = (num_fragments > 2) ? coeff_to_db(peak_hist1[c]) : -81;
      }
    };
    for (long b = 0; b < nblocks; ++b) {
      for (int c = 0; c < nchan; ++c) {
        km[c]->process(&ch[c][b * block], block);
        tp[c]->process(&ch[c][b * block], block);
      }
      if (dr_mode) {
        // dr14.c:396-416
        for (int s = 0; s < block; ++s) {
          for (int c = 0; c < nchan; ++c) {
            const float v = ch[c][b * block + s];
            rms_sum[c] += v * v;
            peak_cur[c] = std::max(peak_cur[c], v);
          }
          if (++scnt > n_sample_cnt) {
            calc_rms_score();
            scnt = 0;
          }
        }
      }
      if ((b + 1) % read_every == 0) {
        // port assignment (dr14.c:418-463); km/tp read-reset cadence is the
        // fixture's read cadence (parity contract with the TPU meter)
        float dr_total = 0;
        int dr_valid = 0;
        std::printf("{\"block\": %ld, \"ch\": [", b);
        for (int c = 0; c < nchan; ++c) {
          float rv, rp, pv, pp;
          tp[c]->read(pv, pp);
          km[c]->read(rv, rp);
          m_dbtp[c] = std::max(m_dbtp[c], pp);
          float p_dr = 21, p_m_rms;
          if (dr_mode) {
            const float rdb = m_rms[c];
            const float pdb = m_peak[c];
            const float dr = std::min(0.f, pdb) - rdb;
            if (rdb > -80 && pdb > -80) {
              dr_total += dr;
              dr_valid++;
              p_dr = std::max(1.f, std::min(20.f, dr));
            }
            p_m_rms = rdb;
          } else {
            p_m_rms = coeff_to_db(rp);
          }
          std::printf(
              "%s{\"v_rms\": %.9g, \"v_peak\": %.9g, \"m_peak\": %.9g, "
              "\"m_rms\": %.9g, \"dr\": %.9g}",
              c ? ", " : "", coeff_to_db(rv), coeff_to_db(pv),
              coeff_to_db(m_dbtp[c]), p_m_rms, p_dr);
        }
        float p_dr_total = 21;
        if (dr_mode && dr_valid > 0)
          p_dr_total = std::max(1.f, std::min(20.f, dr_total / (float)dr_valid));
        std::printf("], \"dr_total\": %.9g, \"block_count\": %.9g}\n",
                    p_dr_total, 3.0 * (double)num_fragments);
      }
    }
    if (dr_mode) {
      // final histograms + top-2 peaks for exact structural parity
      std::printf("{\"final\": true, \"num_fragments\": %llu, \"peak_top2\": [",
                  (unsigned long long)num_fragments);
      for (int c = 0; c < nchan; ++c)
        std::printf("%s[%.9g, %.9g]", c ? ", " : "", peak_hist0[c], peak_hist1[c]);
      std::printf("], \"hist\": [");
      for (int c = 0; c < nchan; ++c) {
        std::printf("%s[", c ? ", " : "");
        for (int i = 0; i < HB; ++i) std::printf("%s%u", i ? "," : "", hist[c][i]);
        std::printf("]");
      }
      std::printf("]}\n");
    }
  } else if (meter == "sigdist") {
    // Signal-distribution histogram, transcribed from src/sigdistlv2.c
    // :298-326 (bin/rint, running peak, avg, sequential Welford in double).
    const int DIST_BIN = 361;       // src/uris.h:47
    const float DIST_RANGE = 150.f; // src/uris.h:49
    const float DIST_ZERO = 180.f;  // src/uris.h:50
    std::vector<int32_t> bins(DIST_BIN, 0);
    int32_t peak_cnt = 0, peak_bin = 0;
    double avg = 0, var_m = 0, var_s = 0;
    int64_t integration_time = 0;
    for (long b = 0; b < nblocks; ++b) {
      for (int s = 0; s < block; ++s) {
        const float val = ch[0][b * block + s];
        int bin = (int)rintf(DIST_ZERO + val * DIST_RANGE);
        if (bin < 0) continue;
        if (bin >= DIST_BIN) continue;
        if ((++bins[bin]) > peak_cnt) {
          peak_cnt = bins[bin];
          peak_bin = bin;
        }
        avg += val;
        const double var_m1 = var_m;
        const double cnt_a = integration_time + s + 1;
        var_m = var_m + ((double)val - var_m) / cnt_a;
        var_s = var_s + ((double)val - var_m) * ((double)val - var_m1);
      }
      integration_time += block;
      if ((b + 1) % read_every == 0) {
        std::printf(
            "{\"block\": %ld, \"hist_max\": %d, \"hist_peak_bin\": %d, "
            "\"hist_avg\": %.17g, \"hist_var\": %.17g, \"time\": %lld}\n",
            b, peak_cnt, peak_bin, avg, var_s, (long long)integration_time);
      }
    }
    std::printf("{\"final\": true, \"hist\": [");
    for (int i = 0; i < DIST_BIN; ++i) std::printf("%s%d", i ? "," : "", bins[i]);
    std::printf("], \"hist_max\": %d, \"hist_peak_bin\": %d, \"hist_avg\": %.17g, "
                "\"hist_var\": %.17g, \"time\": %lld}\n",
                peak_cnt, peak_bin, avg, var_s, (long long)integration_time);
  } else if (meter == "bitmeter") {
    // IEEE-754 field statistics, transcribed from src/bitmeter.c
    // float_stats :63-105 with the histS layout of src/uris.h:52-60
    // (regions: hit [0,280), one [280,560), dset [560,583)).
    const int BIM_DHIT = 0, BIM_NHIT = 23, BIM_DONE = 280, BIM_NONE = 303,
              BIM_DSET = 560, HIST_LEN = 584;
    std::vector<int32_t> histS(HIST_LEN, 0);
    int32_t bim_zero = 0, bim_pos = 0, bim_nan = 0, bim_inf = 0, bim_den = 0;
    double bim_min = INFINITY, bim_max = 0;
    int64_t integration_time = 0;
    for (long b = 0; b < nblocks; ++b) {
      for (int s = 0; s < block; ++s) {
        const float* sample = &ch[0][b * block + s];
        unsigned int value;
        std::memcpy(&value, sample, 4);
        unsigned int exp = (value & 0x7f800000) >> 23;
        int sign = (value & 0x80000000) ? -1 : 1;
        value &= 0x7fffff;
        if (exp == 255) {
          if (value == 0) ++bim_inf; else ++bim_nan;
          continue;
        } else if (exp == 0 && value == 0) {
          ++bim_zero;
          continue;
        } else if (exp == 0) {
          ++bim_den;
        }
        if (sign > 0) ++bim_pos;
        if (exp > 0) {
          const float v = fabsf(*sample);
          if (v > bim_max) bim_max = v;
          if (v < bim_min) bim_min = v;
          ++histS[BIM_NHIT + exp];
          ++histS[BIM_NONE + exp];
        } else {
          exp = 1; /* E-126 not E-127 for denormals */
        }
        for (int k = 0; k < 23; ++k) {
          const int bit = 1 << k;
          ++histS[BIM_DHIT + exp + k];
          if (value & bit) {
            ++histS[BIM_DONE + exp + k];
            ++histS[BIM_DSET + k];
          }
        }
      }
      integration_time += block;
    }
    std::printf("{\"final\": true, \"zero\": %d, \"pos\": %d, \"nan\": %d, "
                "\"inf\": %d, \"den\": %d, \"min\": %.9g, \"max\": %.9g, "
                "\"time\": %lld, \"histS\": [",
                bim_zero, bim_pos, bim_nan, bim_inf, bim_den, bim_min, bim_max,
                (long long)integration_time);
    for (int i = 0; i < HIST_LEN; ++i) std::printf("%s%d", i ? "," : "", histS[i]);
    std::printf("]}\n");
  } else if (meter == "surround") {
    // src/surmeter.c:50-160: N Kmeterdsp + (nchan>3 ? 4 : 3) Stcorrdsp
    // with default adjacent routing i -> (i, (i+1) % nchan); correlators
    // init(rate, 2e3, 0.3) (:64-65).
    const int cors = nchan > 3 ? 4 : 3;
    std::vector<Kmeterdsp*> km(nchan);
    std::vector<Stcorrdsp*> cor(cors);
    for (int c = 0; c < nchan; ++c) { km[c] = new Kmeterdsp(); km[c]->init(fs); }
    for (int c = 0; c < cors; ++c) { cor[c] = new Stcorrdsp(); cor[c]->init(fs, 2e3f, 0.3f); }
    for (long b = 0; b < nblocks; ++b) {
      for (int c = 0; c < cors; ++c) {
        int a = c % nchan, d = (c + 1) % nchan;
        cor[c]->process(&ch[a][b * block], &ch[d][b * block], block);
      }
      for (int c = 0; c < nchan; ++c) km[c]->process(&ch[c][b * block], block);
      if ((b + 1) % read_every == 0) {
        std::printf("{\"block\": %ld, \"rms\": [", b);
        std::vector<float> peaks(nchan);
        for (int c = 0; c < nchan; ++c) {
          float r, p;
          km[c]->read(r, p);
          peaks[c] = p;
          std::printf("%s%.9g", c ? ", " : "", r);
        }
        std::printf("], \"peak\": [");
        for (int c = 0; c < nchan; ++c)
          std::printf("%s%.9g", c ? ", " : "", peaks[c]);
        std::printf("], \"cor\": [");
        for (int c = 0; c < cors; ++c)
          std::printf("%s%.9g", c ? ", " : "", cor[c]->read());
        std::printf("]}\n");
      }
    }
  } else if (meter == "rresample") {
    // generic-ratio zita Resampler (resampler.cc:67-120): fs = fs_in,
    // block = fs_out, read_every = hlen (4-arg setup -> frel = 1-2.6/hl).
    // A 2h-1 zero prefeed aligns the stream with the TPU resampler's
    // zeros-history streaming start.
    const int fs_out = block;
    const int hlen = read_every;
    Resampler src;
    if (src.setup((unsigned)fs, (unsigned)fs_out, nchan, hlen)) {
      std::fprintf(stderr, "rresample setup failed\n");
      return 3;
    }
    const double r = (double)fs_out / fs;
    const int h2 = (r < 1.0) ? (int)ceil(hlen / r) : hlen;
    const long pre = 2 * h2 - 1;
    std::vector<float> in((pre + nfr) * nchan, 0.f);
    std::memcpy(&in[pre * nchan], inter.data(), nfr * nchan * sizeof(float));
    const long out_cap = (long)((double)(pre + nfr) * r) + 8;
    std::vector<float> out(out_cap * nchan, 0.f);
    src.inp_count = pre + nfr;
    src.inp_data = in.data();
    src.out_count = out_cap;
    src.out_data = out.data();
    src.process();
    const long produced = out_cap - src.out_count;
    std::printf("{\"fs_in\": %g, \"fs_out\": %d, \"hlen\": %d, \"pre\": %ld, "
                "\"produced\": %ld, \"data\": [",
                fs, fs_out, hlen, pre, produced);
    for (long i = 0; i < produced * nchan; ++i)
      std::printf("%s%.9g", i ? "," : "", out[i]);
    std::printf("]}\n");
  } else if (meter == "stft") {
    // raw streaming-STFT parity: per analysis dump power/phase/freq_at_bin
    // of channel 0.  argv[7] = window_size (default 512), argv[8] = fps.
    const int ws = (argc > 7) ? std::atoi(argv[7]) : 512;
    const double fps = (argc > 8) ? std::atof(argv[8]) : 25.0;
    FFTX fa;
    fa.init(ws, fs, fps);
    long frame = 0;
    for (long b = 0; b < nblocks; ++b) {
      if (fa.run(&ch[0][b * block], block)) {
        ++frame;
        if (frame % read_every == 0) {
          std::printf("{\"block\": %ld, \"frame\": %ld, \"step\": %d, \"power\": [", b,
                      frame, fa.step);
          for (int i = 0; i < fa.ds; ++i)
            std::printf("%s%.9g", i ? "," : "", fa.power[i]);
          std::printf("], \"phase\": [");
          for (int i = 0; i < fa.ds; ++i)
            std::printf("%s%.9g", i ? "," : "", fa.phase[i]);
          std::printf("], \"freq\": [");
          for (int i = 0; i < fa.ds; ++i)
            std::printf("%s%.9g", i ? "," : "", fa.freq_at_bin(i));
          std::printf("]}\n");
        }
      }
    }
  } else if (meter == "phasewheel" || meter == "stereoscope") {
    // gui/phasewheel.c:1307-1342 / gui/stereoscope.c:705-741 process_audio
    // loops over two synchronized STFTs.  argv[7] = fft_bins (default 512).
    const int bins = (argc > 7) ? std::atoi(argv[7]) : 512;
    FFTX fa, fb;
    fa.init(bins * 2, fs, 25.0);
    fb.init(bins * 2, fs, 25.0);
    const bool wheel = (meter == "phasewheel");
    const float db_thresh = wheel ? 0.000001f : 1e-20f;  // phasewheel.c:1212
    std::vector<float> phase(bins, 0.f), level(bins, 0.f), lr(bins, 0.5f);
    if (!wheel) level.assign(bins, 0.f);
    float peak_s = 0;
    long frame = 0;
    for (long b = 0; b < nblocks; ++b) {
      fa.run(&ch[0][b * block], block);
      bool display = fb.run(&ch[1][b * block], block);
      if (!display) continue;
      ++frame;
      if (wheel) {
        float peak = 0;
        for (int i = 1; i < bins - 1; ++i) {
          if (fa.power[i] < db_thresh || fb.power[i] < db_thresh) {
            phase[i] = 0;
            level[i] = -100;
            continue;
          }
          phase[i] = fb.phase[i] - fa.phase[i];
          level[i] = std::max(fa.power[i], fb.power[i]);
          if (level[i] > peak) peak = level[i];
        }
        peak_s += .04f * (peak - peak_s) + 1e-15f;
        if (std::isnan(peak_s)) peak_s = 0;
        if (peak_s > 1000) peak_s = 1000;
      } else {
        for (int i = 1; i < bins - 1; ++i) {
          if (fa.power[i] < db_thresh && fb.power[i] < db_thresh) {
            lr[i] = 0.5;
            level[i] = 0;
            continue;
          }
          const float lv = std::max(fa.power[i], fb.power[i]);
          const float p =
              .5f + .5f * (sqrtf(fb.power[i]) - sqrtf(fa.power[i])) / sqrtf(lv);
          level[i] += .1f * (lv - level[i]) + 1e-20f;
          lr[i] += .1f * (p - lr[i]) + 1e-10f;
        }
      }
      if (frame % read_every == 0) {
        if (wheel) {
          std::printf("{\"block\": %ld, \"frame\": %ld, \"peak\": %.9g, \"phase\": [",
                      b, frame, peak_s);
          for (int i = 1; i < bins - 1; ++i)
            std::printf("%s%.9g", i > 1 ? "," : "", phase[i]);
          std::printf("], \"level\": [");
          for (int i = 1; i < bins - 1; ++i)
            std::printf("%s%.9g", i > 1 ? "," : "", level[i]);
          std::printf("]}\n");
        } else {
          std::printf("{\"block\": %ld, \"frame\": %ld, \"lr\": [", b, frame);
          for (int i = 1; i < bins - 1; ++i)
            std::printf("%s%.9g", i > 1 ? "," : "", lr[i]);
          std::printf("], \"level\": [");
          for (int i = 1; i < bins - 1; ++i)
            std::printf("%s%.9g", i > 1 ? "," : "", level[i]);
          std::printf("]}\n");
        }
      }
    }
  } else if (meter == "goniometer") {
    // gui/goniometer.c draw_rb DSP (:299-537): optional zita oversampling
    // (setup_src :155-189, hlen=12, 8192-zero prefeed), 20 Hz one-pole,
    // (L-R, L+R) rotation, RMS/min-max autogain with asymmetric
    // attack/decay.  argv[7] = oversample factor (default 4,
    // src/goniometerlv2.c:95).  Cairo path-skipping (linelensquare<2) is
    // display-only and excluded.  Dial defaults: attack 54, decay 58,
    // rms 50, target 40 (ui_state mapping, goniometer.c:895-912).
    const int os = (argc > 7) ? std::atoi(argv[7]) : 4;
    const float attack_pow = std::max(0.01, 0.1 * exp(0.06 * 54.0) - 0.09);
    const float decay_pow = std::max(0.01, 0.1 * exp(0.06 * 58.0) - 0.09);
    const float g_rms = 0.01f * 50.0f;
    const float g_target = std::max(0.15, exp(1.8 * (-0.02 * 40.0 + 1.0)));
    Resampler* src = nullptr;
    std::vector<float> resampl;
    float hpw;
    if (os > 1) {
      hpw = expf(-2.0 * M_PI * 20 / (fs * os));
      src = new Resampler();
      if (src->setup((unsigned)fs, (unsigned)(fs * os), 2, 12, 1.0)) {
        std::fprintf(stderr, "resampler setup failed\n");
        return 3;
      }
      std::vector<float> zeros(8192 * 2, 0.f);
      resampl.resize((size_t)block * os * 2 + 8192 * os * 2);
      src->inp_count = 8192;
      src->inp_data = zeros.data();
      src->out_count = 8192 * os;
      src->out_data = resampl.data();
      src->process();
    } else {
      hpw = expf(-2.0 * M_PI * 20 / fs);
    }
    float lp0 = 0, lp1 = 0, gain = 1.0;
    for (long b = 0; b < nblocks; ++b) {
      const long n_samples = block;
      long n_points = n_samples;
      const float* pts;
      if (os > 1) {
        src->inp_count = n_samples;
        src->inp_data = &inter[b * block * 2];
        src->out_count = n_samples * os;
        src->out_data = resampl.data();
        src->process();
        n_points = n_samples * os;
        pts = resampl.data();
      } else {
        pts = &inter[b * block * 2];
      }
      double sx2 = 0, sy2 = 0;
      float axmax = 0;
      float rms_0 = 0, rms_1 = 0;
      long rms_c = 0;
      float ag_xmax = 0, ag_xmin = 0, ag_ymax = 0, ag_ymin = 0;
      for (long i = 0; i < n_points; ++i) {
        const float d0 = pts[2 * i];
        const float d1 = pts[2 * i + 1];
        lp0 += hpw * (d0 - lp0);
        lp1 += hpw * (d1 - lp1);
        lp0 += 1e-12f;
        lp1 += 1e-12f;
        const float ax = (lp0 - lp1);
        const float ay = (lp0 + lp1);
        if (ax > ag_xmax) ag_xmax = ax;
        if (ax < ag_xmin) ag_xmin = ax;
        if (ay > ag_ymax) ag_ymax = ay;
        if (ay < ag_ymin) ag_ymin = ay;
        rms_0 += lp0 * lp0;
        rms_1 += lp1 * lp1;
        rms_c++;
        sx2 += (double)ax * ax;
        sy2 += (double)ay * ay;
        axmax = std::max(axmax, fabsf(ax));
      }
      if (!std::isfinite(lp0)) lp0 = 0;
      if (!std::isfinite(lp1)) lp1 = 0;
      // autogain update (goniometer.c:497-537)
      {
        float elapsed = n_samples / fs;
        const float xdif = (ag_xmax - ag_xmin);
        const float ydif = (ag_ymax - ag_ymin);
        float max = sqrt(xdif * xdif + ydif * ydif);
        max *= .707;
        if (rms_c > 0 && g_rms > 0 && std::isfinite(g_rms)) {
          const float rms =
              5.436 * (rms_0 > rms_1 ? sqrtf(rms_0 / rms_c) : sqrtf(rms_1 / rms_c));
          max = max * (1.0 - g_rms) + rms * g_rms;
        }
        max *= g_target;
        if (!std::isfinite(max)) max = 0;
        float g;
        if (max < .01) g = 100.0;
        else if (max > 100.0) g = .02;
        else g = 2.0 / max;
        const float attack = g < gain
                                 ? attack_pow * (.31 + .1 * log10f(elapsed))
                                 : decay_pow * (.03 + .007 * logf(elapsed));
        g = gain + attack * (g - gain);
        if (g < .001) g = .001;
        gain = g;
      }
      if ((b + 1) % read_every == 0) {
        std::printf(
            "{\"block\": %ld, \"gain\": %.9g, \"lp0\": %.9g, \"lp1\": %.9g, "
            "\"sx2\": %.17g, \"sy2\": %.17g, \"axmax\": %.9g}\n",
            b, gain, lp0, lp1, sx2, sy2, axmax);
      }
    }
  } else {
    std::fprintf(stderr, "unknown meter %s\n", meter.c_str());
    return 2;
  }
  return 0;
}
