// Streaming scalar CPU metering engine.
//
// Independent implementation of the meter recurrences (documented in the
// project SURVEY; constants from IEC 60268-10/17, ITU-R BS.1770 / EBU
// R128 and the K-system), used as the host-side reference/fallback of the
// TPU framework.  Deliberately written sample-functional (per-channel
// lambdas over a state struct) rather than the loop-unrolled style of any
// particular upstream implementation.

#include "meters_native.h"

#include <cmath>
#include <complex>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int kHl = 24;  // true-peak polyphase half-length

// Generic polyphase interpolation taps: phase ph tap i applies to
// x[t - 2*hl + 1 + i]; windowed sinc h(t) = sinc(t) * (0.384 +
// 0.5 cos(pi t/hl) + 0.116 cos(2 pi t/hl)).
static std::vector<float> make_poly_taps(int factor, int hl) {
  std::vector<float> taps((size_t)factor * 2 * hl);
  for (int ph = 0; ph < factor; ++ph) {
    for (int i = 0; i < 2 * hl; ++i) {
      double t = (hl - 1 - i) + (double)ph / factor;
      double a = std::fabs(t);
      double sinc = a < 1e-9 ? 1.0 : std::sin(M_PI * a) / (M_PI * a);
      double w = 0.0;
      double u = std::fabs(t / hl);
      if (u < 1.0)
        w = 0.384 + 0.5 * std::cos(M_PI * u) + 0.116 * std::cos(2 * M_PI * u);
      taps[(size_t)ph * 2 * hl + i] = (float)(sinc * w);
    }
  }
  return taps;
}

struct PolyTaps {
  float taps[4][2 * kHl];
  PolyTaps() {
    std::vector<float> t = make_poly_taps(4, kHl);
    for (int ph = 0; ph < 4; ++ph)
      std::memcpy(taps[ph], t.data() + (size_t)ph * 2 * kHl,
                  2 * kHl * sizeof(float));
  }
};
const PolyTaps& poly_taps() {
  static PolyTaps t;
  return t;
}

struct BallState {
  float z1 = 0, z2 = 0, m = 0;
  bool res = true;
};

struct ChanState {
  BallState bal;
  // vu
  float vz1 = 0, vz2 = 0;
  // kmeter
  float kz1 = 0, kz2 = 0, krms = 0, kpeak = 0;
  int kcnt = 0;
  bool kflag = false;
  // truepeak
  std::vector<float> hist;  // 2*hl-1 input history
  float tp_m = 0, tp_p = 0;
  bool tp_res = true;
  // r128 K-weighting state
  double w1 = 0, w2 = 0, w3 = 0, w4 = 0;
};

struct R128Shared {
  std::vector<double> power;  // fragment powers (unbounded history window 60)
  double frpwr = 1e-30;
  int frcnt = 0;
  int fragm = 0;
  long nfrag = 0;
  double loud_m = -200, loud_s = -200, max_m = -200, max_s = -200;
  std::vector<long> hist_m, hist_s;
  long count_m = 0, count_s = 0;
  int div1 = 0, div2 = 0;
  double dbtp = 0;
};

struct CorState {
  float zl = 0, zr = 0, zlr = 0, zll = 0, zrr = 0;
};

struct SigDistState {
  long hist[361] = {0};
  long peak_bin = -1, peak_cnt = 0;
  double sum = 0, mean = 0, m2 = 0;
  long n = 0;     // accepted (in-range) samples
  long time = 0;  // ALL samples seen — the reference's Welford count
                  // (sigdistlv2.c:317) advances for skipped samples too
};

struct BitState {
  double nan = 0, inf = 0, den = 0, zero = 0, pos = 0;
  float vmin = INFINITY, vmax = 0;
};

// 30-band IEC 61260 1/3-octave bank: 6 biquad stages per band, coefficients
// from a double-precision bilinear band-pass design (same formulas as the
// python host design in ops/design.py).
struct SpectrumBand {
  double a1[6], a2[6], b0[6], b1[6], b2[6];
  double z1[6] = {0}, z2[6] = {0};
  float val = 0, peak = 0;
};

struct SpectrumState {
  SpectrumBand band[30];
  float omega = 0;
};

// Close transcription of the reference's band-filter design math
// (x42 spectr.c:89-206 bandpass_setup: same intermediates c_a/c_b/ab_2/
// u0/u1 and op order) — bit-faithful coefficient agreement IS the parity
// requirement here, so the design math must be the same math; the
// process loops below remain independently structured.
static void design_band(SpectrumBand* bd, double rate, double freq,
                        double band) {
  const int order = 6;
  double wc = 2.0 * M_PI * freq / rate;
  double ww = 2.0 * M_PI * band / rate;
  double wl = wc - ww / 2.0, wu = wc + ww / 2.0;
  if (wu > M_PI - 1e-9) wu = M_PI - 1e-9;
  if (wl < 1e-9) wl = 1e-9;
  wu *= 0.5;
  wl *= 0.5;
  const double c_a = std::cos(wu + wl) / std::cos(wu - wl);
  const double c_b = 1.0 / std::tan(wu - wl);
  const double w = 2.0 * std::atan(std::sqrt(std::tan(wu) * std::tan(wl)));
  const double c_a2 = c_a * c_a, c_b2 = c_b * c_b, ab_2 = 2.0 * c_a * c_b;
  typedef std::complex<double> cplx;
  for (int i = 0; i < order / 2; ++i) {
    double omega = M_PI / 2.0 + (2 * i + 1) * M_PI / (2.0 * order);
    cplx p(std::cos(omega), std::sin(omega));
    cplx c = (1.0 + p) / (1.0 - p);
    cplx dd = 2.0 * (c_b - 1.0) * c + 2.0 * (1.0 + c_b);
    cplx v = (4.0 * (c_b2 * (c_a2 - 1.0) + 1.0)) * c;
    v += 8.0 * (c_b2 * (c_a2 - 1.0) - 1.0);
    v *= c;
    v += 4.0 * (c_b2 * (c_a2 - 1.0) + 1.0);
    v = std::sqrt(v);
    cplx u0 = cplx(ab_2 - v.real() + ab_2 * c.real(),
                   -v.imag() + ab_2 * c.imag());
    cplx u1 = cplx(ab_2 + v.real() + ab_2 * c.real(),
                   v.imag() + ab_2 * c.imag());
    cplx pcs[2] = {u0 / dd, u1 / dd};
    for (int k = 0; k < 2; ++k) {
      int s = 2 * i + k;
      bd->a1[s] = -2.0 * pcs[k].real();
      bd->a2[s] = pcs[k].real() * pcs[k].real() + pcs[k].imag() * pcs[k].imag();
      bd->b0[s] = 1.0;
      bd->b1[s] = k ? -2.0 : 2.0;
      bd->b2[s] = 1.0;
    }
  }
  const double cw = std::cos(-w), sw = std::sin(-w);
  const double cw2 = std::cos(-2.0 * w), sw2 = std::sin(-2.0 * w);
  cplx ch(1, 0), cb(1, 0);
  for (int s = 0; s < order; ++s) {
    ch *= cplx((1 + bd->b1[s] * cw) + cw2, bd->b1[s] * sw + sw2);
    cb *= cplx((1 + bd->a1[s] * cw) + bd->a2[s] * cw2,
               bd->a1[s] * sw + bd->a2[s] * sw2);
  }
  double scale = (cb / ch).real();
  bd->b0[0] *= scale;
  bd->b1[0] *= scale;
  bd->b2[0] *= scale;
}

// ---- DR-14 (src/dr14.c:396-445 semantics; see models/dr14.py) -------------

struct Dr14Chan {
  double rms_sum = 0;        // open 3 s window sum of squares
  float peak_cur = 0;        // open window signed-sample peak (floor 0)
  double top2[2] = {0, 0};   // two highest counted-window peaks
  std::vector<uint32_t> hist;  // 8000-bin 0.01 dB histogram
  double m_dbtp = 0;         // accumulated max dBTP
};

struct Dr14State {
  long win = 0;   // n_sample_cnt = 3*fs (window spans win+1 samples)
  long scnt = 0;
  long num_windows = 0;
  std::vector<Dr14Chan> ch;
};

// ---- goniometer (gui/goniometer.c:299-538; models/goniometer.py) ----------

struct GonioState {
  int os = 4;
  static const int hl = 12;
  std::vector<float> taps;     // os phases x 2*hl
  std::vector<float> hist[2];  // 2*hl-1 input history per channel
  double lp[2] = {0, 0};
  double gain = 1.0;
  double hpw = 0, attack_pow = 0, decay_pow = 0, g_rms = 0, g_target = 0;
  // read-and-reset trace extrema + last point
  double xmin = 0, xmax = 0, ymin = 0, ymax = 0, lastx = 0, lasty = 0;
  bool have = false;
};

// ---- STFT display analyzers (gui/fft.c + phasewheel.c/stereoscope.c) ------

// in-place complex radix-2 FFT, double precision
static void fft_cplx(std::vector<double>& re, std::vector<double>& im) {
  const size_t n = re.size();
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * M_PI / (double)len;
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      double cr = 1, ci = 0;
      for (size_t k = 0; k < len / 2; ++k) {
        double ur = re[i + k], ui = im[i + k];
        double br = re[i + k + len / 2], bi = im[i + k + len / 2];
        double vr = br * cr - bi * ci;
        double vi = br * ci + bi * cr;
        re[i + k] = ur + vr;
        im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr;
        im[i + k + len / 2] = ui - vi;
        double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

struct StftState {
  static const int W = 8192, D = 4096;
  int hop = 0;
  long cnt = 0;  // absolute samples consumed
  std::vector<float> ring[2];
  long pos = 0;  // next write index
  std::vector<double> win;  // hann, sum = 2
  bool scope = false;       // stereoscope vs phasewheel
  // phasewheel: last frame dphi/level + smoothed display peak
  std::vector<double> dphi, level;
  double peak = 0;
  // stereoscope: smoothed per-bin lr position / level
  std::vector<double> lr, slevel;

  void init(float fs, bool is_scope) {
    scope = is_scope;
    hop = (int)std::ceil(fs / 25.0);
    ring[0].assign(W, 0.f);
    ring[1].assign(W, 0.f);
    win.resize(W);
    double s = 0;
    for (int i = 0; i < W; ++i) {
      win[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / (W - 1.0));
      s += win[i];
    }
    for (int i = 0; i < W; ++i) win[i] *= 2.0 / s;
    if (scope) {
      lr.assign(D, 0.5);
      slevel.assign(D, 0.0);
    } else {
      dphi.assign(D, 0.0);
      level.assign(D, -100.0);
    }
  }

  void analyze() {
    std::vector<double> pw[2], ph[2];
    for (int c = 0; c < 2; ++c) {
      std::vector<double> re(W), im(W, 0.0);
      for (int i = 0; i < W; ++i)
        re[i] = (double)ring[c][(pos + i) % W] * win[i];
      fft_cplx(re, im);
      pw[c].resize(D);
      ph[c].resize(D);
      for (int b = 0; b < D; ++b) {
        pw[c][b] = re[b] * re[b] + im[b] * im[b];
        ph[c][b] = std::atan2(im[b], re[b]);
      }
      pw[c][D - 1] = 0.0;
      ph[c][0] = 0.0;
      ph[c][D - 1] = 0.0;
    }
    if (!scope) {
      const double thr = 1e-6;  // 10^(-60/10)
      double fpk = 0;
      for (int b = 0; b < D; ++b) {
        bool ok = pw[0][b] >= thr && pw[1][b] >= thr;
        double lv = std::fmax(pw[0][b], pw[1][b]);
        dphi[b] = ok ? ph[1][b] - ph[0][b] : 0.0;
        level[b] = ok ? lv : -100.0;
        if (ok && lv > fpk) fpk = lv;
      }
      peak += 0.04 * (fpk - peak) + 1e-15;
      if (std::isnan(peak)) peak = 0;
      if (peak > 1000.0) peak = 1000.0;
    } else {
      const double thr = 1e-20;
      for (int b = 0; b < D; ++b) {
        double pl = pw[0][b], pr = pw[1][b];
        bool ok = pl >= thr || pr >= thr;
        double lv = std::fmax(pl, pr);
        double pos_b = ok ? 0.5 + 0.5 * (std::sqrt(pr) - std::sqrt(pl)) /
                                std::sqrt(std::fmax(lv, 1e-30))
                          : 0.5;
        if (ok) {
          slevel[b] += 0.1 * (lv - slevel[b]) + 1e-20;
          lr[b] += 0.1 * (pos_b - lr[b]) + 1e-10;
        } else {
          slevel[b] = 0.0;
          lr[b] = 0.5;
        }
      }
    }
  }

  void process(const float* L, const float* R, int64_t n) {
    for (int64_t t = 0; t < n; ++t) {
      ring[0][pos % W] = L[t];
      ring[1][pos % W] = R[t];
      pos = (pos + 1) % W;
      if (++cnt % hop == 0) analyze();
    }
  }
};

// ---- surround (src/surmeter.c; models/surround.py) ------------------------

struct SurState {
  int npairs = 4;
  int pa[4] = {0}, pb[4] = {0};
  std::vector<double> zl;  // per-channel correlator lowpass
  double zp[4][3] = {};
  float w1 = 0, w2 = 0;
};

}  // namespace

struct mt_engine {
  int kind;
  float fs;
  int nchan;
  // coefficients
  float w1 = 0, w2 = 0, w3 = 0, gain = 0, omega = 0;
  int hold = 0;
  // k-weighting (double-precision design)
  double ka0, ka1, ka2, kb1, kb2, kc3, kc4;
  std::vector<ChanState> ch;
  R128Shared r128;
  CorState cor;
  SpectrumState spec;
  SigDistState sig;
  BitState bit;
  BallState ms[2];  // mid/side ballistics
  Dr14State dr;
  GonioState gon;
  StftState stft;
  SurState sur;
};

static void design_kweight(mt_engine* e) {
  const double fs = e->fs;
  double r = 1.0 / std::tan(4712.3890 / fs);
  double wl = r / 1.12201, wu = r * 1.12201;
  double u = 1.4085 + 210.0 / fs;
  double a = u * wl, b = wl * wl, c = u * wu, d = wu * wu;
  double den = 1 + a + b;
  e->ka0 = (1 + c + d) / den;
  e->ka1 = (2 - 2 * d) / den;
  e->ka2 = (1 - c + d) / den;
  e->kb1 = (2 - 2 * b) / den;
  e->kb2 = (1 - a + b) / den;
  r = 48.0 / fs;
  a = 4.9886075 * r;
  b = 6.2298014 * r * r;
  den = 1 + a + b;
  a *= 2 / den;
  b *= 4 / den;
  e->kc3 = a + b;
  e->kc4 = b;
  double s = 1.004995 / den;
  e->ka0 *= s;
  e->ka1 *= s;
  e->ka2 *= s;
}

extern "C" mt_engine* mt_engine_create(int kind, float fs, int nchan) {
  if (nchan < 1) return nullptr;
  mt_engine* e = new mt_engine();
  e->kind = kind;
  e->fs = fs;
  e->nchan = nchan;
  e->ch.resize(nchan);
  switch (kind) {
    case MT_VU:
      e->w1 = 11.1f / fs;
      e->gain = 1.5f * 1.571f;
      break;
    case MT_IEC1:
      e->w1 = 450.f / fs; e->w2 = 1300.f / fs; e->w3 = 1.f - 5.4f / fs;
      e->gain = 0.5108f;
      break;
    case MT_IEC2:
      e->w1 = 200.f / fs; e->w2 = 860.f / fs; e->w3 = 1.f - 4.f / fs;
      e->gain = 0.5141f;
      break;
    case MT_KMETER:
      e->omega = 9.72f / fs;
      e->hold = (int)(0.5f * fs + 0.5f);
      break;
    case MT_TRUEPEAK:
      e->w1 = 4000.f / fs / 4; e->w2 = 17200.f / fs / 4;
      e->w3 = 1.f - 7.f / fs / 4; e->gain = 0.502f;
      for (auto& c : e->ch) c.hist.assign(2 * kHl - 1, 0.f);
      break;
    case MT_STCORR:
      e->w1 = 6.28f * 2000.f / fs;
      e->w2 = 1.f / (0.3f * fs);
      break;
    case MT_MSPPM:
      e->w1 = 200.f / fs; e->w2 = 860.f / fs; e->w3 = 1.f - 4.f / fs;
      e->gain = 0.5141f;
      break;
    case MT_SIGDIST:
    case MT_BITMETER:
      break;
    case MT_SPECTRUM: {
      e->spec.omega = 1.0f - std::exp(-2.0 * M_PI * 1.0 / fs);
      const double f1f = std::pow(2.0, -1.0 / 6.0);
      const double f2f = std::pow(2.0, 1.0 / 6.0);
      for (int i = 0; i < 30; ++i) {
        const double f_m = std::pow(2.0, (i - 16) / 3.0) * 1000.0;
        design_band(&e->spec.band[i], fs, f_m, f_m * f2f - f_m * f1f);
      }
      break;
    }
    case MT_R128:
      // channel gain table covers mono..5.0 (ebu_r128_proc.cc _chan_gain);
      // more channels would read past it
      if (nchan > 5) { delete e; return nullptr; }
      design_kweight(e);
      e->r128.fragm = (int)fs / 20;
      e->r128.frcnt = e->r128.fragm;
      e->r128.hist_m.assign(751, 0);
      e->r128.hist_s.assign(751, 0);
      for (auto& c : e->ch) c.hist.assign(2 * kHl - 1, 0.f);
      break;
    case MT_DR14:
    case MT_TPNRMS:
      // embedded display meters share the per-channel k-meter/true-peak
      // state fields
      e->omega = 9.72f / fs;
      e->hold = (int)(0.5f * fs + 0.5f);
      e->w1 = 4000.f / fs / 4; e->w2 = 17200.f / fs / 4;
      e->w3 = 1.f - 7.f / fs / 4; e->gain = 0.502f;
      for (auto& c : e->ch) c.hist.assign(2 * kHl - 1, 0.f);
      e->dr.win = (long)std::lround(fs * 3.0);
      e->dr.ch.resize(nchan);
      if (kind == MT_DR14)
        for (auto& c : e->dr.ch) c.hist.assign(8000, 0);
      break;
    case MT_GONIO: {
      // nchan argument carries the oversample factor; engine is stereo
      int os = nchan;
      if (os != 1 && os != 2 && os != 4 && os != 8) { delete e; return nullptr; }
      e->nchan = 2;
      e->ch.resize(2);
      GonioState& g = e->gon;
      g.os = os;
      if (os > 1) g.taps = make_poly_taps(os, GonioState::hl);
      for (int c = 0; c < 2; ++c)
        g.hist[c].assign(2 * GonioState::hl - 1, 0.f);
      g.hpw = std::exp(-2.0 * M_PI * 20.0 / ((double)fs * os));
      // default dials: attack 54, decay 58, rms 50, target 40
      g.attack_pow = std::fmax(0.01, 0.1 * std::exp(0.06 * 54.0) - 0.09);
      g.decay_pow = std::fmax(0.01, 0.1 * std::exp(0.06 * 58.0) - 0.09);
      g.g_rms = 0.01 * 50.0;
      g.g_target = std::fmax(0.15, std::exp(1.8 * (-0.02 * 40.0 + 1.0)));
      break;
    }
    case MT_PHASEWHEEL:
    case MT_STEREOSCOPE:
      if (nchan != 2) { delete e; return nullptr; }
      e->stft.init(fs, kind == MT_STEREOSCOPE);
      break;
    case MT_SURROUND: {
      if (nchan < 3 || nchan > 8) { delete e; return nullptr; }
      e->omega = 9.72f / fs;
      e->hold = (int)(0.5f * fs + 0.5f);
      SurState& s = e->sur;
      s.npairs = nchan > 3 ? 4 : 3;
      for (int p = 0; p < s.npairs; ++p) {
        s.pa[p] = p % nchan;
        s.pb[p] = (p + 1) % nchan;
      }
      s.zl.assign(nchan, 0.0);
      s.w1 = 6.28f * 2000.f / fs;
      s.w2 = 1.f / (0.3f * fs);
      break;
    }
    default:
      delete e;
      return nullptr;
  }
  return e;
}

extern "C" void mt_engine_destroy(mt_engine* e) { delete e; }

// ---- per-kind block processors -------------------------------------------

static void proc_vu(mt_engine* e, const float* x, int64_t n) {
  float w = e->w1;
  for (int c = 0; c < e->nchan; ++c) {
    ChanState& s = e->ch[c];
    const float* p = x + (int64_t)c * n;
    float z1 = std::fmin(std::fmax(s.vz1, -20.f), 20.f);
    float z2 = std::fmin(std::fmax(s.vz2, -20.f), 20.f);
    float m = s.bal.res ? 0.f : s.bal.m;
    s.bal.res = false;
    for (int64_t i = 0; i + 3 < n; i += 4) {
      float t2 = z2 / 2;
      for (int j = 0; j < 4; ++j) z1 += w * (std::fabs(p[i + j]) - t2 - z1);
      z2 += 4 * w * (z1 - z2);
      if (z2 > m) m = z2;
    }
    if (!std::isfinite(z1)) { z1 = 0; m = INFINITY; }
    if (!std::isfinite(z2)) { z2 = 0; m = INFINITY; } else z2 += 1e-10f;
    s.vz1 = z1;
    s.vz2 = z2;
    s.bal.m = m;
  }
}

static void ppm_block(mt_engine* e, ChanState& s, const float* p, int64_t n) {
  float z1 = std::fmin(std::fmax(s.bal.z1, 0.f), 20.f);
  float z2 = std::fmin(std::fmax(s.bal.z2, 0.f), 20.f);
  float m = s.bal.res ? 0.f : s.bal.m;
  s.bal.res = false;
  for (int64_t i = 0; i + 3 < n; i += 4) {
    z1 *= e->w3;
    z2 *= e->w3;
    for (int j = 0; j < 4; ++j) {
      float t = std::fabs(p[i + j]);
      if (t > z1) z1 += e->w1 * (t - z1);
      if (t > z2) z2 += e->w2 * (t - z2);
    }
    float t = z1 + z2;
    if (t > m) m = t;
  }
  s.bal.z1 = z1 + 1e-10f;
  s.bal.z2 = z2 + 1e-10f;
  s.bal.m = m;
}

static void proc_ppm(mt_engine* e, const float* x, int64_t n) {
  for (int c = 0; c < e->nchan; ++c) ppm_block(e, e->ch[c], x + (int64_t)c * n, n);
}

static void proc_kmeter(mt_engine* e, const float* x, int64_t n) {
  const float fall = std::pow(10.0f, -0.05f * 15.0f * ((float)n / e->fs));
  for (int c = 0; c < e->nchan; ++c) {
    ChanState& s = e->ch[c];
    const float* p = x + (int64_t)c * n;
    float z1 = std::fmin(std::fmax(s.kz1, 0.f), 50.f);
    float z2 = std::fmin(std::fmax(s.kz2, 0.f), 50.f);
    float t = 0;
    for (int64_t i = 0; i + 3 < n; i += 4) {
      for (int j = 0; j < 4; ++j) {
        float v = p[i + j] * p[i + j];
        if (v > t) t = v;
        z1 += e->omega * (v - z1);
      }
      z2 += 4 * e->omega * (z1 - z2);
    }
    if (std::isnan(z1)) z1 = 0;
    if (std::isnan(z2)) z2 = 0;
    if (!std::isfinite(t)) t = 0;
    s.kz1 = z1 + 1e-20f;
    s.kz2 = z2 + 1e-20f;
    float rms = std::sqrt(2.f * z2);
    float pk = std::sqrt(t);
    if (s.kflag) { s.krms = rms; s.kflag = false; }
    else if (rms > s.krms) s.krms = rms;
    if (pk >= s.kpeak) { s.kpeak = pk; s.kcnt = e->hold; }
    else if (s.kcnt > 0) s.kcnt -= (int)n;
    else s.kpeak = s.kpeak * fall + 1e-10f;
  }
}

// 4x oversample one channel through the shared polyphase taps; calls
// visit(v) for each rectified oversampled sample.
template <typename F>
static void oversample4(ChanState& s, const float* p, int64_t n, F&& visit) {
  const PolyTaps& tp = poly_taps();
  const int H = 2 * kHl - 1;
  std::vector<float> buf(H + n);
  std::memcpy(buf.data(), s.hist.data(), H * sizeof(float));
  std::memcpy(buf.data() + H, p, n * sizeof(float));
  for (int64_t t = 0; t < n; ++t) {
    const float* w = buf.data() + t;  // window of 2*hl samples
    for (int ph = 0; ph < 4; ++ph) {
      float acc = 0.f;
      const float* tap = tp.taps[ph];
      for (int i = 0; i < 2 * kHl; ++i) acc += w[i] * tap[i];
      visit(std::fabs(acc));
    }
  }
  std::memcpy(s.hist.data(), buf.data() + n, H * sizeof(float));
}

static void proc_truepeak(mt_engine* e, const float* x, int64_t n) {
  for (int c = 0; c < e->nchan; ++c) {
    ChanState& s = e->ch[c];
    float z1 = std::fmin(std::fmax(s.bal.z1, 0.f), 20.f);
    float z2 = std::fmin(std::fmax(s.bal.z2, 0.f), 20.f);
    float m = 0, p = 0;
    int phase = 0;
    oversample4(s, x + (int64_t)c * n, n, [&](float v) {
      if (phase == 0) { z1 *= e->w3; z2 *= e->w3; }
      if (v > z1) z1 += e->w1 * (v - z1);
      if (v > z2) z2 += e->w2 * (v - z2);
      if (v > p) p = v;
      if (++phase == 4) {
        phase = 0;
        float t = z1 + z2;
        if (t > m) m = t;
      }
    });
    s.bal.z1 = z1 + 1e-20f;
    s.bal.z2 = z2 + 1e-20f;
    m *= e->gain;
    if (s.tp_res) { s.tp_m = m; s.tp_p = p; s.tp_res = false; }
    else {
      if (m > s.tp_m) s.tp_m = m;
      if (p > s.tp_p) s.tp_p = p;
    }
  }
}

static void proc_stcorr(mt_engine* e, const float* x, int64_t n) {
  const float* L = x;
  const float* R = x + n;
  CorState& c = e->cor;
  for (int64_t i = 0; i < n; ++i) {
    c.zl += e->w1 * (L[i] - c.zl) + 1e-20f;
    c.zr += e->w1 * (R[i] - c.zr) + 1e-20f;
    c.zlr += e->w2 * (c.zl * c.zr - c.zlr);
    c.zll += e->w2 * (c.zl * c.zl - c.zll);
    c.zrr += e->w2 * (c.zr * c.zr - c.zrr);
  }
  if (!std::isfinite(c.zl)) c.zl = 0;
  if (!std::isfinite(c.zr)) c.zr = 0;
  c.zlr = (std::isfinite(c.zlr) ? c.zlr : 0.f) + 1e-10f;
  c.zll = (std::isfinite(c.zll) ? c.zll : 0.f) + 1e-10f;
  c.zrr = (std::isfinite(c.zrr) ? c.zrr : 0.f) + 1e-10f;
}

// ---- R128 -----------------------------------------------------------------

static double r128_window(const R128Shared& r, int nfrag) {
  // mean of the last nfrag fragment powers (zeros before stream start)
  double s = 0;
  long have = (long)r.power.size();
  for (int i = 0; i < nfrag; ++i) {
    long idx = have - 1 - i;
    if (idx >= 0) s += r.power[idx];
  }
  return -0.6976 + 10.0 * std::log10(s / nfrag);
}

static void r128_addpoint(std::vector<long>& h, long& count, double v) {
  int k = (int)std::floor(10 * v + 700.5);
  if (k < 0) return;
  if (k > 750) k = 750;
  h[k]++;
  count++;
}

static void proc_r128(mt_engine* e, const float* x, int64_t n) {
  R128Shared& r = e->r128;
  // per-sample K-weighted combined power, double precision
  std::vector<double> p(n, 0.0);
  const double gains[5] = {1.0, 1.0, 1.0, 1.41, 1.41};
  for (int c = 0; c < e->nchan; ++c) {
    ChanState& s = e->ch[c];
    const float* in = x + (int64_t)c * n;
    double z1 = s.w1, z2 = s.w2, z3 = s.w3, z4 = s.w4;
    double g = e->nchan == 1 ? 2.0 : gains[c];
    for (int64_t t = 0; t < n; ++t) {
      double xp = in[t] - e->kb1 * z1 - e->kb2 * z2;
      double y = e->ka0 * xp + e->ka1 * z1 + e->ka2 * z2 - e->kc3 * z3 -
                 e->kc4 * z4;
      z2 = z1;
      z1 = xp;
      z4 += z3;
      z3 += y;
      p[t] += g * y * y;
    }
    s.w1 = z1; s.w2 = z2; s.w3 = z3; s.w4 = z4;
  }
  // dBTP via oversampled max per channel
  for (int c = 0; c < e->nchan; ++c) {
    oversample4(e->ch[c], x + (int64_t)c * n, n, [&](float v) {
      if (v > r.dbtp) r.dbtp = v;
    });
  }
  // fragment assembly + gating points
  for (int64_t t = 0; t < n; ++t) {
    r.frpwr += p[t];
    if (--r.frcnt == 0) {
      r.power.push_back(r.frpwr / r.fragm);
      if ((long)r.power.size() > 64) r.power.erase(r.power.begin());
      r.frcnt = r.fragm;
      r.frpwr = 1e-30;
      r.nfrag++;
      double lm = r128_window(r, 8);
      double ls = r128_window(r, 60);
      r.loud_m = (std::isfinite(lm) && lm >= -200) ? lm : -200;
      r.loud_s = (std::isfinite(ls) && ls >= -200) ? ls : -200;
      if (r.loud_m > r.max_m) r.max_m = r.loud_m;
      if (r.loud_s > r.max_s) r.max_s = r.loud_s;
      if (++r.div1 == 2) { r128_addpoint(r.hist_m, r.count_m, r.loud_m); r.div1 = 0; }
      if (++r.div2 == 10) { r128_addpoint(r.hist_s, r.count_s, r.loud_s); r.div2 = 0; }
    }
  }
}

static double r128_integrate(const std::vector<long>& h, int from) {
  double s = 0;
  long nn = 0;
  for (int k = from; k <= 750; ++k) {
    s += h[k] * std::pow(10.0, (k - 700) / 100.0);
    nn += h[k];
  }
  return nn ? s / nn : NAN;
}

// ---- DR-14 window measurement (src/dr14.c:396-445; models/dr14.py) --------

static void proc_dr_windows(mt_engine* e, const float* x, int64_t n) {
  Dr14State& dr = e->dr;
  const int C = e->nchan;
  for (int64_t t = 0; t < n; ++t) {
    for (int c = 0; c < C; ++c) {
      float v = x[(int64_t)c * n + t];
      Dr14Chan& ch = dr.ch[c];
      ch.rms_sum += (double)v * v;
      // MAX macro skips NaN; signed peak with floor 0 (dr14.c:404)
      if (!std::isnan(v) && v > ch.peak_cur) ch.peak_cur = v;
    }
    if (++dr.scnt > dr.win) {  // window spans win+1 samples (dr14.c:404-410)
      dr.scnt = 0;
      const double thr = 1e-9 * (double)dr.win;
      bool loud = false;
      for (int c = 0; c < C; ++c)
        if (dr.ch[c].rms_sum > thr) loud = true;  // gate across channels
      if (loud) {
        dr.num_windows++;
        for (int c = 0; c < C; ++c) {
          Dr14Chan& ch = dr.ch[c];
          double rms = std::sqrt(2.0 * ch.rms_sum / (double)dr.win);
          double db = rms < 1e-4 ? -80.0
                                 : 20.0 * std::log10(std::fmax(rms, 1e-30));
          long bin = std::lround(100.0 * (80.0 + db)) - 1;
          if (bin > 7999) bin = 7999;
          if (bin > 0) ch.hist[(size_t)bin]++;
          if (ch.peak_cur >= ch.top2[0]) {
            ch.top2[1] = ch.top2[0];
            ch.top2[0] = ch.peak_cur;
          } else if (ch.peak_cur > ch.top2[1]) {
            ch.top2[1] = ch.peak_cur;
          }
          ch.peak_cur = 0;  // resets only at counted windows (dr14.c:329-343)
        }
      }
      for (int c = 0; c < C; ++c) dr.ch[c].rms_sum = 0;
    }
  }
}

// ---- goniometer (gui/goniometer.c:299-538; models/goniometer.py) ----------

static void proc_gonio(mt_engine* e, const float* x, int64_t n) {
  GonioState& g = e->gon;
  const int hl = GonioState::hl;
  const int H = 2 * hl - 1;
  const int os = g.os;
  std::vector<double> lr2[2];
  for (int c = 0; c < 2; ++c) {
    const float* p = x + (int64_t)c * n;
    std::vector<double>& o = lr2[c];
    o.resize((size_t)os * n);
    if (os == 1) {
      for (int64_t t = 0; t < n; ++t) o[t] = p[t];
    } else {
      std::vector<float> buf(H + n);
      std::memcpy(buf.data(), g.hist[c].data(), H * sizeof(float));
      std::memcpy(buf.data() + H, p, n * sizeof(float));
      for (int64_t t = 0; t < n; ++t) {
        const float* w = buf.data() + t;
        for (int ph = 0; ph < os; ++ph) {
          float acc = 0.f;
          const float* tap = g.taps.data() + (size_t)ph * 2 * hl;
          for (int i = 0; i < 2 * hl; ++i) acc += w[i] * tap[i];
          o[(size_t)os * t + ph] = acc;
        }
      }
      std::memcpy(g.hist[c].data(), buf.data() + n, H * sizeof(float));
    }
    // reference's "high pass" one-pole tracker used directly as the trace
    double lp = g.lp[c];
    for (size_t i = 0; i < o.size(); ++i) {
      lp += g.hpw * (o[i] - lp) + 1e-12;
      o[i] = lp;
    }
    g.lp[c] = lp;
  }
  // rotate to (L-R, L+R), block extrema + trailing point
  double xmn = INFINITY, xmx = -INFINITY, ymn = INFINITY, ymx = -INFINITY;
  double sl = 0, sr = 0;
  const size_t m = lr2[0].size();
  for (size_t i = 0; i < m; ++i) {
    double ax = lr2[0][i] - lr2[1][i], ay = lr2[0][i] + lr2[1][i];
    if (ax < xmn) xmn = ax;
    if (ax > xmx) xmx = ax;
    if (ay < ymn) ymn = ay;
    if (ay > ymx) ymx = ay;
    sl += lr2[0][i] * lr2[0][i];
    sr += lr2[1][i] * lr2[1][i];
    g.lastx = ax;
    g.lasty = ay;
  }
  if (!g.have) {
    g.xmin = xmn; g.xmax = xmx; g.ymin = ymn; g.ymax = ymx; g.have = true;
  } else {
    g.xmin = std::fmin(g.xmin, xmn); g.xmax = std::fmax(g.xmax, xmx);
    g.ymin = std::fmin(g.ymin, ymn); g.ymax = std::fmax(g.ymax, ymx);
  }
  // autogain, one step per block (gui/goniometer.c:497-537)
  double mx = std::sqrt((xmx - xmn) * (xmx - xmn) + (ymx - ymn) * (ymx - ymn)) *
              0.707;
  double rms = 5.436 * std::sqrt(std::fmax(sl, sr) / (double)m);
  if (g.g_rms > 0) mx = mx * (1.0 - g.g_rms) + rms * g.g_rms;
  mx *= g.g_target;
  if (!std::isfinite(mx)) mx = 0;
  double tgt = mx < 0.01 ? 100.0
                         : (mx > 100.0 ? 0.02 : 2.0 / std::fmax(mx, 1e-6));
  double elapsed = (double)n / e->fs;
  double att = tgt < g.gain
                   ? g.attack_pow * (0.31 + 0.1 * std::log10(elapsed))
                   : g.decay_pow * (0.03 + 0.007 * std::log(elapsed));
  g.gain = std::fmax(g.gain + att * (tgt - g.gain), 0.001);
}

// ---- surround (src/surmeter.c:119-128; models/surround.py) ----------------

static void proc_surround(mt_engine* e, const float* x, int64_t n) {
  proc_kmeter(e, x, n);
  SurState& s = e->sur;
  const int C = e->nchan;
  for (int64_t t = 0; t < n; ++t) {
    for (int c = 0; c < C; ++c) {
      float v = x[(int64_t)c * n + t];
      s.zl[c] += s.w1 * (v - s.zl[c]) + 1e-20;
    }
    for (int p = 0; p < s.npairs; ++p) {
      double a = s.zl[s.pa[p]], b = s.zl[s.pb[p]];
      s.zp[p][0] += s.w2 * (a * b - s.zp[p][0]);
      s.zp[p][1] += s.w2 * (a * a - s.zp[p][1]);
      s.zp[p][2] += s.w2 * (b * b - s.zp[p][2]);
    }
  }
  for (int c = 0; c < C; ++c)
    if (!std::isfinite(s.zl[c])) s.zl[c] = 0;
  for (int p = 0; p < s.npairs; ++p)
    for (int k = 0; k < 3; ++k) {
      if (!std::isfinite(s.zp[p][k])) s.zp[p][k] = 0;
      s.zp[p][k] += 1e-10;  // per-block denormal offset (stcorrdsp.cc:65-76)
    }
}

// coeff -> dB readout (src/dr14.c:233-236)
static double coeff_db(double c) {
  return c < 1e-4 ? -80.0 : 20.0 * std::log10(std::fmax(c, 1e-30));
}

// ---- dispatch -------------------------------------------------------------

extern "C" int mt_engine_process(mt_engine* e, const float* data, int64_t n) {
  if (!e || n <= 0) return -1;
  switch (e->kind) {  // 4-sample ballistics grain (jmeters unrolled
    // loops; the JAX path asserts the same): reject instead of silently
    // dropping the trailing n % 4 samples
    case MT_VU: case MT_IEC1: case MT_IEC2: case MT_KMETER:
    case MT_MSPPM: case MT_DR14: case MT_TPNRMS:
      if (n % 4) return -3;
      break;
    default: break;
  }
  switch (e->kind) {
    case MT_VU: proc_vu(e, data, n); return 0;
    case MT_IEC1:
    case MT_IEC2: proc_ppm(e, data, n); return 0;
    case MT_KMETER: proc_kmeter(e, data, n); return 0;
    case MT_TRUEPEAK: proc_truepeak(e, data, n); return 0;
    case MT_STCORR:
      if (e->nchan != 2) return -2;
      proc_stcorr(e, data, n);
      return 0;
    case MT_R128: proc_r128(e, data, n); return 0;
    case MT_MSPPM: {
      if (e->nchan != 2) return -2;
      const float* L = data;
      const float* R = data + n;
      const float mv = std::pow(10.f, 0.05f * -6.f);
      for (int side = 0; side < 2; ++side) {
        BallState& s = e->ms[side];
        float z1 = std::fmin(std::fmax(s.z1, 0.f), 20.f);
        float z2 = std::fmin(std::fmax(s.z2, 0.f), 20.f);
        float m = s.res ? 0.f : s.m;
        s.res = false;
        for (int64_t i = 0; i + 3 < n; i += 4) {
          z1 *= e->w3;
          z2 *= e->w3;
          for (int j = 0; j < 4; ++j) {
            float t = mv * std::fabs(side ? L[i + j] - R[i + j]
                                          : L[i + j] + R[i + j]);
            if (t > z1) z1 += e->w1 * (t - z1);
            if (t > z2) z2 += e->w2 * (t - z2);
          }
          float t = z1 + z2;
          if (t > m) m = t;
        }
        s.z1 = z1 + 1e-10f;
        s.z2 = z2 + 1e-10f;
        s.m = m;
      }
      return 0;
    }
    case MT_SIGDIST: {
      SigDistState& s = e->sig;
      for (int64_t t = 0; t < n; ++t) {
        float v = data[t];
        s.time++;  // global index: advances even for skipped samples
        int bin = (int)std::rint(180.0f + v * 150.0f);
        if (bin < 0 || bin >= 361) continue;
        if (++s.hist[bin] > s.peak_cnt) { s.peak_cnt = s.hist[bin]; s.peak_bin = bin; }
        s.sum += v;
        s.n++;
        // reference-exact recurrence: count = global sample index, so
        // out-of-range samples inflate the denominator (sigdistlv2.c:313-318)
        double m1 = s.mean;
        s.mean += (v - s.mean) / (double)s.time;
        s.m2 += (v - s.mean) * (v - m1);
      }
      return 0;
    }
    case MT_BITMETER: {
      BitState& s = e->bit;
      for (int64_t t = 0; t < n; ++t) {
        float v = data[t];
        uint32_t u;
        std::memcpy(&u, &v, 4);
        uint32_t exp = (u >> 23) & 0xFF;
        uint32_t man = u & 0x7FFFFF;
        bool neg = u >> 31;
        if (exp == 255) { if (man) s.nan++; else s.inf++; continue; }
        if (exp == 0 && man == 0) { s.zero++; continue; }
        if (exp == 0) s.den++;
        if (!neg) s.pos++;
        if (exp > 0) {
          float a = std::fabs(v);
          if (a > s.vmax) s.vmax = a;
          if (a < s.vmin) s.vmin = a;
        }
      }
      return 0;
    }
    case MT_SPECTRUM: {
      SpectrumState& sp = e->spec;
      const float* L = data;
      const float* R = e->nchan == 2 ? data + n : nullptr;
      for (int64_t t = 0; t < n; ++t) {
        double in = R ? 0.5 * (L[t] + R[t]) : L[t];
        for (int i = 0; i < 30; ++i) {
          SpectrumBand& bd = sp.band[i];
          double v = in;
          for (int s = 0; s < 6; ++s) {
            double y = bd.b0[s] * v + bd.z1[s];
            bd.z1[s] = bd.b1[s] * v - bd.a1[s] * y + bd.z2[s];
            bd.z2[s] = bd.b2[s] * v - bd.a2[s] * y;
            v = y;
          }
          float sq = (float)(v * v);
          bd.val += sp.omega * (sq - bd.val);
          if (bd.val > bd.peak) bd.peak = bd.val;
        }
      }
      for (int i = 0; i < 30; ++i)
        if (!std::isfinite(sp.band[i].val)) sp.band[i].val = 0;
      return 0;
    }
    case MT_DR14:
    case MT_TPNRMS:
      proc_kmeter(e, data, n);    // display RMS meters
      proc_truepeak(e, data, n);  // display dBTP meters
      if (e->kind == MT_DR14) proc_dr_windows(e, data, n);
      return 0;
    case MT_GONIO:
      proc_gonio(e, data, n);
      return 0;
    case MT_PHASEWHEEL:
    case MT_STEREOSCOPE:
      e->stft.process(data, data + n, n);
      return 0;
    case MT_SURROUND:
      proc_surround(e, data, n);
      return 0;
  }
  return -3;
}

extern "C" int mt_engine_read(mt_engine* e, double* out, int maxn) {
  if (!e) return -1;
  switch (e->kind) {
    case MT_VU:
    case MT_IEC1:
    case MT_IEC2: {
      if (maxn < e->nchan) return -2;
      for (int c = 0; c < e->nchan; ++c) {
        out[c] = e->gain * e->ch[c].bal.m;
        e->ch[c].bal.res = true;
      }
      return e->nchan;
    }
    case MT_KMETER: {
      if (maxn < 2 * e->nchan) return -2;
      for (int c = 0; c < e->nchan; ++c) {
        out[2 * c] = e->ch[c].krms;
        out[2 * c + 1] = e->ch[c].kpeak;
        e->ch[c].kflag = true;
      }
      return 2 * e->nchan;
    }
    case MT_TRUEPEAK: {
      if (maxn < 2 * e->nchan) return -2;
      for (int c = 0; c < e->nchan; ++c) {
        out[2 * c] = e->ch[c].tp_m;
        out[2 * c + 1] = e->ch[c].tp_p;
        e->ch[c].tp_res = true;
      }
      return 2 * e->nchan;
    }
    case MT_STCORR: {
      if (maxn < 1) return -2;
      out[0] = e->cor.zlr / std::sqrt(e->cor.zll * e->cor.zrr + 1e-10f);
      return 1;
    }
    case MT_MSPPM: {
      if (maxn < 2) return -2;
      for (int i = 0; i < 2; ++i) {
        out[i] = e->gain * e->ms[i].m;
        e->ms[i].res = true;
      }
      return 2;
    }
    case MT_SIGDIST: {
      if (maxn < 5) return -2;
      out[0] = e->sig.peak_bin;
      out[1] = e->sig.peak_cnt;
      out[2] = e->sig.sum;
      out[3] = e->sig.m2;
      out[4] = e->sig.n;
      return 5;
    }
    case MT_BITMETER: {
      if (maxn < 7) return -2;
      out[0] = e->bit.zero; out[1] = e->bit.pos; out[2] = e->bit.nan;
      out[3] = e->bit.inf; out[4] = e->bit.den; out[5] = e->bit.vmin;
      out[6] = e->bit.vmax;
      return 7;
    }
    case MT_SPECTRUM: {
      if (maxn < 60) return -2;
      for (int i = 0; i < 30; ++i) {
        float vs = std::sqrt(2.f * e->spec.band[i].val);
        float mx = std::sqrt(2.f * e->spec.band[i].peak);
        out[i] = vs > 1e-5f ? 20.0 * std::log10(vs) : -100.0;
        out[30 + i] = mx > 1e-5f ? 20.0 * std::log10(mx) : -100.0;
      }
      return 60;
    }
    case MT_R128: {
      if (maxn < 8) return -2;
      R128Shared& r = e->r128;
      out[0] = r.loud_m;
      out[1] = r.loud_s;
      out[2] = r.max_m;
      out[3] = r.max_s;
      // gated integrated
      double I = -200, lo = -200, hi = -200;
      if (r.count_m >= 50) {
        double s = r128_integrate(r.hist_m, 0);
        int k = (int)std::floor(100 * std::log10(s) + 0.5) + 600;
        if (k < 0) k = 0;
        double g = r128_integrate(r.hist_m, k);
        if (std::isfinite(g)) I = 10 * std::log10(g);
      }
      if (r.count_s >= 20) {
        double s = r128_integrate(r.hist_s, 0);
        int k = (int)std::floor(100 * std::log10(s) + 0.5) + 500;
        if (k < 0) k = 0;
        long nn = 0;
        for (int b = k; b <= 750; ++b) nn += r.hist_s[b];
        double a = 0.10 * nn, bq = 0.95 * nn;
        long acc = 0;
        int i = k;
        while (i <= 750 && acc < a) acc += r.hist_s[i++];
        long acc2 = nn;
        int j = 750;
        while (j >= 0 && acc2 > bq) acc2 -= r.hist_s[j--];
        lo = (i - 701) / 10.0;
        hi = (j - 699) / 10.0;
      }
      out[4] = I;
      out[5] = lo;
      out[6] = hi;
      out[7] = r.dbtp;
      return 8;
    }
    case MT_DR14: {
      const int need = 5 * e->nchan + 2;
      if (maxn < need) return -2;
      Dr14State& dr = e->dr;
      const long nf = dr.num_windows;
      double dr_sum = 0;
      int nvalid = 0;
      for (int c = 0; c < e->nchan; ++c) {
        ChanState& s = e->ch[c];
        Dr14Chan& ch = dr.ch[c];
        double m_dbtp = std::fmax(ch.m_dbtp, (double)s.tp_p);
        ch.m_dbtp = m_dbtp;  // accumulated max dBTP (dr14.c:480)
        out[5 * c + 0] = coeff_db(s.krms);
        out[5 * c + 1] = coeff_db(s.tp_m);
        out[5 * c + 2] = coeff_db(m_dbtp);
        // top-20% RMS score over the 0.01 dB histogram (dr14.c:447-516):
        // include whole bins from the top until >= ceil(nf/5) samples
        long m_cut = std::max(1L, (long)std::floor(nf / 5.0));
        double score = 0;
        long n_cut = 0, cum = 0;
        for (int b = 7999; b >= 1 && cum < m_cut; --b) {
          long cnt = ch.hist[(size_t)b];
          double cd = std::pow(10.0, 0.05 * (double)(b - 7999) / 100.0);
          score += cnt * cd * cd;
          n_cut += cnt;
          cum += cnt;
        }
        double rms_db =
            (n_cut > 0 && nf > 2)
                ? coeff_db(std::sqrt(score / (double)std::max(n_cut, 1L)))
                : -81.0;
        double peak_db = nf > 2 ? coeff_db(ch.top2[1]) : -81.0;
        out[5 * c + 3] = rms_db;
        bool both = rms_db > -80.0 && peak_db > -80.0;
        double dr_raw = std::fmin(0.0, peak_db) - rms_db;
        out[5 * c + 4] = both ? std::fmin(std::fmax(dr_raw, 1.0), 20.0) : 21.0;
        if (both) {
          dr_sum += dr_raw;
          nvalid++;
        }
        s.kflag = true;
        s.tp_res = true;
      }
      out[5 * e->nchan] =
          nvalid ? std::fmin(std::fmax(dr_sum / nvalid, 1.0), 20.0) : 21.0;
      out[5 * e->nchan + 1] = 3.0 * (double)nf;
      return need;
    }
    case MT_TPNRMS: {
      const int need = 4 * e->nchan;
      if (maxn < need) return -2;
      for (int c = 0; c < e->nchan; ++c) {
        ChanState& s = e->ch[c];
        Dr14Chan& ch = e->dr.ch[c];
        double m_dbtp = std::fmax(ch.m_dbtp, (double)s.tp_p);
        ch.m_dbtp = m_dbtp;
        out[4 * c + 0] = coeff_db(s.krms);
        out[4 * c + 1] = coeff_db(s.tp_m);
        out[4 * c + 2] = coeff_db(m_dbtp);
        out[4 * c + 3] = coeff_db(s.kpeak);
        s.kflag = true;
        s.tp_res = true;
      }
      return need;
    }
    case MT_GONIO: {
      if (maxn < 7) return -2;
      GonioState& g = e->gon;
      out[0] = g.gain;
      out[1] = g.have ? g.xmin : 0.0;
      out[2] = g.have ? g.xmax : 0.0;
      out[3] = g.have ? g.ymin : 0.0;
      out[4] = g.have ? g.ymax : 0.0;
      out[5] = g.lastx;
      out[6] = g.lasty;
      g.have = false;  // extrema are read-and-reset
      return 7;
    }
    case MT_PHASEWHEEL: {
      const int D = StftState::D;
      if (maxn < 1 + 2 * D) return -2;
      out[0] = e->stft.peak;
      for (int b = 0; b < D; ++b) out[1 + b] = e->stft.dphi[b];
      for (int b = 0; b < D; ++b) out[1 + D + b] = e->stft.level[b];
      return 1 + 2 * D;
    }
    case MT_STEREOSCOPE: {
      const int D = StftState::D;
      if (maxn < 2 * D) return -2;
      for (int b = 0; b < D; ++b) out[b] = e->stft.lr[b];
      for (int b = 0; b < D; ++b) out[D + b] = e->stft.slevel[b];
      return 2 * D;
    }
    case MT_SURROUND: {
      SurState& s = e->sur;
      const int need = 2 * e->nchan + s.npairs;
      if (maxn < need) return -2;
      for (int c = 0; c < e->nchan; ++c) {
        out[2 * c] = e->ch[c].krms;
        out[2 * c + 1] = e->ch[c].kpeak;
        e->ch[c].kflag = true;
      }
      for (int p = 0; p < s.npairs; ++p)
        out[2 * e->nchan + p] =
            s.zp[p][0] / std::sqrt(s.zp[p][1] * s.zp[p][2] + 1e-10);
      return need;
    }
  }
  return -3;
}
