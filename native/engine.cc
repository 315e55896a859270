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

// windowed sinc table h(t) = sinc(t) * (0.384 + 0.5 cos(pi t/hl) +
// 0.116 cos(2 pi t/hl)); 4-phase interpolation taps, phase ph tap i
// applies to x[t - 2*hl + 1 + i].
struct PolyTaps {
  float taps[4][2 * kHl];
  PolyTaps() {
    for (int ph = 0; ph < 4; ++ph) {
      for (int i = 0; i < 2 * kHl; ++i) {
        double t = (kHl - 1 - i) + ph / 4.0;
        double a = std::fabs(t);
        double sinc = a < 1e-9 ? 1.0 : std::sin(M_PI * a) / (M_PI * a);
        double w = 0.0;
        double u = std::fabs(t / kHl);
        if (u < 1.0)
          w = 0.384 + 0.5 * std::cos(M_PI * u) + 0.116 * std::cos(2 * M_PI * u);
        taps[ph][i] = (float)(sinc * w);
      }
    }
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
  long n = 0;
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
      design_kweight(e);
      e->r128.fragm = (int)fs / 20;
      e->r128.frcnt = e->r128.fragm;
      e->r128.hist_m.assign(751, 0);
      e->r128.hist_s.assign(751, 0);
      for (auto& c : e->ch) c.hist.assign(2 * kHl - 1, 0.f);
      break;
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

// ---- dispatch -------------------------------------------------------------

extern "C" int mt_engine_process(mt_engine* e, const float* data, int64_t n) {
  if (!e || n <= 0) return -1;
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
        int bin = (int)std::rint(180.0f + v * 150.0f);
        if (bin < 0 || bin >= 361) continue;
        if (++s.hist[bin] > s.peak_cnt) { s.peak_cnt = s.hist[bin]; s.peak_bin = bin; }
        s.sum += v;
        s.n++;
        double d = v - s.mean;
        s.mean += d / s.n;
        s.m2 += d * (v - s.mean);
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
  }
  return -3;
}
