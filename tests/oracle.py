"""Per-sample float32 oracle implementations of the reference DSP semantics.

These mirror, sample by sample and in float32, the recurrences of the
reference cores (jmeters/*, ebumeter/ebu_r128_proc.cc, zita-resampler,
src/spectr.c) — written from the documented equations, used as the
numerical ground truth for the TPU implementations.  They are additionally
cross-checked once against a golden binary compiled from the reference
sources (tools/golden) and the resulting fixtures are committed.
"""

from __future__ import annotations

import numpy as np

f32 = np.float32


# ---------------------------------------------------------------------------
# VU (vumeterdsp.cc:45-98)
# ---------------------------------------------------------------------------


class VUOracle:
    def __init__(self, fs):
        self.w = f32(11.1 / fs)
        self.g = f32(1.5 * 1.571)
        self.z1 = f32(0)
        self.z2 = f32(0)
        self.m = f32(0)
        self.res = True

    def process(self, p):
        w = self.w
        z1 = min(max(self.z1, f32(-20)), f32(20))
        z2 = min(max(self.z2, f32(-20)), f32(20))
        m = f32(0) if self.res else self.m
        self.res = False
        p = p.astype(f32)
        for i in range(0, len(p) - len(p) % 4, 4):
            t2 = f32(z2 / 2)
            for j in range(4):
                t1 = f32(abs(p[i + j]) - t2)
                z1 = f32(z1 + w * f32(t1 - z1))
            z2 = f32(z2 + f32(4 * w) * f32(z1 - z2))
            if z2 > m:
                m = z2
        if not np.isfinite(z1):
            self.z1, m = f32(0), f32(np.inf)
        else:
            self.z1 = z1
        if not np.isfinite(z2):
            self.z2, m = f32(0), f32(np.inf)
        else:
            self.z2 = f32(z2 + f32(1e-10))
        self.m = m

    def read(self):
        self.res = True
        return f32(self.g * self.m)


# ---------------------------------------------------------------------------
# IEC Type I / II PPM (iec1ppmdsp.cc, iec2ppmdsp.cc)
# ---------------------------------------------------------------------------


class PPMOracle:
    def __init__(self, fs, kind="iec2"):
        fs = float(fs)
        if kind == "iec1":
            self.w1, self.w2, self.w3, self.g = (
                f32(450.0 / fs),
                f32(1300.0 / fs),
                f32(1.0 - 5.4 / fs),
                f32(0.5108),
            )
        else:
            self.w1, self.w2, self.w3, self.g = (
                f32(200.0 / fs),
                f32(860.0 / fs),
                f32(1.0 - 4.0 / fs),
                f32(0.5141),
            )
        self.z1 = f32(0)
        self.z2 = f32(0)
        self.m = f32(0)
        self.res = True

    def process(self, p):
        z1 = min(max(self.z1, f32(0)), f32(20))
        z2 = min(max(self.z2, f32(0)), f32(20))
        m = f32(0) if self.res else self.m
        self.res = False
        p = p.astype(f32)
        for i in range(0, len(p) - len(p) % 4, 4):
            z1 = f32(z1 * self.w3)
            z2 = f32(z2 * self.w3)
            for j in range(4):
                t = f32(abs(p[i + j]))
                if t > z1:
                    z1 = f32(z1 + self.w1 * f32(t - z1))
                if t > z2:
                    z2 = f32(z2 + self.w2 * f32(t - z2))
            t = f32(z1 + z2)
            if t > m:
                m = t
        self.z1 = f32(z1 + f32(1e-10))
        self.z2 = f32(z2 + f32(1e-10))
        self.m = m

    def read(self):
        self.res = True
        return f32(self.g * self.m)


# ---------------------------------------------------------------------------
# K-meter (kmeterdsp.cc)
# ---------------------------------------------------------------------------


class KMeterOracle:
    def __init__(self, fs):
        self.fs = float(fs)
        self.omega = f32(9.72 / fs)
        self.hold = int(0.5 * fs + 0.5)
        self.z1 = f32(0)
        self.z2 = f32(0)
        self.rms = f32(0)
        self.peak = f32(0)
        self.cnt = 0
        self.flag = False

    def process(self, p):
        n = len(p)
        fall = f32(10.0 ** (-0.05 * 15.0 * (n / self.fs)))
        t = f32(0)
        z1 = min(max(self.z1, f32(0)), f32(50))
        z2 = min(max(self.z2, f32(0)), f32(50))
        p = p.astype(f32)
        for i in range(0, n - n % 4, 4):
            for j in range(4):
                s = f32(p[i + j] * p[i + j])
                if t < s:
                    t = s
                z1 = f32(z1 + self.omega * f32(s - z1))
            z2 = f32(z2 + f32(4 * self.omega) * f32(z1 - z2))
        if np.isnan(z1):
            z1 = f32(0)
        if np.isnan(z2):
            z2 = f32(0)
        if not np.isfinite(t):
            t = f32(0)
        self.z1 = f32(z1 + f32(1e-20))
        self.z2 = f32(z2 + f32(1e-20))
        s = f32(np.sqrt(f32(2.0 * z2)))
        t = f32(np.sqrt(t))
        if self.flag:
            self.rms = s
            self.flag = False
        elif s > self.rms:
            self.rms = s
        if t >= self.peak:
            self.peak = t
            self.cnt = self.hold
        elif self.cnt > 0:
            self.cnt -= n
        else:
            self.peak = f32(self.peak * fall + f32(1e-10))

    def read(self):
        self.flag = True
        return self.rms, self.peak


# ---------------------------------------------------------------------------
# Stereo correlation (stcorrdsp.cc)
# ---------------------------------------------------------------------------


class StcorrOracle:
    def __init__(self, fs, flp=2000.0, tcf=0.3):
        self.w1 = f32(6.28 * flp / fs)
        self.w2 = f32(1.0 / (tcf * fs))
        self.zl = self.zr = self.zlr = self.zll = self.zrr = f32(0)

    def process(self, pl, pr):
        zl, zr = self.zl, self.zr
        zlr, zll, zrr = self.zlr, self.zll, self.zrr
        for l, r in zip(pl.astype(f32), pr.astype(f32)):
            zl = f32(zl + self.w1 * f32(l - zl) + f32(1e-20))
            zr = f32(zr + self.w1 * f32(r - zr) + f32(1e-20))
            zlr = f32(zlr + self.w2 * f32(f32(zl * zr) - zlr))
            zll = f32(zll + self.w2 * f32(f32(zl * zl) - zll))
            zrr = f32(zrr + self.w2 * f32(f32(zr * zr) - zrr))
        for name, v in [("zl", zl), ("zr", zr)]:
            setattr(self, name, v if np.isfinite(v) else f32(0))
        self.zlr = f32((zlr if np.isfinite(zlr) else f32(0)) + f32(1e-10))
        self.zll = f32((zll if np.isfinite(zll) else f32(0)) + f32(1e-10))
        self.zrr = f32((zrr if np.isfinite(zrr) else f32(0)) + f32(1e-10))

    def read(self):
        return f32(self.zlr / f32(np.sqrt(f32(self.zll * self.zrr + f32(1e-10)))))


# ---------------------------------------------------------------------------
# K-weighting + R128 (ebu_r128_proc.cc) — float32 per-sample filter; the
# gating/histogram logic is tested separately against the JAX pipeline.
# ---------------------------------------------------------------------------


def kweight_filter(fs, x):
    """Apply the combined K-weighting filter per channel; x [C, T] -> y [C, T].

    float64 cascade via scipy.lfilter: stage 1 = biquad (num [a0,a1,a2],
    den [1,b1,b2]); stage 2 = the z3/z4 integrator correction, which in
    transfer-function form is (1-z^-1)^2 / ((1-z^-1)^2 + c3 z^-1 (1-z^-1)
    + c4 z^-2) = [1,-2,1] / [1, c3-2, 1-c3+c4].
    """
    from scipy.signal import lfilter

    from meters_lv2_tpu.ops.design import k_weighting

    k = k_weighting(fs)
    y1 = lfilter([k.a0, k.a1, k.a2], [1.0, k.b1, k.b2], x, axis=-1)
    return lfilter([1.0, -2.0, 1.0], [1.0, k.c3 - 2.0, 1.0 - k.c3 + k.c4], y1, axis=-1)


class EbuR128Oracle:
    """Full R128 measurement loop (ebu_r128_proc.cc:207-260, 105-150)."""

    def __init__(self, nchan, fs):
        self.nchan = nchan
        self.fs = float(fs)
        self.fragm = int(fs) // 20
        self.chan_gain = [1.0, 1.0, 1.0, 1.41, 1.41]
        self.reset()

    def reset(self):
        self.frcnt = self.fragm
        self.frpwr = f32(1e-30)
        self.power = np.zeros(64, f32)
        self.wrind = 0
        self.div1 = 0
        self.div2 = 0
        self.loudness_M = -200.0
        self.loudness_S = -200.0
        self.maxloudn_M = -200.0
        self.maxloudn_S = -200.0
        self.integrated = -200.0
        self.range_min = -200.0
        self.range_max = -200.0
        self.integr = True
        self.hist_M = np.zeros(751, np.int64)
        self.hist_S = np.zeros(751, np.int64)
        self.count_M = 0
        self.count_S = 0
        self.z = np.zeros((self.nchan, 4), f32)

    def _power_series(self, x):
        """Channel-combined K-weighted power per sample (float64 vectorized;
        the fragment-rate gating logic below stays bit-faithful — filter
        rounding differences vs the f32 reference are far below tolerance).
        """
        from scipy.signal import lfilter

        from meters_lv2_tpu.ops.design import k_weighting

        k = k_weighting(self.fs)
        if not hasattr(self, "zi1"):
            self.zi1 = np.zeros((self.nchan, 2))
            self.zi2 = np.zeros((self.nchan, 2))
        y1, self.zi1 = lfilter(
            [k.a0, k.a1, k.a2], [1.0, k.b1, k.b2], x, axis=-1, zi=self.zi1
        )
        y, self.zi2 = lfilter(
            [1.0, -2.0, 1.0],
            [1.0, k.c3 - 2.0, 1.0 - k.c3 + k.c4],
            y1,
            axis=-1,
            zi=self.zi2,
        )
        sq = y * y
        if self.nchan == 1:
            return 2.0 * sq[0]
        return np.dot(self.chan_gain[: self.nchan], sq)

    def _addfrags(self, nfrag):
        k = (self.wrind - nfrag) & 63
        s = f32(0)
        for i in range(nfrag):
            s = f32(s + self.power[(i + k) & 63])
        return -0.6976 + 10 * np.log10(s / nfrag)

    @staticmethod
    def _addpoint(hist, v):
        k = int(np.floor(10 * v + 700.5))
        if k < 0:
            return 0
        k = min(k, 750)
        hist[k] += 1
        return 1

    @staticmethod
    def _integrate(hist, i):
        ks = np.arange(i, 751)
        n = hist[i:].sum()
        s = (hist[i:] * np.power(10.0, (ks - 700) / 100.0)).sum()
        return s / n if n else np.nan

    def calc_integ(self):
        if self.count_M < 50:
            return -200.0
        s = self._integrate(self.hist_M, 0)
        k = int(np.floor(100 * np.log10(s) + 0.5)) + 600
        k = max(k, 0)
        return 10 * np.log10(self._integrate(self.hist_M, k))

    def calc_range(self):
        if self.count_S < 20:
            return -200.0, -200.0
        s = self._integrate(self.hist_S, 0)
        k = int(np.floor(100 * np.log10(s) + 0.5)) + 500
        k = max(k, 0)
        n = self.hist_S[k:].sum()
        a = 0.10 * n
        b = 0.95 * n
        i = k
        s2 = 0
        while s2 < a:
            s2 += self.hist_S[i]
            i += 1
        j = 750
        s2 = n
        while s2 > b:
            s2 -= self.hist_S[j]
            j -= 1
        return (i - 701) / 10.0, (j - 699) / 10.0

    def process(self, x):
        """x [C, T]."""
        p = self._power_series(x.astype(np.float64))
        off = 0
        nfram = x.shape[1]
        while nfram:
            k = min(self.frcnt, nfram)
            self.frpwr = self.frpwr + float(np.sum(p[off : off + k]))
            self.frcnt -= k
            if self.frcnt == 0:
                self.power[self.wrind] = f32(self.frpwr / self.fragm)
                self.wrind = (self.wrind + 1) & 63
                self.frcnt = self.fragm
                self.frpwr = f32(1e-30)
                lm = self._addfrags(8)
                ls = self._addfrags(60)
                self.loudness_M = -200.0 if (not np.isfinite(lm) or lm < -200) else lm
                self.loudness_S = -200.0 if (not np.isfinite(ls) or ls < -200) else ls
                self.maxloudn_M = max(self.maxloudn_M, self.loudness_M)
                self.maxloudn_S = max(self.maxloudn_S, self.loudness_S)
                if self.integr:
                    self.div1 += 1
                    if self.div1 == 2:
                        self.count_M += self._addpoint(self.hist_M, self.loudness_M)
                        self.div1 = 0
                    self.div2 += 1
                    if self.div2 == 10:
                        self.count_S += self._addpoint(self.hist_S, self.loudness_S)
                        self.div2 = 0
                        self.integrated = self.calc_integ()
                        self.range_min, self.range_max = self.calc_range()
            off += k
            nfram -= k


# ---------------------------------------------------------------------------
# zita 4x upsampler (resampler.cc with setup(fs, 4fs, 1, 24, 1.0))
# ---------------------------------------------------------------------------


def upsample4_oracle(x):
    """Oversample whole signal 4x with zero history; float64 taps, f32 data.

    Matches the reference stream after its 8192-zero prefeed: output
    up[4t+ph] covers inputs x[t-47..t] (zeros before t=0).
    """
    from meters_lv2_tpu.ops.design import upsample4_kernel

    taps = upsample4_kernel(24)  # [4, 48]
    T = len(x)
    xp = np.concatenate([np.zeros(47, f32), x.astype(f32)])
    up = np.zeros(4 * T, f32)
    for t in range(T):
        w = xp[t : t + 48]
        for ph in range(4):
            s = f32(1e-20)
            for i in range(48):
                s = f32(s + w[i] * f32(taps[ph, i]))
            up[4 * t + ph] = f32(s - f32(1e-20))
    return up
