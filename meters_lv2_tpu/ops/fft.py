"""Streaming STFT analysis engine (batched TPU port of the capability of
gui/fft.c).

The reference keeps a ring buffer and runs one FFTW r2hc transform whenever
`hop = ceil(rate/fps)` new samples have arrived (fft.c:209-237, 284-340).
Here a whole block of frames is analyzed at once: frame extraction is a
batched gather, the transform is `jnp.fft.rfft` over [frames, window] (XLA
maps it onto the MXU/VPU), and power/phase follow the reference's
ft_analyze (fft.c:163-180): power[0] = Re0^2, bins 1..W/2-2 get Re^2+Im^2
and atan2(Im, Re); bin W/2-1 stays 0.

Window functions and their 2/sum normalisation follow fft.c:84-161.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

WINDOW_TYPES = (
    "hann",
    "hamming",
    "nuttall",
    "blackman_nuttall",
    "blackman_harris",
    "flat_top",
)


def make_window(kind: str, n: int) -> np.ndarray:
    """Analysis window, normalised so sum(w) = 2 (fft.c:154-158)."""
    i = np.arange(n, dtype=np.float64)
    c = 2.0 * math.pi * i / (n - 1.0)
    if kind == "hann":
        w = 0.5 - 0.5 * np.cos(c)
    elif kind == "hamming":
        w = 0.54 - 0.46 * np.cos(c)
    elif kind == "nuttall":
        a = (0.355768, 0.487396, 0.144232, 0.012604)
        w = a[0] - a[1] * np.cos(c) + a[2] * np.cos(2 * c) - a[3] * np.cos(3 * c)
    elif kind == "blackman_nuttall":
        a = (0.3635819, 0.4891775, 0.1365995, 0.0106411)
        w = a[0] - a[1] * np.cos(c) + a[2] * np.cos(2 * c) - a[3] * np.cos(3 * c)
    elif kind == "blackman_harris":
        a = (0.35875, 0.48829, 0.14128, 0.01168)
        w = a[0] - a[1] * np.cos(c) + a[2] * np.cos(2 * c) - a[3] * np.cos(3 * c)
    elif kind == "flat_top":
        w = (
            1.0
            - 1.93 * np.cos(c)
            + 1.29 * np.cos(2 * c)
            - 0.388 * np.cos(3 * c)
            + 0.028 * np.cos(4 * c)
        )
    else:
        raise KeyError(kind)
    return (w * (2.0 / w.sum())).astype(np.float64)


class GemmRFFT:
    """Real FFT as two-stage Cooley-Tukey MXU GEMMs.

    XLA's TPU FFT lowering spreads an 8192-point transform across many
    small stages; this instead packs even/odd samples as one complex
    sequence of M = n/2, factors M = M1*M2 (~64x64), and runs the two
    DFT stages as batched [*, M1|M2]-contraction matmuls that tile
    straight onto the MXU (precision HIGH = 3-pass bf16 on TPU, true f32
    elsewhere), with the standard r2c untangle at the end.  Math:

      z[m] = x[2m] + i x[2m+1]
      Z = DFT_M(z):  Y[n1,k2] = sum_n2 z[n1 + M1*n2] W_M2^{n2 k2}
                     Z[k2 + M2*k1] = sum_n1 W_M^{n1 k2} W_M1^{n1 k1} Y
      X[k] = (Z[k] + conj(Z[-k]))/2 - (i/2) W_n^k (Z[k] - conj(Z[-k]))

    Returns bins 0..M-1 (exactly the data_size bins the analyzers use;
    fft.c's ft_analyze zeroes the top one anyway).
    """

    @staticmethod
    def supports(n: int) -> bool:
        """True when the two-stage m1 x m2 factorization exists (m1 =
        largest power of two <= sqrt(n/2) must divide n/2 — always true
        for power-of-two windows, not e.g. n=36)."""
        if n % 2:
            return False
        m = n // 2
        m1 = 1 << ((m.bit_length() - 1) // 2)
        return m % m1 == 0

    def __init__(self, n: int, dtype=jnp.float32):
        assert self.supports(n), f"no two-stage factorization for n={n}"
        self.n = n
        m = n // 2
        m1 = 1 << ((m.bit_length() - 1) // 2)
        m2 = m // m1
        self.m, self.m1, self.m2 = m, m1, m2
        k2 = np.arange(m2)
        n1 = np.arange(m1)
        a2 = -2.0 * math.pi / m2 * np.outer(k2, k2)
        self.f2c = np.cos(a2).astype(np.float32)  # [n2, k2]
        self.f2s = np.sin(a2).astype(np.float32)
        a1 = -2.0 * math.pi / m1 * np.outer(n1, n1)
        self.f1c = np.cos(a1).astype(np.float32)  # [k1, n1]
        self.f1s = np.sin(a1).astype(np.float32)
        tw = -2.0 * math.pi / m * np.outer(n1, k2)
        self.twc = np.cos(tw).astype(np.float32)  # [n1, k2]
        self.tws = np.sin(tw).astype(np.float32)
        k = np.arange(m)
        wk = -2.0 * math.pi / n * k
        self.wc = np.cos(wk).astype(np.float32)
        self.ws = np.sin(wk).astype(np.float32)
        self.dtype = dtype

    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """x: [..., n] real -> (re, im) each [..., n//2] (bins 0..n/2-1)."""
        import jax.lax as lax

        P = lax.Precision.HIGH
        m, m1, m2 = self.m, self.m1, self.m2
        *b, n = x.shape
        assert n == self.n, (n, self.n)
        z = x.reshape(*b, m, 2)
        zr = z[..., 0].reshape(*b, m2, m1)  # [n2, n1]
        zi = z[..., 1].reshape(*b, m2, m1)
        # stage A: contract n2 (the sublane axis — dot_general handles
        # either orientation, no transpose copy)
        ee = functools.partial(jnp.einsum, precision=P)
        yr = ee("...ni,nk->...ik", zr, self.f2c) - ee(
            "...ni,nk->...ik", zi, self.f2s
        )  # [n1, k2]
        yi = ee("...ni,nk->...ik", zr, self.f2s) + ee(
            "...ni,nk->...ik", zi, self.f2c
        )
        # twiddle
        tr = yr * self.twc - yi * self.tws
        ti = yr * self.tws + yi * self.twc
        # stage B: contract n1
        zr2 = ee("kn,...nj->...kj", self.f1c, tr) - ee(
            "kn,...nj->...kj", self.f1s, ti
        )  # [k1, k2]
        zi2 = ee("kn,...nj->...kj", self.f1c, ti) + ee(
            "kn,...nj->...kj", self.f1s, tr
        )
        Zr = zr2.reshape(*b, m)  # k = M2*k1 + k2
        Zi = zi2.reshape(*b, m)
        # r2c untangle: E/O split against conj(Z[-k])
        Zrr = jnp.concatenate([Zr[..., :1], jnp.flip(Zr[..., 1:], -1)], -1)
        Zri = jnp.concatenate([Zi[..., :1], jnp.flip(Zi[..., 1:], -1)], -1)
        er = 0.5 * (Zr + Zrr)
        ei = 0.5 * (Zi - Zri)
        orr = 0.5 * (Zi + Zri)
        oi = 0.5 * (Zrr - Zr)
        re = er + self.wc * orr - self.ws * oi
        im = ei + self.wc * oi + self.ws * orr
        return re.astype(self.dtype), im.astype(self.dtype)


@dataclasses.dataclass(frozen=True)
class STFTState:
    """Carried ring of the last window_size samples + analysis history."""

    tail: jax.Array  # [..., W] last W input samples (oldest first)
    phase_h: jax.Array  # [..., W//2] phase of previous analysis


jax.tree_util.register_dataclass(
    STFTState, data_fields=["tail", "phase_h"], meta_fields=[]
)


class STFT:
    """Fixed-hop streaming STFT.

    The reference hop is quantised to its process() call boundaries; here
    frames fall at exact multiples of `hop` — same analysis rate, regular
    placement.  update() blocks must be multiples of hop (pad/segment at
    the pipeline layer).
    """

    def __init__(
        self,
        rate: float,
        window_size: int = 8192,
        fps: float = 25.0,
        window: str = "hann",
        dtype=jnp.float32,
    ):
        self.rate = float(rate)
        self.window_size = int(window_size)
        self.data_size = self.window_size // 2
        self.hop = int(math.ceil(rate / fps)) if fps > 0 else self.window_size
        self.win = jnp.asarray(make_window(window, self.window_size), dtype)
        self.freq_per_bin = self.rate / self.data_size / 2.0
        self.phasediff_step = math.pi / self.data_size
        self.dtype = dtype
        self._gemm = None  # built lazily; keyed on the env-resolved mode

    def _rfft_halves(self, frames: jax.Array) -> tuple[jax.Array, jax.Array]:
        """(re, im) of the first data_size rfft bins of [..., W] frames.

        METERS_TPU_STFT_GEMM selects the transform: '1' opts into the
        two-stage GEMM DFT (ops.fft.GemmRFFT); default '0' uses
        jnp.fft.rfft (measured faster AND tighter on-chip — see the
        comment below).
        """
        # default is rfft everywhere: the GEMM variant measured SLOWER
        # through the tunnel (phasewheel 15.9 vs 13.2 ms at 64x1s) and
        # its 3-pass bf16 passes miss the repo's 2e-4 on-chip STFT power
        # parity bar (0.0018 rel) — docs/BENCHMARKS.md round 4.  Kept as
        # an opt-in for re-measurement on locally-attached hardware.
        mode = os.environ.get("METERS_TPU_STFT_GEMM", "0")
        use_gemm = mode == "1" and GemmRFFT.supports(self.window_size)
        if use_gemm:
            if self._gemm is None:
                self._gemm = GemmRFFT(self.window_size, self.dtype)
            return self._gemm(frames)
        X = jnp.fft.rfft(frames, axis=-1)
        re = jnp.real(X).astype(self.dtype)[..., : self.data_size]
        im = jnp.imag(X).astype(self.dtype)[..., : self.data_size]
        return re, im

    def init(self, batch_shape=()) -> STFTState:
        return STFTState(
            tail=jnp.zeros((*batch_shape, self.window_size), self.dtype),
            phase_h=jnp.zeros((*batch_shape, self.data_size), self.dtype),
        )

    def frames_in(self, T: int) -> int:
        assert T % self.hop == 0, (T, self.hop)
        return T // self.hop

    def update(self, state: STFTState, x: jax.Array,
               compute_phase: bool = True):
        """x: [..., T], T % hop == 0.

        Returns (power [..., F, W/2], phase [..., F, W/2] | None,
        new_state) where F = T // hop; frame f covers the window ending at
        sample (f+1)*hop.  Power-only consumers (e.g. the stereoscope)
        pass compute_phase=False to skip the per-bin atan2 — phase is
        then None (not zeros: a caller forgetting the flag fails loudly
        instead of silently reading an all-zero phase) and phase_h is
        carried unchanged.
        """
        *batch, T = x.shape
        F = self.frames_in(T)
        W = self.window_size
        ext = jnp.concatenate([state.tail, x], axis=-1)  # [..., W + T]
        # frame f = ext[hop*(f+1) : hop*(f+1)+W]
        starts = (jnp.arange(F) + 1) * self.hop
        idx = starts[:, None] + jnp.arange(W)[None, :]  # [F, W]
        frames = ext[..., idx]  # [..., F, W]
        frames = frames * self.win
        re, im = self._rfft_halves(frames)  # [..., F, W/2]
        power = re * re + im * im
        # ft_analyze boundary handling (fft.c:166-178): bin 0 phase = 0,
        # power[0] = Re0^2; top bin of data_size left zero
        power = power.at[..., self.data_size - 1].set(0.0)
        if compute_phase:
            phase = jnp.arctan2(im, re)
            phase = phase.at[..., 0].set(0.0)
            phase = phase.at[..., self.data_size - 1].set(0.0)
            phase_h = phase[..., -1, :]
        else:
            phase = None
            phase_h = state.phase_h
        new_state = STFTState(tail=ext[..., -W:], phase_h=phase_h)
        return power, phase, new_state

    def update_stereo(self, state: STFTState, x: jax.Array):
        """update() for a stereo pair with ONE complex FFT for both
        channels (the classic real-pair packing: Z = fft(l + i*r),
        L_k = (Z_k + conj(Z_{-k}))/2, R_k = -i (Z_k - conj(Z_{-k}))/2).

        state: STFTState with a trailing channel batch dim of 2 (as
        init((*batch, 2))); x: [..., 2, T].  Returns the same
        (power, phase, state) as update() — channel axis at -3 of the
        frame outputs — with identical math up to FFT rounding.

        Measured SLOWER than two rffts on TPU v5e (phasewheel 17.7 vs
        13.2 ms at 64x1s): XLA's rfft already exploits realness, so the
        full-width complex transform plus the flip/unpack costs more
        than it saves.  Kept for backends where rfft lowers naively.
        """
        *batch, C, T = x.shape
        assert C == 2
        F = self.frames_in(T)
        W = self.window_size
        ext = jnp.concatenate([state.tail, x], axis=-1)  # [..., 2, W + T]
        starts = (jnp.arange(F) + 1) * self.hop
        idx = starts[:, None] + jnp.arange(W)[None, :]
        frames = ext[..., idx] * self.win  # [..., 2, F, W]
        z = jax.lax.complex(frames[..., 0, :, :], frames[..., 1, :, :])
        Z = jnp.fft.fft(z, axis=-1)  # [..., F, W]
        H = W // 2
        Zk = Z[..., : H + 1]
        # conj(Z_{-k}) for k = 0..W/2  (Z_{-0} = Z_0)
        Zr = jnp.concatenate(
            [Z[..., :1], jnp.flip(Z[..., W - H :], axis=-1)], axis=-1
        ).conj()
        L = 0.5 * (Zk + Zr)
        R = -0.5j * (Zk - Zr)
        X = jnp.stack([L, R], axis=-3)  # [..., 2, F, W/2+1]
        re = jnp.real(X).astype(self.dtype)
        im = jnp.imag(X).astype(self.dtype)
        power = (re * re + im * im)[..., : self.data_size]
        phase = jnp.arctan2(im, re)[..., : self.data_size]
        power = power.at[..., self.data_size - 1].set(0.0)
        phase = phase.at[..., 0].set(0.0)
        phase = phase.at[..., self.data_size - 1].set(0.0)
        return power, phase, STFTState(
            tail=ext[..., -W:], phase_h=phase[..., -1, :]
        )

    def analyze_impulse(self, run_fn, prerun: int = 8192):
        """Transfer-function self-analysis (fa_analyze_dsp, fft.c:363-387):
        pre-feed `prerun` zeros through run_fn (flushes filter state), then
        a unit impulse, and analyze the windowed response.

        run_fn: callable(block [T]) -> processed block [T] (e.g. a meter's
        filter path).  Returns (power [W/2], phase [W/2]).
        """
        import numpy as np

        W = self.window_size
        n = 0
        while n < prerun:
            step = min(prerun - n, W)
            run_fn(jnp.zeros(step, self.dtype))
            n += step
        buf = jnp.zeros(W, self.dtype).at[0].set(1.0)
        y = run_fn(buf)
        # NB: no analysis window — fa_analyze_dsp fills fft_in directly and
        # calls ft_analyze, skipping the window multiply (fft.c:363-387)
        X = jnp.fft.rfft(y[None], axis=-1)
        re = jnp.real(X).astype(self.dtype)
        im = jnp.imag(X).astype(self.dtype)
        power = (re * re + im * im)[0, : self.data_size]
        phase = jnp.arctan2(im, re)[0, : self.data_size]
        return power, phase

    def freq_at_bin(
        self, phase: jax.Array, phase_h: jax.Array, step: int
    ) -> jax.Array:
        """Phase-derivative instantaneous-frequency estimate
        (fftx_freq_at_bin, fft.c:448-461), vectorized over bins [..., W/2]."""
        b = jnp.arange(phase.shape[-1], dtype=self.dtype)
        dp = phase - phase_h - b * (self.phasediff_step * step)
        over = (dp / math.pi).astype(jnp.int32)
        over = over + jnp.where(over >= 0, over & 1, -(over & 1))
        dp = dp - math.pi * over.astype(self.dtype)
        dp = dp * (self.data_size / step) / math.pi
        return self.freq_per_bin * (b + dp)
