"""30-band 1/3-octave spectrum analyzer (IEC 61260).

Reference: src/spectrumlv2.c (plugin), src/spectr.c (filter design).
Per band: a 6-stage band-pass biquad cascade; per sample the squared band
output feeds a one-pole display smoother (omega = 1 - e^(-2π·speed/rate))
with a running peak-hold; readout is 20·log10(sqrt(2·val)) floored at -100
(spectrumlv2.c:210-248).

TPU design: the 30 cascades are a *banked* 12-state LTI (ops.lti
BankedLTISystem) — all bands advance together as batched MXU GEMMs.  The
smoother is another (scalar) blocked LTI with the band axis as batch.
Coefficients are designed in float64 on the host (ops.design.bandpass_design
mirrors spectr.c:89-206 bit-for-bit in double precision).
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp

from ..ops import design, lti, pallas_spectrum
from .base import register

N_BANDS = 30


@dataclasses.dataclass(frozen=True)
class SpectrumState:
    zf: jax.Array  # [..., 30, 12] filter bank state
    val: jax.Array  # [..., 30] smoothed band power
    peak: jax.Array  # [..., 30] peak-hold of smoothed power
    omega: jax.Array  # [] display-smoother coefficient (runtime-mutable,
    # like the reference's UI speed port, spectrumlv2.c:161-177)


jax.tree_util.register_dataclass(
    SpectrumState, data_fields=["zf", "val", "peak", "omega"], meta_fields=[]
)


@register("spectr30mono")
@register("spectr30stereo")
class SpectrumAnalyzer:
    """update() takes mono blocks [..., T] or stereo [..., 2, T] (averaged,
    spectrumlv2.c:195-201)."""

    def __init__(self, fs: float, speed: float = 1.0, dtype=jnp.float32):
        self.fs = float(fs)
        systems = []
        for f_m, bw in design.spectrum_band_frequencies(N_BANDS):
            stages = design.bandpass_design(fs, f_m, bw, order=6)
            # cascade of balanced per-stage 2x2 modal sections: float32-
            # safe for the high-Q low bands (the reference runs these
            # biquads in double, spectr.c:63-66; direct forms lose
            # ~0.1 dB in f32), and the block lower-triangular A with
            # exact 2x2 diagonal blocks lets the fused kernel run the
            # state chain as exact-f32 VPU lane FMAs (ops/pallas_spectrum)
            systems.append(design.cascade_modal_state_space(stages))
        self.bank = lti.BankedLTISystem(systems, dtype)
        self.speed = min(max(float(speed), 0.01), 15.0)
        self.omega = self._omega(self.speed)
        self.dtype = dtype

    def _omega(self, speed):
        return 1.0 - math.exp(-2.0 * math.pi * speed / self.fs)

    def set_speed(self, state: SpectrumState, speed) -> SpectrumState:
        """Runtime speed change (UI speed port, spectrumlv2.c:161-177) —
        a pure state update: no recompilation, speed may be traced."""
        v = jnp.clip(jnp.asarray(speed, self.dtype), 0.01, 15.0)
        omega = 1.0 - jnp.exp(-2.0 * math.pi * v / self.fs)
        return dataclasses.replace(
            state, omega=jnp.asarray(omega, self.dtype)
        )

    def init(self, batch_shape=()) -> SpectrumState:
        return SpectrumState(
            zf=self.bank.init(batch_shape),
            val=jnp.zeros((*batch_shape, N_BANDS), self.dtype),
            peak=jnp.zeros((*batch_shape, N_BANDS), self.dtype),
            omega=jnp.asarray(self.omega, self.dtype),
        )

    @property
    def _fused_mode(self) -> str:
        return os.environ.get("METERS_TPU_SPECTRUM_FUSED", "auto")

    def _use_fused(self, T: int) -> bool:
        """Fused Pallas core (ops/pallas_spectrum): auto on TPU for blocks
        of >= 128 samples; the kernel covers the 128-aligned bulk and any
        remainder chains through the XLA path, as EbuR128Meter does."""
        mode = self._fused_mode
        if mode == "0" or T < 128 or self.dtype != jnp.float32:
            return False
        if mode in ("1", "interpret"):
            return True
        return pallas_spectrum.available()

    def _xla_core(self, x, zf, val0, omega):
        """Unfused path: returns (val, block_peak, zf) for input x."""
        v, zf = self.bank.apply(x, zf)  # [..., 30, T]
        sq = jnp.square(v)
        vs, val = lti.one_pole_apply_traced(omega, sq, val0[..., None])
        return val[..., 0], jnp.max(vs, axis=-1), zf

    def update(self, state: SpectrumState, x: jax.Array, stereo: bool = False) -> SpectrumState:
        if stereo:
            x = 0.5 * (x[..., 0, :] + x[..., 1, :])
        *batch, T = x.shape
        if self._use_fused(T):
            Tm = (T // 128) * 128
            val, bp, zf = pallas_spectrum.fused_core(
                x[..., :Tm].reshape(-1, Tm),
                state.zf.reshape(-1, N_BANDS, self.bank.d),
                state.val.reshape(-1, N_BANDS),
                state.omega,
                self.bank.op(128),
                interpret=self._fused_mode == "interpret",
            )
            val = val.reshape(*batch, N_BANDS)
            bp = bp.reshape(*batch, N_BANDS)
            zf = zf.reshape(*batch, N_BANDS, self.bank.d)
            if Tm < T:  # non-128-aligned tail: XLA path, chained state
                val, bp2, zf = self._xla_core(x[..., Tm:], zf, val, state.omega)
                bp = jnp.maximum(bp, bp2)
        else:
            val, bp, zf = self._xla_core(x, state.zf, state.val, state.omega)
        # peak-hold tracks the smoothed value maximum (spectrumlv2.c:224)
        peak = jnp.maximum(state.peak, bp)
        # non-finite flush + denormal guard (spectrumlv2.c:231-236)
        zf = jnp.where(jnp.isfinite(zf), zf, 0.0)
        val = jnp.where(jnp.isfinite(val), val, 0.0) + 1e-20
        peak = jnp.where(jnp.isfinite(peak), peak, 0.0)
        return SpectrumState(zf=zf, val=val, peak=peak, omega=state.omega)

    def read(self, state: SpectrumState):
        """(bands_db[30], peaks_db[30]) per spectrumlv2.c:240-248."""

        def to_db(p):
            vs = jnp.sqrt(2.0 * p)
            return jnp.where(vs > 1e-5, 20.0 * jnp.log10(jnp.maximum(vs, 1e-30)), -100.0)

        return {"bands": to_db(state.val), "peaks": to_db(state.peak)}, state

    def reset_peaks(self, state: SpectrumState) -> SpectrumState:
        return dataclasses.replace(state, peak=jnp.zeros_like(state.peak))
