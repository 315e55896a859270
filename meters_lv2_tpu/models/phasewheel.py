"""Phase wheel: per-bin inter-channel phase vs level at ~25 fps.

Reference: src/xfer.c (plugin side ships raw audio + Stcorrdsp) and
gui/phasewheel.c:1307-1342 (process_audio): two synchronized STFTs
(8192-point Hann), per bin Δφ = φR − φL and level = max(PL, PR) where both
powers exceed a threshold; display peak smoothed by 0.04/frame; a stereo
correlation strip from Stcorrdsp.

TPU design: both channels' frames go through one batched rfft
(ops.fft.STFT); the per-bin math is elementwise over [frames, bins];
correlation reuses models.cor.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import fft as fft_ops
from ..ops import pallas_stft
from .base import register
from .cor import CorrelationMeter, CorState


def _fused_mode(stft: fft_ops.STFT, T: int) -> tuple[bool, bool]:
    """(use_fused, interpret) for the Pallas analyzer kernel.

    METERS_TPU_STFT_FUSED: '0' off, '1' force, 'interpret' force in
    interpreter mode (CPU tests), default 'auto' = on TPU when the
    geometry fits (hop % 128 == 0 — 48/96 kHz; 44.1 kHz falls back to
    the XLA path)."""
    mode = pallas_stft.mode_env()
    if mode == "0" or not pallas_stft.usable(stft.window_size, stft.hop, T):
        return False, False
    if mode == "interpret":
        return True, True
    if mode == "1" or (mode == "auto" and pallas_stft.available()):
        return True, False
    return False, False


@dataclasses.dataclass(frozen=True)
class PhaseWheelState:
    stft: fft_ops.STFTState  # batched over [..., 2] channels
    peak: jax.Array  # [...] smoothed display peak (power)
    cor: CorState


jax.tree_util.register_dataclass(
    PhaseWheelState, data_fields=["stft", "peak", "cor"], meta_fields=[]
)


@register("phasewheel")
class PhaseWheel:
    def __init__(
        self,
        fs: float,
        bins: int = 4096,  # data_size; window = 2*bins (phasewheel.c:178-197)
        fps: float = 25.0,
        db_thresh_db: float = -60.0,
        dtype=jnp.float32,
    ):
        self.fs = float(fs)
        self.stft = fft_ops.STFT(fs, 2 * bins, fps, "hann", dtype)
        self.bins = bins
        self.db_thresh = 10.0 ** (db_thresh_db / 10.0)  # power threshold
        self.cor = CorrelationMeter(fs, dtype=dtype)
        self.dtype = dtype

    def init(self, batch_shape=()) -> PhaseWheelState:
        return PhaseWheelState(
            stft=self.stft.init((*batch_shape, 2)),
            peak=jnp.zeros(batch_shape, self.dtype),
            cor=self.cor.init(batch_shape),
        )

    def process(self, state: PhaseWheelState, lr: jax.Array):
        """lr: [..., 2, T], T % hop == 0.

        Returns ({'phase','level','peak','correlation'}, state): phase/level
        are [..., F, bins] per analysis frame (level in power, -100 marker
        below threshold like phasewheel.c:1317-1323)."""
        T = lr.shape[-1]
        use_fused, interp = _fused_mode(self.stft, T)
        D = self.stft.data_size
        import os as _os

        # default ON: measured 25.5k vs 21.1k x at B=256 on-chip (round 4
        # A/B, docs/BENCHMARKS.md) with exact level parity vs the raw path
        inkernel = _os.environ.get("METERS_TPU_PW_KERNEL_ANALYSIS", "1") == "1"
        if use_fused:
            W = self.stft.window_size
            ext = jnp.concatenate([state.stft.tail, lr], axis=-1)
            # phase_h is carried unchanged (nothing downstream of the
            # wheel consumes freq_at_bin; matches compute_phase=False)
            stft_st = fft_ops.STFTState(
                tail=ext[..., -W:], phase_h=state.stft.phase_h
            )
            if inkernel:
                # fully-fused variant: power/atan2/thresholds run INSIDE
                # the kernel ('phasewheel' mode — halves the analyzer's
                # HBM traffic: dphi+level out instead of 2x re/im).
                # Measured against the raw+XLA default in
                # docs/BENCHMARKS.md round 4.
                dphi, level = pallas_stft.analyzer_frames(
                    ext, self.stft.win, self.stft.hop, "phasewheel",
                    self.db_thresh, interpret=interp,
                )
            else:
                # fused Pallas STFT emits raw per-channel (re, im); the
                # analysis below runs as ONE fused XLA elementwise pass
                # (in-kernel atan2 was 2.4x slower on the PRE-operator-
                # fusion kernel; the fully-fused variant above
                # re-measures it)
                re, im = pallas_stft.analyzer_frames(
                    ext, self.stft.win, self.stft.hop, "raw",
                    self.db_thresh, interpret=interp,
                )
                lre, rre = re[..., 0, :, :], re[..., 1, :, :]
                lim, rim = im[..., 0, :, :], im[..., 1, :, :]
                pl = lre * lre + lim * lim
                pr = rre * rre + rim * rim
                phl = jnp.arctan2(lim, lre)
                phr = jnp.arctan2(rim, rre)
                # ft_analyze boundary bins (fft.c:166-178)
                pl = pl.at[..., D - 1].set(0.0)
                pr = pr.at[..., D - 1].set(0.0)
                phl = phl.at[..., 0].set(0.0).at[..., D - 1].set(0.0)
                phr = phr.at[..., 0].set(0.0).at[..., D - 1].set(0.0)
        else:
            power, phase, stft_st = self.stft.update(state.stft, lr)
            pl, pr = power[..., 0, :, :], power[..., 1, :, :]
            phl, phr = phase[..., 0, :, :], phase[..., 1, :, :]
        if not (use_fused and inkernel):
            ok = (pl >= self.db_thresh) & (pr >= self.db_thresh)
            dphi = jnp.where(ok, phr - phl, 0.0)
            level = jnp.where(ok, jnp.maximum(pl, pr), -100.0)
        # frame-rate peak smoothing (phasewheel.c:1333-1338); level is
        # linear power (>= 0 where ok, -100 marker elsewhere), so the
        # 0-floor max equals the ok-masked max
        fpk = jnp.max(jnp.maximum(level, 0.0), -1)  # [..., F]

        def pk_step(p, f):
            p = p + 0.04 * (f - p) + 1e-15
            p = jnp.clip(jnp.where(jnp.isnan(p), 0.0, p), None, 1000.0)
            return p, p

        peak, _ = jax.lax.scan(pk_step, state.peak, jnp.moveaxis(fpk, -1, 0))

        cor_st = self.cor.update(state.cor, lr)
        corr, cor_st = self.cor.read(cor_st)
        new = PhaseWheelState(stft=stft_st, peak=peak, cor=cor_st)
        return {
            "phase": dphi,
            "level": level,
            "peak": peak,
            "correlation": corr,
        }, new


def octave_bands(phase, level, freq_per_bin, n_octaves=12):
    """Octave-band aggregation via vector-averaged phase
    (gui/phasewheel.c:609-672): band phase = atan2(Σ sin φ·w, Σ cos φ·w)
    with level weights, log-frequency bands."""
    nbins = phase.shape[-1]
    freqs = jnp.arange(nbins) * freq_per_bin
    edges = 20.0 * 2.0 ** jnp.arange(n_octaves + 1)
    band = jnp.clip(
        jnp.searchsorted(edges, jnp.maximum(freqs, 1e-3)) - 1, 0, n_octaves - 1
    )
    onehot = jax.nn.one_hot(band, n_octaves, dtype=phase.dtype)
    w = jnp.maximum(level, 0.0)
    s = jnp.einsum("...b,bo->...o", w * jnp.sin(phase), onehot)
    c = jnp.einsum("...b,bo->...o", w * jnp.cos(phase), onehot)
    lv = jnp.einsum("...b,bo->...o", w, onehot)
    return jnp.arctan2(s, c), lv


@register("stereoscope")
class Stereoscope:
    """Stereoscope: per-bin left/right position vs level.

    Reference: gui/stereoscope.c:705-741 — lr = .5 + .5(√PR − √PL)/√max,
    smoothed 0.1/frame; level smoothed 0.1/frame (+1e-20).
    """

    def __init__(self, fs: float, bins: int = 4096, fps: float = 25.0, dtype=jnp.float32):
        self.fs = float(fs)
        self.stft = fft_ops.STFT(fs, 2 * bins, fps, "hann", dtype)
        self.bins = bins
        self.dtype = dtype

    def init(self, batch_shape=()):
        return {
            "stft": self.stft.init((*batch_shape, 2)),
            "level": jnp.zeros((*batch_shape, self.bins), self.dtype),
            "lr": jnp.full((*batch_shape, self.bins), 0.5, self.dtype),
        }

    def process(self, state, lr: jax.Array):
        """lr: [..., 2, T] → ({'lr','level'} smoothed per final frame, state)."""
        T = lr.shape[-1]
        use_fused, interp = _fused_mode(self.stft, T)
        if use_fused:
            W = self.stft.window_size
            ext = jnp.concatenate([state["stft"].tail, lr], axis=-1)
            pos, tgt_lv = pallas_stft.analyzer_frames(
                ext, self.stft.win, self.stft.hop, "stereoscope", 1e-20,
                interpret=interp,
            )
            stft_st = fft_ops.STFTState(
                tail=ext[..., -W:], phase_h=state["stft"].phase_h
            )
            ok = tgt_lv > 0.0  # kernel zero-marks below-threshold bins
        else:
            power, _, stft_st = self.stft.update(
                state["stft"], lr, compute_phase=False
            )
            pl, pr = power[..., 0, :, :], power[..., 1, :, :]
            thresh = 1e-20
            lv = jnp.maximum(pl, pr)
            ok = (pl >= thresh) | (pr >= thresh)
            pos = jnp.where(
                ok,
                0.5 + 0.5 * (jnp.sqrt(pr) - jnp.sqrt(pl)) / jnp.sqrt(jnp.maximum(lv, 1e-30)),
                0.5,
            )
            tgt_lv = jnp.where(ok, lv, 0.0)

        def step(carry, inp):
            level, lrp = carry
            lv_f, pos_f, ok_f = inp
            level = level + jnp.where(ok_f, 0.1 * (lv_f - level) + 1e-20, 0.0)
            lrp = lrp + jnp.where(ok_f, 0.1 * (pos_f - lrp) + 1e-10, 0.0)
            # below-threshold bins snap (stereoscope.c:716-719)
            level = jnp.where(ok_f, level, 0.0)
            lrp = jnp.where(ok_f, lrp, 0.5)
            return (level, lrp), None

        lv_t = jnp.moveaxis(tgt_lv, -2, 0)
        pos_t = jnp.moveaxis(pos, -2, 0)
        ok_t = jnp.moveaxis(ok, -2, 0)
        (level, lrp), _ = jax.lax.scan(
            step, (state["level"], state["lr"]), (lv_t, pos_t, ok_t)
        )
        new = {"stft": stft_st, "level": level, "lr": lrp}
        return {"lr": lrp, "level": level}, new
