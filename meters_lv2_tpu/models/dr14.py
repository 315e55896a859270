"""DR-14 crest-factor meter and TP+RMS meter.

Reference: src/dr14.c — per channel a Kmeterdsp (display RMS) and a
TruePeakdsp (display dBTP + DR peak source), plus the DR measurement loop
(:396-445): 3 s non-overlapping RMS windows, a silence gate, an 8000-bin
0.01 dB histogram, a top-20% RMS score, the 2nd-highest window sample-peak,
and DR = min(0, peak_db) - rms_db clamped to 1..20.

TPU design: display meters reuse the kmeter/truepeak models; the 3 s window
assembly uses the same dynamic-roll + aligned-reshape segmentation as the
R128 fragments; the top-20% score is a reversed-cumsum over the histogram
computed at read() (the histogram only changes at window boundaries, so
read-time evaluation equals the reference's event-time evaluation).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hist as hist_ops
from ..ops import segment
from .base import register
from .kmeter import KMeter, KMeterState
from .truepeak import TruePeakMeter, TruePeakMeterState

DR_HISTBINS = 8000  # -80..0 dB in 0.01 dB steps (src/dr14.c:46)


def coeff_to_db(c):
    """src/dr14.c:233-236."""
    return jnp.where(c < 1e-4, -80.0, 20.0 * jnp.log10(jnp.maximum(c, 1e-30)))


@dataclasses.dataclass(frozen=True)
class DR14State:
    km: KMeterState  # [..., C] display RMS meter
    tp: TruePeakMeterState  # [..., C] display true-peak meter
    m_dbtp: jax.Array  # [..., C] accumulated max dBTP (dr14.c:480)
    # DR measurement (dr14 mode only)
    rms_sum: jax.Array  # [..., C] open 3s window sum of squares
    peak_cur: jax.Array  # [..., C] open window sample peak
    peak_top2: jax.Array  # [..., C, 2] two highest window peaks
    scnt: jax.Array  # [...] int32 samples into open window
    num_windows: jax.Array  # [...] int32 non-silent windows counted
    hist: jax.Array  # [..., C, 8000] int32 counts (reference: uint32,
    # src/dr14.c:89)


jax.tree_util.register_dataclass(
    DR14State,
    data_fields=[
        "km", "tp", "m_dbtp", "rms_sum", "peak_cur", "peak_top2",
        "scnt", "num_windows", "hist",
    ],
    meta_fields=[],
)


@register("dr14mono")
@register("dr14stereo")
class DR14Meter:
    """DR-14 meter; nchan channels ride a trailing state batch axis."""

    dr_mode = True

    def __init__(self, fs: float, nchan: int = 2, dtype=jnp.float32):
        self.fs = float(fs)
        self.nchan = nchan
        self.win = int(round(fs * 3.0))  # n_sample_cnt (dr14.c:155)
        # the reference's per-sample loop tests `if (++scnt > slmt)` AFTER
        # accumulating (dr14.c:404-410), so each window actually spans
        # n_sample_cnt + 1 samples while the RMS normalizes by n_sample_cnt
        self.win_len = self.win + 1
        self.km = KMeter(fs, dtype)
        self.tp = TruePeakMeter(fs, dtype)
        self.dtype = dtype

    def init(self, batch_shape=()) -> DR14State:
        C = self.nchan
        f = lambda *s: jnp.zeros((*batch_shape, *s), self.dtype)
        return DR14State(
            km=self.km.init((*batch_shape, C)),
            tp=self.tp.init((*batch_shape, C)),
            m_dbtp=f(C),
            rms_sum=f(C),
            peak_cur=f(C),
            peak_top2=f(C, 2),
            scnt=jnp.zeros(batch_shape, jnp.int32),
            num_windows=jnp.zeros(batch_shape, jnp.int32),
            hist=jnp.zeros((*batch_shape, C, DR_HISTBINS), jnp.int32),
        )

    def update(self, state: DR14State, x: jax.Array) -> DR14State:
        """x: [..., C, T]."""
        *batch, C, T = x.shape
        assert C == self.nchan
        km = self.km.update(state.km, x)
        tp = self.tp.update(state.tp, x)
        if not self.dr_mode:
            return dataclasses.replace(state, km=km, tp=tp)

        win_len = self.win_len  # n_sample_cnt + 1 samples per window
        n_slots = T // win_len + 2
        sq = jnp.square(x)
        off_bc = jnp.broadcast_to(state.scnt[..., None], (*batch, C))
        seg_sum = segment.shifted_segments(sq, off_bc, win_len, n_slots, "sum")
        # reference tracks peak_cur = MAX(peak_cur, v) of the SIGNED sample
        # (dr14.c:404) — positive peaks only, floor 0 (the 'max' reduce's
        # identity); the MAX macro's comparison skips NaN samples, so they
        # map to the identity instead of poisoning the window peak
        xpk = jnp.where(jnp.isnan(x), 0.0, x)
        seg_peak = segment.shifted_segments(xpk, off_bc, win_len, n_slots, "max")
        seg_sum = seg_sum.at[..., 0].add(state.rms_sum)

        ncomp = (state.scnt + T) // win_len  # completed windows
        return self._dr_epilogue(
            state, km, tp, seg_sum, seg_peak, ncomp,
            (state.scnt + T) % win_len,
        )

    def _dr_epilogue(
        self, state, km, tp, seg_sum, seg_peak, ncomp, scnt_new
    ) -> "DR14State":
        """DR measurement from per-window sums/peaks (dr14.c:263-343).

        Split out of update() so the sequence-parallel whole-file path
        (parallel.meters_sharded.analyze_dr14) can feed GLOBAL window
        sums assembled across time shards through the identical gate /
        histogram / top-2 logic.
        seg_sum/seg_peak: [..., C, n_slots] (slot 0 already carries any
        open-window continuation); ncomp: [...] completed windows.
        """
        *batch, C, n_slots = seg_sum.shape
        slot = jnp.arange(n_slots, dtype=jnp.int32)
        validb = slot < ncomp[..., None]  # [..., n_slots]

        # silence gate across channels (dr14.c:263-276)
        thr = 1e-9 * float(self.win)
        loud = (seg_sum > thr).any(axis=-2)  # [..., n_slots] any channel
        counted = validb & loud  # [..., n_slots]

        # window RMS -> histogram bin (dr14.c:286-295); rms_sum resets at
        # every completed window, so window rms == per-slot sum
        rms = jnp.sqrt(2.0 * seg_sum / float(self.win))
        bins = (
            jnp.round(100.0 * (80.0 + coeff_to_db(rms))).astype(jnp.int32) - 1
        )
        bins = jnp.minimum(bins, DR_HISTBINS - 1)
        ok = counted[..., None, :] & (bins > 0)
        hist = state.hist + hist_ops.bincount(
            jnp.where(ok, bins, -1), DR_HISTBINS, chunk=n_slots,
            dtype=jnp.int32,
        )

        # peak_cur persists through silent windows and resets only at
        # counted (non-silent) windows, where its value enters the top-2
        # (dr14.c:271-276, 329-343).  Tiny scan over the few slots.
        def slot_step(carry, inp):
            pk, top2 = carry
            spk, cnt = inp  # [..., C], [...]
            pk = jnp.maximum(pk, spk)
            cand = jnp.concatenate([top2, pk[..., None]], -1)
            new_top2 = jax.lax.top_k(cand, 2)[0]
            cntc = cnt[..., None]
            top2 = jnp.where(cntc[..., None], new_top2, top2)
            pk = jnp.where(cntc, 0.0, pk)
            return (pk, top2), None

        spk_t = jnp.moveaxis(seg_peak, -1, 0)  # [n_slots, ..., C]
        cnt_t = jnp.moveaxis(counted, -1, 0)  # [n_slots, ...]
        (peak_cur, top2), _ = jax.lax.scan(
            slot_step, (state.peak_cur, state.peak_top2), (spk_t, cnt_t)
        )

        pick = lambda a: jnp.take_along_axis(
            a, jnp.broadcast_to(ncomp[..., None, None], (*batch, C, 1)), -1
        )[..., 0]
        rms_sum = pick(seg_sum)
        return DR14State(
            km=km, tp=tp,
            m_dbtp=state.m_dbtp,
            rms_sum=rms_sum,
            peak_cur=peak_cur,
            peak_top2=top2,
            scnt=scnt_new,
            num_windows=state.num_windows + counted.sum(-1, dtype=jnp.int32),
            hist=hist,
        )

    def read(self, state: DR14State):
        """Port readouts (dr14.c:447-516)."""
        km_out, km_st = self.km.read(state.km)
        tp_out, tp_st = self.tp.read(state.tp)
        m_dbtp = jnp.maximum(state.m_dbtp, tp_out["peak"])

        nf = state.num_windows
        m_cut = jnp.maximum(1, jnp.floor(nf / 5.0)).astype(jnp.int32)
        # include whole bins from the top until count reaches m_cut
        counts = state.hist[..., 1:]  # bin 0 excluded (b > 0 loop bound)
        rev = jnp.flip(counts, -1)
        cum_above = jnp.concatenate(
            [jnp.zeros_like(rev[..., :1]), jnp.cumsum(rev, -1)[..., :-1]], -1
        )
        inc = cum_above < m_cut[..., None, None]
        b_idx = jnp.arange(DR_HISTBINS - 1, 0, -1, dtype=jnp.float32)
        cd = jnp.power(10.0, 0.05 * (b_idx - DR_HISTBINS + 1) / 100.0)
        revf = rev.astype(cd.dtype)
        score = jnp.sum(jnp.where(inc, revf * cd * cd, 0.0), -1)
        n_cut = jnp.sum(jnp.where(inc, revf, 0.0), -1)
        rms_db = jnp.where(
            (n_cut > 0) & (nf[..., None] > 2),
            coeff_to_db(jnp.sqrt(score / jnp.maximum(n_cut, 1.0))),
            -81.0,
        )
        peak_db = jnp.where(
            nf[..., None] > 2, coeff_to_db(state.peak_top2[..., 1]), -81.0
        )
        both = (rms_db > -80.0) & (peak_db > -80.0)
        dr_raw = jnp.minimum(0.0, peak_db) - rms_db
        dr = jnp.where(both, jnp.clip(dr_raw, 1.0, 20.0), 21.0)
        nvalid = both.sum(-1)
        dr_total = jnp.where(
            nvalid > 0,
            jnp.clip(
                jnp.where(both, dr_raw, 0.0).sum(-1) / jnp.maximum(nvalid, 1),
                1.0, 20.0,
            ),
            21.0,
        )
        out = {
            "v_rms": coeff_to_db(km_out["rms"]),
            "v_peak": coeff_to_db(tp_out["level"]),
            "m_peak": coeff_to_db(m_dbtp),
            "m_rms": rms_db,
            "dr": dr,
            "dr_total": dr_total,
            "block_count": 3.0 * state.num_windows,
        }
        return out, dataclasses.replace(
            state, km=km_st, tp=tp_st, m_dbtp=m_dbtp
        )

    def reset(self, state: DR14State) -> DR14State:
        return self.init(state.scnt.shape)


@register("TPnRMSmono")
@register("TPnRMSstereo")
class TPnRMSMeter(DR14Meter):
    """dBTP + RMS only (dr14.c dr_operation_mode=false)."""

    dr_mode = False

    def read(self, state: DR14State):
        km_out, km_st = self.km.read(state.km)
        tp_out, tp_st = self.tp.read(state.tp)
        m_dbtp = jnp.maximum(state.m_dbtp, tp_out["peak"])
        out = {
            "v_rms": coeff_to_db(km_out["rms"]),
            "v_peak": coeff_to_db(tp_out["level"]),
            "m_peak": coeff_to_db(m_dbtp),
            "m_rms": coeff_to_db(km_out["peak"]),
        }
        return out, dataclasses.replace(state, km=km_st, tp=tp_st, m_dbtp=m_dbtp)
