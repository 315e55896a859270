"""EBU R128 / ITU-R BS.1770 loudness meter with true peak.

Reference: ebumeter/ebu_r128_proc.cc (measurement core), src/ebulv2.cc
(plugin semantics: dBTP via TruePeakdsp::process_max, radar history,
integration start/pause/reset).

TPU-first design — the reference's per-sample/per-fragment loops become:

  * K-weighting filter (ebu_r128_proc.cc:319-328): 4-state LTI recurrence
    evaluated as blocked MXU matmuls (ops.lti), vmapped over channels and
    batch.
  * 1/20 s fragment powers (:207-248): masked segment-sum over the block —
    no 64-slot ring buffer; a 59-fragment history window is carried so
    momentary (8 frags / 400 ms) and short-term (60 frags / 3 s) windows
    are sliding sums over [history ++ new fragments].
  * Loudness histograms (751 bins, 0.1 LU, :62-79): vectorized masked
    scatter-add; M points every 2nd fragment, S points every 10th
    (:229-242), phase carried across blocks (div1/div2).
  * Gated integrated loudness (−10 dB relative gate, ≥50 points,
    :105-125) and LRA (−20 dB gate, 10%..95%, ≥20 points, :128-150):
    computed in read() from the histograms with cumsums/searchsorted.
    (The reference recomputes them every 500 ms from the same histograms —
    identical values at S-point boundaries, fresher in between.)
  * dBTP: 4x polyphase oversample (ops.resample) → |max|, matching
    TruePeakdsp::process_max (truepeakdsp.cc:109-131) as used by
    src/ebulv2.cc:344-347.

Everything is vectorized over an arbitrary leading batch shape; update()
accepts any block length (partial fragments are carried).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import os

from ..ops import design, lti, resample, segment
from ..ops import pallas_r128
from .base import register

HIST_BINS = 751
_MWIN = 8  # momentary window, fragments (400 ms)
_SWIN = 60  # short-term window, fragments (3 s)
_NRADIX = 1 << 30  # sample-counter split radix (two int32 words)


@dataclasses.dataclass(frozen=True)
class EbuR128State:
    # filter + resampler
    z: jax.Array  # [..., C, 4] K-weighting filter state
    tp_hist: jax.Array  # [..., C, 47] true-peak resampler history
    # fragment assembly
    frpwr: jax.Array  # [...] partial fragment power (incl. 1e-30 seed)
    off: jax.Array  # [...] int32 samples already in current fragment
    fhist: jax.Array  # [..., 59] previous fragment powers (newest last)
    # loudness readouts
    loud_m: jax.Array  # [...]
    loud_s: jax.Array
    max_m: jax.Array
    max_s: jax.Array
    # gating histograms
    hist_m: jax.Array  # [..., 751] int32
    hist_s: jax.Array
    count_m: jax.Array  # [...] int32
    count_s: jax.Array
    div1: jax.Array  # [...] int32, M-point phase (mod 2)
    div2: jax.Array  # [...] int32, S-point phase (mod 10)
    # true peak + bookkeeping
    dbtp: jax.Array  # [...] running oversampled |peak|
    integrating: jax.Array  # [...] bool
    # integration sample count, only advanced while integrating
    # (src/ebulv2.cc:394-396); split into two int32 words at radix 2^30 so
    # multi-day streams stay exact without jax_enable_x64
    n_lo: jax.Array  # [...] int32 low word (< 2^30)
    n_hi: jax.Array  # [...] int32 high word
    # radar history (src/ebulv2.cc:160-176, 390-421): 360-point rings
    radar_m: jax.Array  # [..., 360]
    radar_s: jax.Array  # [..., 360]
    radar_pos: jax.Array  # [...] int32 ring write position
    radar_cur_m: jax.Array  # [...] running max since last radar point
    radar_cur_s: jax.Array  # [...]
    radar_spd_cur: jax.Array  # [...] int32 samples into current interval
    radar_spd: jax.Array  # [...] int32 samples per radar point — runtime-
    # mutable like CTL_RADARTIME (src/ebulv2.cc:75-78,312-318); the ring and
    # the interval counter carry over a change, as in the reference
    # 500 ms-cadence snapshot: the gating M-histogram/count as of the most
    # recent S-point, where the reference recomputes its cached I/LRA
    # (ebu_r128_proc.cc:240-243); read(cadence_500ms=True) reproduces the
    # reference's between-recompute cached values exactly.  (hist_s needs no
    # snapshot: it only changes AT S-points.)  Only tracked when the meter
    # is constructed with track_cadence=True.
    hist_m_snap: jax.Array  # [..., 751] int32 (or [..., 1] placeholder)
    count_m_snap: jax.Array  # [...] int32


jax.tree_util.register_dataclass(
    EbuR128State,
    data_fields=[
        "z", "tp_hist", "frpwr", "off", "fhist", "loud_m", "loud_s",
        "max_m", "max_s", "hist_m", "hist_s", "count_m", "count_s",
        "div1", "div2", "dbtp", "integrating", "n_lo", "n_hi",
        "radar_m", "radar_s", "radar_pos", "radar_cur_m", "radar_cur_s",
        "radar_spd_cur", "radar_spd", "hist_m_snap", "count_m_snap",
    ],
    meta_fields=[],
)

RADAR_POINTS = 360


@register("EBUr128")
class EbuR128Meter:
    """Full R128 meter; channels C in {1, 2, 5} (ebu_r128_proc.h:26)."""

    def __init__(
        self, fs: float, nchan: int = 2, radar_seconds: float = 120.0,
        runtime_radar_speed: bool = False, track_cadence: bool = False,
        reference_radar: bool = False, dtype=jnp.float32,
    ):
        assert 1 <= nchan <= 5
        self.fs = float(fs)
        self.nchan = nchan
        self.fragm = int(fs) // 20
        # radar interval (ebu_set_radarspeed, src/ebulv2.cc:75-78).  The
        # extra fragm floor (beyond the reference's 4096) keeps the
        # interval >= one loudness sample point: the fragment-rate radar
        # fires at most once per fragment, which the vectorized event
        # mapping in update() relies on (only reachable at fs > 81.9 kHz
        # with radar_seconds < 18 — below the GUI's own 30 s minimum)
        self.radar_spd = max(
            int(round(radar_seconds * fs / RADAR_POINTS)), 4096, self.fragm
        )
        # runtime_radar_speed=True makes the interval a traced state field
        # (set_radar_speed mid-stream, CTL_RADARTIME); False compiles it as
        # a constant so XLA strength-reduces the interval division
        self.runtime_radar_speed = bool(runtime_radar_speed)
        # reference_radar=True reproduces src/ebulv2.cc:390-421 VERBATIM so
        # rings can be golden-diffed: loudness sampled once per update()
        # call (block rate, not fragment rate), at most one ring point per
        # call, and the reference's radarSC carry gated on lm instead of ls
        # (the apparent quirk at :392).  Default False keeps the improved
        # fragment-rate semantics (docs/PARITY.md "deliberate deviations").
        self.reference_radar = bool(reference_radar)
        # track_cadence=True carries an extra M-histogram snapshot so
        # read(cadence_500ms=True) matches the reference's 500 ms cached
        # I/LRA between recompute points (one extra one-hot reduce/update)
        self.track_cadence = bool(track_cadence)
        self.sys = lti.LTISystem(*design.k_weighting_state_space(fs), dtype)
        if nchan == 1:
            gains = np.array([2.0])
        else:
            gains = design.R128_CHAN_GAIN[:nchan]
        self.gains = jnp.asarray(gains, dtype)
        self.dtype = dtype

    # -- lifecycle ----------------------------------------------------------

    def init(self, batch_shape=()) -> EbuR128State:
        f = lambda *s: jnp.zeros((*batch_shape, *s), self.dtype)
        i = lambda: jnp.zeros(batch_shape, jnp.int32)
        neg = jnp.full(batch_shape, -200.0, self.dtype)
        return EbuR128State(
            z=f(self.nchan, 4),
            tp_hist=f(self.nchan, 47),
            frpwr=jnp.full(batch_shape, 1e-30, self.dtype),
            off=i(),
            fhist=f(59),
            loud_m=neg,
            loud_s=neg,
            max_m=neg,
            max_s=neg,
            hist_m=jnp.zeros((*batch_shape, HIST_BINS), jnp.int32),
            hist_s=jnp.zeros((*batch_shape, HIST_BINS), jnp.int32),
            count_m=i(),
            count_s=i(),
            div1=i(),
            div2=i(),
            dbtp=jnp.zeros(batch_shape, self.dtype),
            integrating=jnp.ones(batch_shape, bool),
            n_lo=i(),
            n_hi=i(),
            radar_m=jnp.full((*batch_shape, RADAR_POINTS), -jnp.inf, self.dtype),
            radar_s=jnp.full((*batch_shape, RADAR_POINTS), -jnp.inf, self.dtype),
            radar_pos=i(),
            radar_cur_m=jnp.full(batch_shape, -jnp.inf, self.dtype),
            radar_cur_s=jnp.full(batch_shape, -jnp.inf, self.dtype),
            radar_spd_cur=i(),
            radar_spd=jnp.full(batch_shape, self.radar_spd, jnp.int32),
            hist_m_snap=jnp.zeros(
                (*batch_shape, HIST_BINS if self.track_cadence else 1),
                jnp.int32,
            ),
            count_m_snap=i(),
        )

    def integr_start(self, state):  # ebu_r128_proc.h integr_start/pause
        return dataclasses.replace(state, integrating=jnp.ones_like(state.integrating))

    def integr_pause(self, state):
        return dataclasses.replace(state, integrating=jnp.zeros_like(state.integrating))

    def integr_reset(self, state):
        """User-facing reset: the reference GUI RESET button runs
        ebu_reset (src/ebulv2.cc:45-60) = Ebu_r128_proc::integr_reset
        (ebu_r128_proc.cc:192-204) PLUS integration_time = 0, tp_max =
        -inf, and the radar ring cleared (radarM/S = -inf, radar_pos_cur
        = 0) — but NOT radar_spd_cur / radarMC / radarSC: the open radar
        interval and its running maxima carry across a reset, exactly as
        in the reference (only instantiate, ebulv2.cc:168-169, clears
        those)."""
        b = state.loud_m.shape
        neg = jnp.full(b, -200.0, self.dtype)
        return dataclasses.replace(
            state,
            max_m=neg, max_s=neg,
            radar_m=jnp.full_like(state.radar_m, -jnp.inf),
            radar_s=jnp.full_like(state.radar_s, -jnp.inf),
            radar_pos=jnp.zeros_like(state.radar_pos),
            hist_m=jnp.zeros_like(state.hist_m),
            hist_s=jnp.zeros_like(state.hist_s),
            count_m=jnp.zeros_like(state.count_m),
            count_s=jnp.zeros_like(state.count_s),
            div1=jnp.zeros_like(state.div1),
            div2=jnp.zeros_like(state.div2),
            hist_m_snap=jnp.zeros_like(state.hist_m_snap),
            count_m_snap=jnp.zeros_like(state.count_m_snap),
            n_lo=jnp.zeros_like(state.n_lo),
            n_hi=jnp.zeros_like(state.n_hi),
            dbtp=jnp.zeros_like(state.dbtp),
        )

    # -- processing ----------------------------------------------------------

    @property
    def _fused_mode(self) -> str:
        return os.environ.get("METERS_TPU_R128_FUSED", "auto")

    def _use_fused(self, T: int) -> bool:
        """Fused Pallas core: auto on TPU for blocks of >= 128 samples
        (the kernel covers the 128-aligned bulk; any remainder tail runs
        through the XLA path with chained state).  Smaller blocks take
        the XLA path, which is exact for any T."""
        mode = self._fused_mode
        if mode == "0" or T < 128 or self.dtype != jnp.float32:
            return False
        if mode in ("1", "interpret"):
            return True
        return pallas_r128.available()

    def update(
        self, state: EbuR128State, x: jax.Array, flat: bool = False
    ) -> EbuR128State:
        """x: [..., C, T], any T >= 1.

        With flat=True, x is [..., C*T] in channel-major layout (i.e. the
        bits of reshape(..., C*T)): producers that can lay audio out flat
        (bench.py, device-resident pipelines) skip the [B,C,T]->[B,C*T]
        physical retile the fused kernel input otherwise costs (~132 us
        at B=256 x 1 s — docs/BENCHMARKS.md round 3).  Requires a
        128-aligned T to stay flat; other shapes fall back internally.
        """
        if flat:
            *batch, CT = x.shape
            C = self.nchan
            assert CT % C == 0, (CT, C)
            T = CT // C
            if not (self._use_fused(T) and T % 128 == 0):
                x = x.reshape(*batch, C, T)
                flat = False
        else:
            *batch, C, T = x.shape
            assert C == self.nchan
        fragm = self.fragm

        # 1+2) K-weighting power and 4x-oversampled true peak.  On TPU the
        # two fuse into one Pallas kernel (ops/pallas_r128) that reads the
        # input exactly once; elsewhere (or METERS_TPU_R128_FUSED=0) they
        # run as the equivalent blocked XLA GEMMs.  Identical math either
        # way; state NaN-flush per block, as the reference does per
        # fragment (ebu_r128_proc.cc:331-334).
        def xla_core(xt, z0, hist0):
            # unfused blocked-GEMM path (exact for any T): K-weighted
            # combined power (ebu_r128_proc.cc:302-337) + fused-reduce
            # oversampled |max| (TruePeakdsp::process_max as used by
            # src/ebulv2.cc:344-347)
            yt, z1 = self.sys.apply(xt, z0)
            pt = jnp.sum(jnp.square(yt) * self.gains[:, None], axis=-2)
            upt, hist1 = resample.upsample4_absmax(xt, hist0)
            return pt, jnp.max(upt, axis=-1), z1, hist1

        if self._use_fused(T):
            Tm = (T // 128) * 128
            pr, zr, hr, tpm = pallas_r128.fused_core(
                x.reshape(-1, C * T) if flat
                else x[..., :Tm].reshape(-1, C, Tm),
                state.z.reshape(-1, C, 4),
                state.tp_hist.reshape(-1, C, 47),
                tuple(np.asarray(self.gains, np.float32)),
                self.sys.op(128),
                interpret=self._fused_mode == "interpret",
            )
            z = zr.reshape(*batch, C, 4)
            tp_hist = hr.reshape(*batch, C, 47)
            p = pr.reshape(*batch, Tm)
            dbtp = jnp.maximum(state.dbtp, tpm.reshape(*batch))
            if T > Tm:  # non-128-aligned tail: XLA path, chained state
                pt, tpm_t, z, tp_hist = xla_core(x[..., Tm:], z, tp_hist)
                p = jnp.concatenate([p, pt], axis=-1)
                dbtp = jnp.maximum(dbtp, tpm_t)
        else:
            p, tpm, z, tp_hist = xla_core(x, state.z, state.tp_hist)
            dbtp = jnp.maximum(state.dbtp, tpm)
        z = jnp.where(jnp.isfinite(z), z, 0.0)

        # 3) fragment segmentation with carried partial fragment
        # (two-level shifted segment reduce, ops/segment.py)
        off = state.off  # [...] samples already in the open fragment
        n_slots = T // fragm + 2
        seg = segment.shifted_segments(p, off, fragm, n_slots, "sum")
        seg = seg.at[..., 0].add(state.frpwr - 1e-30)  # continue open fragment
        seg = seg + 1e-30  # frpwr seed per fragment (ebu_r128_proc.cc:216)

        ncomp = (off + T) // fragm  # completed fragments this block
        slot = jnp.arange(n_slots, dtype=jnp.int32)
        valid = slot < ncomp[..., None]  # [..., n_slots]

        fp = seg / fragm  # fragment mean powers (garbage where invalid)

        # 4) sliding 8/60-fragment windows over [history ++ new], via short
        # convs (no long cumsums: avoids f32 cancellation on long files)
        full = jnp.concatenate([state.fhist, fp], axis=-1)  # [..., 59+n_slots]

        def wsum(w):  # sum of w fragments ending at each new slot s
            seq = full[..., (_SWIN - w) :]
            nb = int(np.prod(batch)) if batch else 1
            out = jax.lax.conv_general_dilated(
                seq.reshape(nb, 1, -1),
                jnp.ones((1, 1, w), seq.dtype),
                window_strides=(1,),
                padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                precision=jax.lax.Precision.HIGHEST,
            )
            return out.reshape(*batch, n_slots)

        def lufs(s, w):
            v = -0.6976 + 10.0 * jnp.log10(s / w)
            return jnp.where(jnp.isfinite(v) & (v >= -200.0), v, -200.0)

        lm = lufs(wsum(_MWIN), _MWIN)  # [..., n_slots]
        ls = lufs(wsum(_SWIN), _SWIN)

        # fragment history: last 59 entries of the valid prefix
        roll = jnp.take_along_axis(
            jnp.broadcast_to(full, (*valid.shape[:-1], 59 + n_slots)),
            ncomp[..., None] + jnp.arange(59),
            axis=-1,
        )

        any_valid = valid.any(axis=-1)
        last = jnp.maximum(ncomp - 1, 0)
        pick = lambda a: jnp.take_along_axis(a, last[..., None], -1)[..., 0]
        loud_m = jnp.where(any_valid, pick(lm), state.loud_m)
        loud_s = jnp.where(any_valid, pick(ls), state.loud_s)
        max_m = jnp.maximum(state.max_m, jnp.max(jnp.where(valid, lm, -jnp.inf), -1))
        max_s = jnp.maximum(state.max_s, jnp.max(jnp.where(valid, ls, -jnp.inf), -1))

        # 5) histogram points: M every 2nd, S every 10th completed fragment
        integ = state.integrating[..., None]
        m_pt = valid & integ & (((state.div1[..., None] + slot) % 2) == 1)
        s_pt = valid & integ & (((state.div2[..., None] + slot) % 10) == 9)

        def scatter(hist, vals, mask):
            # one-hot accumulation: XLA lowers traced-index scatter-add to a
            # sequential while loop on TPU; a masked [_, n_slots, 751]
            # reduction is pure VPU work
            k = jnp.floor(10.0 * vals + 700.5).astype(jnp.int32)
            ok = mask & (k >= 0) & jnp.isfinite(vals)
            k = jnp.clip(k, 0, HIST_BINS - 1)
            onehot = (
                k[..., None] == jnp.arange(HIST_BINS, dtype=jnp.int32)
            ) & ok[..., None]
            hist = hist + onehot.astype(jnp.int32).sum(-2)
            return hist, ok.sum(-1, dtype=jnp.int32)

        hist_m, dcm = scatter(state.hist_m, lm, m_pt)
        hist_s, dcs = scatter(state.hist_s, ls, s_pt)

        # 5b) optional 500 ms-cadence snapshot: M-histogram as of the last
        # S-point in this block (the reference recomputes cached I/LRA right
        # after adding the S point, ebu_r128_proc.cc:229-243)
        if self.track_cadence:
            any_s = jnp.any(s_pt, -1)
            ls_slot = jnp.max(
                jnp.where(s_pt, slot, -1), -1
            )  # last S-point slot (-1 if none)
            snap_mask = m_pt & (slot <= ls_slot[..., None])
            hm_new, dcm_s = scatter(state.hist_m, lm, snap_mask)
            hist_m_snap = jnp.where(
                any_s[..., None], hm_new, state.hist_m_snap
            )
            count_m_snap = jnp.where(
                any_s, state.count_m + dcm_s, state.count_m_snap
            )
        else:
            hist_m_snap = state.hist_m_snap
            count_m_snap = state.count_m_snap

        # 6) radar history
        if self.reference_radar:
            # quirk-compat mode: src/ebulv2.cc:390-421 verbatim at the
            # update()-call rate — carries updated from this call's final
            # lm/ls (incl. the radarSC lm-gate quirk at :392), then at most
            # ONE ring point stored per call when the interval elapses
            spd_flat = (
                state.radar_spd if self.runtime_radar_speed else self.radar_spd
            )
            rcm = jnp.maximum(state.radar_cur_m, loud_m)
            rcs = jnp.where(loud_m > state.radar_cur_s, loud_s,
                            state.radar_cur_s)
            spd_cur = state.radar_spd_cur + T
            fire = spd_cur > spd_flat
            oh = (
                jnp.arange(RADAR_POINTS, dtype=jnp.int32)
                == state.radar_pos[..., None]
            ) & fire[..., None]
            radar_m = jnp.where(oh, rcm[..., None], state.radar_m)
            radar_s = jnp.where(oh, rcs[..., None], state.radar_s)
            radar_pos = jnp.where(
                fire, (state.radar_pos + 1) % RADAR_POINTS, state.radar_pos
            )
            rspd = jnp.where(fire, spd_cur % spd_flat, spd_cur)
            rcm = jnp.where(fire, -jnp.inf, rcm)
            rcs = jnp.where(fire, -jnp.inf, rcs)
            return self._pack_state(
                state, z, tp_hist, seg, ncomp, off, T, fragm, roll,
                loud_m, loud_s, max_m, max_s, hist_m, hist_s, dcm, dcs,
                dbtp, radar_m, radar_s, radar_pos, rcm, rcs, rspd,
                hist_m_snap, count_m_snap,
            )

        # default mode: per-interval max of fragment-rate loudness
        # (src/ebulv2.cc:390-421; the reference samples at block rate, we
        # sample at the finer fragment rate).  Fully vectorized: the wrapped
        # interval counter is recovered from the cumulative sample count —
        # fires at fragment j iff floor((S_j - 1)/spd) increments, so fire
        # events, segmented maxes and ring writes are all masked reductions
        # (a 42-step sequential scan here cost half the update time).
        if self.runtime_radar_speed:
            spd = state.radar_spd[..., None]  # runtime-mutable interval
        else:
            spd = self.radar_spd  # compile-time constant (div -> mul/shift)
        adv = jnp.where(slot == 0, fragm - off[..., None], fragm)
        advm = jnp.where(valid, jnp.broadcast_to(adv, valid.shape), 0)
        S = state.radar_spd_cur[..., None] + jnp.cumsum(advm, -1)
        nf = jnp.maximum((S - 1) // spd, 0)  # fires up to & incl fragment j
        contrib = jnp.concatenate(
            [jnp.zeros_like(nf[..., :1]), nf[..., :-1]], -1
        )  # event id each fragment's loudness feeds
        total = nf[..., -1]  # fires this update

        ev = jnp.arange(n_slots, dtype=jnp.int32)
        sel = valid[..., None, :] & (contrib[..., None, :] == ev[:, None])
        vml = jnp.max(jnp.where(sel, lm[..., None, :], -jnp.inf), -1)
        vms = jnp.max(jnp.where(sel, ls[..., None, :], -jnp.inf), -1)
        # the carried running max feeds event 0
        vml = vml.at[..., 0].set(jnp.maximum(vml[..., 0], state.radar_cur_m))
        vms = vms.at[..., 0].set(jnp.maximum(vms[..., 0], state.radar_cur_s))

        # only the LAST RADAR_POINTS fired events write: earlier ones
        # would be overwritten by the ring wrap anyway, and masking them
        # keeps ring positions distinct (a single update spanning > 360
        # intervals would otherwise max-combine instead of last-wins)
        ev_fired = (ev < total[..., None]) & (
            ev >= total[..., None] - RADAR_POINTS
        )
        ppos = (state.radar_pos[..., None] + ev) % RADAR_POINTS
        oh = (
            jnp.arange(RADAR_POINTS, dtype=jnp.int32) == ppos[..., None]
        ) & ev_fired[..., None]  # [..., E, 360]; positions are distinct
        wrote = jnp.any(oh, -2)
        val_m = jnp.max(jnp.where(oh, vml[..., None], -jnp.inf), -2)
        val_s = jnp.max(jnp.where(oh, vms[..., None], -jnp.inf), -2)
        radar_m = jnp.where(wrote, val_m, state.radar_m)
        radar_s = jnp.where(wrote, val_s, state.radar_s)
        radar_pos = (state.radar_pos + total) % RADAR_POINTS

        # open (unfired) group becomes the new running max
        open_sel = valid & (contrib == total[..., None])
        rcm = jnp.max(jnp.where(open_sel, lm, -jnp.inf), -1)
        rcs = jnp.max(jnp.where(open_sel, ls, -jnp.inf), -1)
        keep_carry = total == 0
        rcm = jnp.maximum(rcm, jnp.where(keep_carry, state.radar_cur_m, -jnp.inf))
        rcs = jnp.maximum(rcs, jnp.where(keep_carry, state.radar_cur_s, -jnp.inf))

        off_new = (off + T) % fragm
        spd_flat = state.radar_spd if self.runtime_radar_speed else self.radar_spd
        rspd = S[..., -1] - spd_flat * total + jnp.where(
            ncomp > 0, off_new, T
        )

        return self._pack_state(
            state, z, tp_hist, seg, ncomp, off, T, fragm, roll,
            loud_m, loud_s, max_m, max_s, hist_m, hist_s, dcm, dcs,
            dbtp, radar_m, radar_s, radar_pos, rcm, rcs, rspd,
            hist_m_snap, count_m_snap,
        )

    def _pack_state(
        self, state, z, tp_hist, seg, ncomp, off, T, fragm, roll,
        loud_m, loud_s, max_m, max_s, hist_m, hist_s, dcm, dcs,
        dbtp, radar_m, radar_s, radar_pos, rcm, rcs, rspd,
        hist_m_snap, count_m_snap,
    ) -> EbuR128State:
        n_int = jnp.where(state.integrating, ncomp, 0)
        n_lo = state.n_lo + jnp.where(state.integrating, T, 0)
        return EbuR128State(
            z=z,
            tp_hist=tp_hist,
            frpwr=jnp.take_along_axis(seg, ncomp[..., None], -1)[..., 0],
            off=(off + T) % fragm,
            fhist=roll,
            loud_m=loud_m,
            loud_s=loud_s,
            max_m=max_m,
            max_s=max_s,
            hist_m=hist_m,
            hist_s=hist_s,
            count_m=state.count_m + dcm,
            count_s=state.count_s + dcs,
            div1=(state.div1 + n_int) % 2,
            div2=(state.div2 + n_int) % 10,
            dbtp=dbtp,
            integrating=state.integrating,
            n_lo=n_lo % _NRADIX,
            n_hi=state.n_hi + n_lo // _NRADIX,
            radar_m=radar_m,
            radar_s=radar_s,
            radar_pos=radar_pos,
            radar_cur_m=rcm,
            radar_cur_s=rcs,
            radar_spd_cur=rspd,
            radar_spd=state.radar_spd,
            hist_m_snap=hist_m_snap,
            count_m_snap=count_m_snap,
        )

    # -- gated statistics (ebu_r128_proc.cc:82-150) ---------------------------

    @staticmethod
    def _bin_power():
        k = jnp.arange(HIST_BINS, dtype=jnp.float32)
        return jnp.power(10.0, (k - 700.0) / 100.0)

    def _integrate_from(self, hist, kstart):
        """integrate(i): mean linear power of bins >= kstart ([..., ] kstart)."""
        bp = self._bin_power()
        mask = jnp.arange(HIST_BINS) >= kstart[..., None]
        h = jnp.where(mask, hist, 0).astype(jnp.float32)
        n = h.sum(-1)
        s = (h * bp).sum(-1)
        return s, n

    def calc_integ(self, state: EbuR128State):
        """Gated integrated loudness + threshold (calc_integ, :105-125)."""
        s0, n0 = self._integrate_from(state.hist_m, jnp.zeros_like(state.count_m))
        l0 = 10.0 * jnp.log10(s0 / jnp.maximum(n0, 1))
        th = l0 - 10.0
        k = jnp.floor(10.0 * l0 + 0.5).astype(jnp.int32) + 600
        k = jnp.clip(k, 0, HIST_BINS - 1)
        s1, n1 = self._integrate_from(state.hist_m, k)
        li = 10.0 * jnp.log10(s1 / jnp.maximum(n1, 1))
        bad = (state.count_m < 50) | (n1 == 0)
        return jnp.where(bad, -200.0, li), jnp.where(state.count_m < 50, -200.0, th)

    def calc_range(self, state: EbuR128State):
        """Loudness range 10%..95% above −20 dB gate (calc_range, :128-150)."""
        s0, n0 = self._integrate_from(state.hist_s, jnp.zeros_like(state.count_s))
        l0 = 10.0 * jnp.log10(s0 / jnp.maximum(n0, 1))
        th = l0 - 20.0
        k = jnp.floor(10.0 * l0 + 0.5).astype(jnp.int32) + 500
        k = jnp.clip(k, 0, HIST_BINS - 1)
        mask = jnp.arange(HIST_BINS) >= k[..., None]
        h = jnp.where(mask, state.hist_s, 0)
        c = jnp.cumsum(h, -1).astype(jnp.float32)
        n = c[..., -1]
        a = jnp.float32(0.10) * n
        b = jnp.float32(0.95) * n
        # i = 1 + first bin where cumsum >= a ; j = last bin where cumsum <= b
        i = jnp.sum(c < a[..., None], -1) + 1
        j = jnp.sum(c <= b[..., None], -1) - 1
        v0 = (i.astype(jnp.float32) - 701.0) / 10.0
        v1 = (j.astype(jnp.float32) - 699.0) / 10.0
        bad = state.count_s < 20
        return (
            jnp.where(bad, -200.0, v0),
            jnp.where(bad, -200.0, v1),
            jnp.where(bad, -200.0, th),
        )

    def read(self, state: EbuR128State, cadence_500ms: bool = False):
        """Full mtr_ebulevels readout (src/ebulv2.cc:466-482).

        cadence_500ms=True (requires track_cadence): I and LRA are computed
        from the histogram state as of the most recent S-point — exactly
        the reference's cached values, which it refreshes every 10th
        fragment (ebu_r128_proc.cc:240-243).  Default False computes them
        from the live histograms (same values at S-point boundaries,
        fresher in between)."""
        if cadence_500ms:
            assert self.track_cadence, (
                "construct EbuR128Meter(track_cadence=True) for 500 ms-"
                "cadence readouts"
            )
            snap = dataclasses.replace(
                state, hist_m=state.hist_m_snap, count_m=state.count_m_snap
            )
            li, ith = self.calc_integ(snap)
            v0, v1, rth = self.calc_range(snap)
        else:
            li, ith = self.calc_integ(state)
            v0, v1, rth = self.calc_range(state)
        return {
            "loudness_M": state.loud_m,
            "loudness_S": state.loud_s,
            "max_M": state.max_m,
            "max_S": state.max_s,
            "integrated": li,
            "integ_thr": ith,
            "range_min": v0,
            "range_max": v1,
            "range_thr": rth,
            "lra": v1 - v0,
            "dbtp": state.dbtp,
            "integ_time_s": self.total_samples(state) / self.fs,
            "radar_m": state.radar_m,
            "radar_s": state.radar_s,
            "radar_pos": state.radar_pos,
            "radar_spd": state.radar_spd,
        }, state

    def total_samples(self, state: EbuR128State):
        """Integrated sample count as f32 (counter itself is exact; the
        float view rounds to ~24 significant bits — ppm-level for a
        readout in seconds)."""
        return (
            state.n_hi.astype(jnp.float32) * float(_NRADIX)
            + state.n_lo.astype(jnp.float32)
        )

    def radar_reset(self, state: EbuR128State) -> EbuR128State:
        """CTL_RESETRADAR (src/ebulv2.cc:296-300)."""
        b = state.loud_m.shape
        return dataclasses.replace(
            state,
            radar_m=jnp.full((*b, RADAR_POINTS), -jnp.inf, self.dtype),
            radar_s=jnp.full((*b, RADAR_POINTS), -jnp.inf, self.dtype),
            radar_pos=jnp.zeros_like(state.radar_pos),
            radar_cur_m=jnp.full(b, -jnp.inf, self.dtype),
            radar_cur_s=jnp.full(b, -jnp.inf, self.dtype),
            radar_spd_cur=jnp.zeros_like(state.radar_spd_cur),
        )

    def set_radar_speed(self, state: EbuR128State, seconds) -> EbuR128State:
        """CTL_RADARTIME (src/ebulv2.cc:75-78,312-318): change the radar
        interval at runtime — a pure state update, no recompile; `seconds`
        may be traced.  The ring contents and the open-interval counter
        carry over unchanged, as in the reference (the GUI merely re-reads
        the ring)."""
        assert self.runtime_radar_speed, (
            "construct EbuR128Meter(runtime_radar_speed=True) for "
            "mid-stream radar speed changes"
        )
        # schema range (models/schema.py radar_seconds: 30 s .. 4 h); the
        # reference clamps only the resulting interval at >= 4096 samples
        # (ebu_set_radarspeed, src/ebulv2.cc:75-78)
        sec = jnp.clip(jnp.asarray(seconds, jnp.float32), 30.0, 14400.0)
        spd = jnp.round(sec * self.fs / RADAR_POINTS).astype(jnp.int32)
        spd = jnp.maximum(spd, max(4096, self.fragm))  # >= one fragment
        return dataclasses.replace(
            state, radar_spd=jnp.broadcast_to(spd, state.radar_spd.shape)
        )
