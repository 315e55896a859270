"""Whole-file EBU R128 + true-peak analysis, sharded over a ('dp','sp') mesh.

The production serving shape: a batch of files sharded over data-parallel
devices AND each file's timeline sharded over sequence-parallel devices.
Per SPMD shard (shard_map):

  * K-weighting: sequence-parallel LTI (parallel.timepar) — one all_gather
    of 4-float states over 'sp'.
  * true peak: the 4x polyphase conv needs a 47-sample halo from the
    previous time shard — one ppermute; peaks combine with pmax.
  * fragment powers: local reshape-sums; the momentary/short-term windows
    need the previous shard's last 59 fragment powers — one ppermute.
  * histograms / counts: additive — psum over 'sp'.
  * max M/S: pmax over 'sp'.

All collectives move O(d + 59 + 47) floats per shard — the audio itself
never crosses devices.  Requires the local time slice to be a multiple of
the fragment size (pad files at the pipeline layer).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.ebur128 import (
    EbuR128Meter, HIST_BINS, RADAR_POINTS, _MWIN, _SWIN,
)
from ..ops import pallas_r128, resample
from .timepar import lti_apply_sp, lti_entry_state_sp


def _analyze_shard(meter: EbuR128Meter, x, sp_axis: str):
    """Per-shard body; x: [b_local, C, T_local]."""
    B, C, Tl = x.shape
    fragm = meter.fragm
    assert Tl % fragm == 0, (Tl, fragm)
    nfrag = Tl // fragm
    # the 59-fragment halo must cover the full short-term window, or
    # interior shards silently compute wrong S loudness / histogram points
    assert nfrag >= 59, (
        f"sequence-parallel shards need >= 59 fragments (~3 s) each, got "
        f"{nfrag}; use fewer 'sp' shards or pad the stream"
    )
    k = jax.lax.axis_index(sp_axis)
    nsp = jax.lax.axis_size(sp_axis)

    # ---- true peak halo: the previous shard's last 47 samples
    tail = x[..., -47:]
    halo = jax.lax.ppermute(
        tail, sp_axis, [(i, i + 1) for i in range(nsp - 1)]
    )
    halo = jnp.where(k == 0, jnp.zeros_like(halo), halo)

    # ---- K-weighting (sequence-parallel state handoff) + true peak
    s0 = jnp.zeros((B, C, 4), x.dtype)
    if meter._use_fused(Tl):
        # cross-shard entry state from the SP composition, then the local
        # pass runs the fused Pallas kernel (one HBM read of the 128-aligned
        # bulk); any remainder chains through the XLA path with the kernel's
        # exit state, exactly as EbuR128Meter.update does — 44.1 kHz shards
        # (fragm=2205, odd) are never 128-aligned
        Tm = (Tl // 128) * 128
        s_in = lti_entry_state_sp(meter.sys, x, s0, sp_axis)
        p, zr, hr, tpm = pallas_r128.fused_core(
            x[..., :Tm], s_in, halo,
            tuple(np.asarray(meter.gains, np.float32)),
            meter.sys.op(128),
            interpret=meter._fused_mode == "interpret",
        )
        if Tm < Tl:
            yt, _ = meter.sys.apply(x[..., Tm:], zr)
            pt = jnp.sum(jnp.square(yt) * meter.gains[:, None], axis=-2)
            upt, _ = resample.upsample4_absmax(x[..., Tm:], hr)
            p = jnp.concatenate([p, pt], axis=-1)
            tpm = jnp.maximum(tpm, jnp.max(upt, axis=-1))
        dbtp = jax.lax.pmax(tpm, sp_axis)
    else:
        y, _ = lti_apply_sp(meter.sys, x, s0, sp_axis)
        p = jnp.sum(jnp.square(y) * meter.gains[:, None], axis=-2)
        upmax, _ = resample.upsample4_absmax(x, halo)
        dbtp = jax.lax.pmax(jnp.max(upmax, axis=-1), sp_axis)

    # ---- fragment powers + windowed loudness with 59-fragment halo
    fp = p.reshape(B, nfrag, fragm).sum(-1) / fragm + 1e-30 / fragm
    ftail = fp[..., -59:]  # nfrag >= 59 asserted above
    fhalo = jax.lax.ppermute(
        ftail, sp_axis, [(i, i + 1) for i in range(nsp - 1)]
    )
    fhalo = jnp.where(k == 0, jnp.zeros_like(fhalo), fhalo)
    full = jnp.concatenate([fhalo, fp], axis=-1)  # [B, 59 + nfrag]

    def wsum(w):
        seq = full[..., (_SWIN - w):]
        out = jax.lax.conv_general_dilated(
            seq[:, None, :], jnp.ones((1, 1, w), seq.dtype),
            (1,), "VALID", dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGHEST,
        )
        return out[:, 0, :]

    def lufs(s, w):
        v = -0.6976 + 10.0 * jnp.log10(s / w)
        return jnp.where(jnp.isfinite(v) & (v >= -200.0), v, -200.0)

    lm = lufs(wsum(_MWIN), _MWIN)  # [B, nfrag]
    ls = lufs(wsum(_SWIN), _SWIN)

    max_m = jax.lax.pmax(jnp.max(lm, -1), sp_axis)
    max_s = jax.lax.pmax(jnp.max(ls, -1), sp_axis)

    # final M/S (the last shard's last fragment)
    loud_m = jax.lax.all_gather(lm[..., -1], sp_axis)[nsp - 1]
    loud_s = jax.lax.all_gather(ls[..., -1], sp_axis)[nsp - 1]

    # ---- histogram points at absolute fragment parity
    base = k * nfrag  # absolute index offset of local fragment 0
    slot = jnp.arange(nfrag, dtype=jnp.int32)
    ai = base + slot
    m_pt = (ai % 2) == 1
    s_pt = (ai % 10) == 9

    def scatter(vals, mask):
        # one-hot accumulation (scatter-add lowers to a while loop on TPU)
        kk = jnp.floor(10.0 * vals + 700.5).astype(jnp.int32)
        ok = mask & (kk >= 0) & jnp.isfinite(vals)
        kk = jnp.clip(kk, 0, HIST_BINS - 1)
        onehot = (
            kk[..., None] == jnp.arange(HIST_BINS, dtype=jnp.int32)
        ) & ok[..., None]
        return onehot.astype(jnp.int32).sum(-2), ok.sum(-1, dtype=jnp.int32)

    hist_m, cm = scatter(lm, m_pt)
    hist_s, cs = scatter(ls, s_pt)
    hist_m = jax.lax.psum(hist_m, sp_axis)
    hist_s = jax.lax.psum(hist_s, sp_axis)
    count_m = jax.lax.psum(cm, sp_axis)
    count_s = jax.lax.psum(cs, sp_axis)

    # ---- radar history: fragment-rate interval maxima at absolute sample
    # positions (matches the serial meter's radar for a fresh state; see
    # models/ebur128.py step 6).  A radar interval may straddle time shards,
    # so per-shard partial maxima combine with pmax over 'sp'.  Only the
    # last <=360 events survive in the ring (later events overwrite, ring
    # position = event % 360, src/ebulv2.cc:160-176).
    spd = meter.radar_spd
    T_total = Tl * jax.lax.axis_size(sp_axis)
    e_tot = max((T_total - 1) // spd, 0)  # fired events (static)
    e0 = max(0, e_tot - RADAR_POINTS)
    n_ev = e_tot - e0
    if n_ev > 0:
        a = base + jnp.arange(nfrag, dtype=jnp.int32)  # absolute frag index
        contrib = jnp.maximum((a * fragm - 1) // spd, 0)  # event fed [nfrag]
        ev = e0 + jnp.arange(n_ev, dtype=jnp.int32)
        sel = contrib[None, :] == ev[:, None]  # [n_ev, nfrag]
        vml = jnp.max(jnp.where(sel, lm[..., None, :], -jnp.inf), -1)
        vms = jnp.max(jnp.where(sel, ls[..., None, :], -jnp.inf), -1)
        vml = jax.lax.pmax(vml, sp_axis)  # [B, n_ev]
        vms = jax.lax.pmax(vms, sp_axis)
        # [n_ev, 360] event -> ring position one-hot; positions distinct
        oh = (
            jnp.arange(RADAR_POINTS, dtype=jnp.int32) == (ev % RADAR_POINTS)[:, None]
        )
        radar_m = jnp.max(jnp.where(oh[None], vml[..., None], -jnp.inf), -2)
        radar_s = jnp.max(jnp.where(oh[None], vms[..., None], -jnp.inf), -2)
    else:
        radar_m = jnp.full((B, RADAR_POINTS), -jnp.inf, lm.dtype)
        radar_s = jnp.full((B, RADAR_POINTS), -jnp.inf, ls.dtype)
    radar_pos = jnp.full((B,), e_tot % RADAR_POINTS, jnp.int32)

    return {
        # per-fragment loudness curves (LUFS-M/S time series, 20 Hz rate) —
        # the SURVEY minimum-viable-demo readout; sharded over 'sp'
        "curve_M": lm,
        "curve_S": ls,
        "loudness_M": loud_m,
        "loudness_S": loud_s,
        "max_M": max_m,
        "max_S": max_s,
        "hist_m": hist_m,
        "hist_s": hist_s,
        "count_m": count_m,
        "count_s": count_s,
        "dbtp": dbtp,
        "radar_m": radar_m,
        "radar_s": radar_s,
        "radar_pos": radar_pos,
    }


def analyze_r128(meter: EbuR128Meter, x, mesh: Mesh):
    """Sharded whole-file analysis.

    Args:
      meter: an EbuR128Meter (supplies constants).  Must use the default
        radar semantics: reference_radar (quirk-exact GUI rings) and
        runtime_radar_speed (traced radar_spd state) are serial-streaming
        features the sharded radar section does not reproduce — rejected
        here rather than silently returning different rings.
      x: [B, C, T] with B divisible by mesh 'dp' size and T by
         ('sp' size * fragment).
    Returns the same readout dict as EbuR128Meter.read (integrated / LRA
    computed from the psum'd histograms; radar at the default
    fragment-rate semantics; no radar_spd / integ_time_s keys — the
    whole-file analysis has no running-state notion of either).
    """
    from jax import shard_map

    assert x.shape[1] == meter.nchan, (x.shape, meter.nchan)
    if getattr(meter, "reference_radar", False) or getattr(
        meter, "runtime_radar_speed", False
    ):
        raise NotImplementedError(
            "analyze_r128 supports only the default radar semantics; "
            "use serial streaming (meter.update) for reference_radar / "
            "runtime_radar_speed"
        )
    body = partial(_analyze_shard, meter, sp_axis="sp")
    out = jax.jit(
        shard_map(
            lambda xs: body(xs),
            mesh=mesh,
            in_specs=P("dp", None, "sp"),
            out_specs={
                "curve_M": P("dp", "sp"),
                "curve_S": P("dp", "sp"),
                "loudness_M": P("dp"),
                "loudness_S": P("dp"),
                "max_M": P("dp"),
                "max_S": P("dp"),
                "hist_m": P("dp", None),
                "hist_s": P("dp", None),
                "count_m": P("dp"),
                "count_s": P("dp"),
                "dbtp": P("dp"),
                "radar_m": P("dp", None),
                "radar_s": P("dp", None),
                "radar_pos": P("dp"),
            },
            check_vma=False,
        )
    )(x)

    # gated statistics from the combined histograms (host-visible jnp)
    class _S:  # adapter for the meter's calc_* methods
        hist_m = out["hist_m"]
        hist_s = out["hist_s"]
        count_m = out["count_m"]
        count_s = out["count_s"]

    li, ith = meter.calc_integ(_S)
    v0, v1, rth = meter.calc_range(_S)
    out.update(
        integrated=li, integ_thr=ith, range_min=v0, range_max=v1,
        range_thr=rth, lra=v1 - v0,
    )
    return out
