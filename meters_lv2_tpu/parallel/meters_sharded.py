"""Whole-file sequence-parallel analysis for the counter/ballistics meter
families (VERDICT round-4 item 4: sp beyond R128/spectrum).

R128 and the 30-band spectrum shard in `r128_sharded` / `spectrum_sharded`;
this module covers the rest of the long-file families:

  * ``analyze_truepeak`` — dBTP over a ('dp','sp') mesh: the 4x polyphase
    conv parallelizes with a 47-sample halo (exactly like the R128 true
    peak); the nonlinear display ballistics hand state across shards
    through an exact sequential device chain (see ``ballistics_chain_sp``
    for why no O(1) handoff exists).
  * ``analyze_dr14`` / ``analyze_tpnrms`` — DR-14's 3 s windows tile the
    GLOBAL timeline (src/dr14.c:396-445), so per-shard partial window
    sums/peaks scatter into global slots and combine with psum/pmax; the
    gate / 8000-bin histogram / top-2 logic then runs replicated through
    the same `_dr_epilogue` the serial meter uses.
  * ``analyze_sigdist`` — histogram/counters psum; the running variance
    merges per-shard moments (Chan), or — under the
    ``reference_oor_count`` quirk — composes the per-shard affine mean
    maps across shards (the maps are entry-independent; only the fold of
    end-of-shard maps crosses devices, sigdistlv2.c:313-318).
  * ``analyze_bitmeter`` — pure integer counter / min / max merge;
    bit-exact vs a serial single update by construction.

All collectives move O(state) floats — the audio never crosses devices.
Every analyze_* matches ONE serial ``meter.update(init, x_full)`` +
``read()`` over the whole file (tests/test_meters_sharded.py asserts
== serial at sp=8 on the virtual CPU mesh).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.bitmeter import BitMeter, BitMeterState
from ..models.dr14 import DR14Meter
from ..models.sigdist import _CAP, SigDistMeter, SigDistState
from ..models.truepeak import TruePeakMeter
from ..ops import ballistics as bal
from ..ops import hist as hist_ops
from ..ops import resample, segment
from .timepar import lti_entry_state_sp


def _halo47(x, sp_axis):
    """Previous time shard's last 47 samples (zeros on shard 0) — the
    4x polyphase resampler history (truepeakdsp.cc taps)."""
    k = jax.lax.axis_index(sp_axis)
    nsp = jax.lax.axis_size(sp_axis)
    tail = x[..., -47:]
    halo = jax.lax.ppermute(
        tail, sp_axis, [(i, i + 1) for i in range(nsp - 1)]
    )
    return jnp.where(k == 0, jnp.zeros_like(halo), halo)


def ballistics_chain_sp(coeffs, t_abs, sp_axis: str):
    """EXACT cross-shard PPM/true-peak ballistics over time shards.

    Each sample step z' = max(z, (1-w) z + w t) (iec2ppmdsp.cc:59-72) is
    a convex piecewise-linear state map whose piece count grows linearly
    with segment length — the 4-sample group envelope proven exact in
    tests/test_ballistics_envelope.py already needs 5 affine pieces, so
    an O(1) summary of a whole shard's map does not exist and a
    zero-state probe cannot be corrected for the true entry state (unlike
    the LTI handoff in parallel.timepar).  The chain therefore visits
    shards SEQUENTIALLY: at step i every device scans its OWN local
    series from shard i's true entry state and a psum-select broadcasts
    shard i's exit.  The scalar ballistics gain no parallel speedup
    (they are the measured serial floor of the dBTP family,
    docs/BENCHMARKS.md round 4); what the mesh buys is the MXU-heavy
    oversampling conv and the stream's memory footprint.

    t_abs: [B, L4] local rectified series (L4 % 4 == 0).
    Returns (z1, z2, m, p) — the exact whole-stream exit state, running
    display max and raw peak, replicated on every shard.
    """
    k = jax.lax.axis_index(sp_axis)
    nsp = jax.lax.axis_size(sp_axis)
    z = jnp.zeros(t_abs.shape[:-1], t_abs.dtype)

    def step(i, carry):
        out = bal._run_ballistics(coeffs, t_abs, *carry)
        pick = lambda v: jax.lax.psum(
            jnp.where(k == i, v, jnp.zeros_like(v)), sp_axis
        )
        return tuple(pick(v) for v in out)

    return jax.lax.fori_loop(0, nsp, step, (z, z, z, z))


def _truepeak_core(meter: TruePeakMeter, x, sp_axis: str):
    """Shared dBTP core: halo'd 4x oversample + chained ballistics.
    x: [..., L]; returns (m [.. ] g-scaled display max, p raw peak)."""
    up, _ = resample.upsample4(x, _halo47(x, sp_axis))
    shape = up.shape
    up2 = jnp.abs(up).reshape(-1, shape[-1])
    z1, z2, m, p = ballistics_chain_sp(meter.coeffs, up2, sp_axis)
    m = m * jnp.float32(meter.coeffs.g)
    return m.reshape(shape[:-1]), p.reshape(shape[:-1])


def _km_sp(km, x, sp_axis: str):
    """K-meter display over time shards: LTI smoother state handoff
    (parallel.timepar) + pmax block peak; finalize replicated.
    x: [..., L]; returns (z_final [..., 2], tmax [...])."""
    nsp = jax.lax.axis_size(sp_axis)
    sq = jnp.square(x)
    t = jnp.max(jnp.where(jnp.isnan(sq), 0.0, sq), axis=-1)
    t = jax.lax.pmax(t, sp_axis)
    u = sq.reshape(*sq.shape[:-1], sq.shape[-1] // 4, 4)
    s0 = jnp.zeros((*sq.shape[:-1], 2), x.dtype)
    s_in = lti_entry_state_sp(km.sys, u, s0, sp_axis)
    _, z = km.sys.apply(u, s_in)
    z_fin = jax.lax.all_gather(z, sp_axis)[nsp - 1]
    return z_fin, t


# ---------------------------------------------------------------------------
# dBTP
# ---------------------------------------------------------------------------


def analyze_truepeak(meter: TruePeakMeter, x, mesh: Mesh):
    """Sharded whole-file dBTP.  x: [B, T], B % dp == 0, (T / sp) % 4 == 0.
    Returns {'level', 'peak'} matching a serial single update + read."""
    from jax import shard_map

    def body(xs):
        m, p = _truepeak_core(meter, xs, "sp")
        return {"level": m, "peak": p}

    return jax.jit(
        shard_map(
            body, mesh=mesh, in_specs=P("dp", "sp"), out_specs=P("dp"),
            check_vma=False,
        )
    )(x)


# ---------------------------------------------------------------------------
# DR-14 / TPnRMS
# ---------------------------------------------------------------------------


def _dr14_shard(meter: DR14Meter, x, sp_axis: str):
    """Per-shard body; x: [B, C, L]."""
    B, C, L = x.shape
    k = jax.lax.axis_index(sp_axis)
    nsp = jax.lax.axis_size(sp_axis)
    T = L * nsp

    # display meters (km RMS needle + tp dBTP needle, dr14.c:447-480)
    km_z, km_t = _km_sp(meter.km, x, sp_axis)
    km = meter.km.finalize(meter.km.init((B, C)), km_z, km_t, T)
    tp_m, tp_p = _truepeak_core(meter.tp, x, sp_axis)
    tp0 = meter.tp.init((B, C))
    tp = dataclasses.replace(
        tp0,
        bal=dataclasses.replace(
            tp0.bal, m=tp_m, p=tp_p, res=jnp.zeros_like(tp0.bal.res)
        ),
    )
    st = meter.init((B,))
    if not meter.dr_mode:
        return dataclasses.replace(st, km=km, tp=tp)

    # global 3 s windows: the window grid tiles the WHOLE timeline, so a
    # shard's local slots scatter at global base (k*L)//W and boundary
    # windows (split across two shards) combine by psum/pmax
    W = meter.win_len
    n_loc = L // W + 2
    n_glob = T // W + 2
    off = (k * L) % W
    off_bc = jnp.broadcast_to(off, (B, C))
    sq = jnp.square(x)
    seg_sum = segment.shifted_segments(sq, off_bc, W, n_loc, "sum")
    xpk = jnp.where(jnp.isnan(x), 0.0, x)
    seg_peak = segment.shifted_segments(xpk, off_bc, W, n_loc, "max")

    base = (k * L) // W

    def scatter(seg):
        z = jnp.zeros((B, C, n_glob), seg.dtype)
        return jax.lax.dynamic_update_slice(z, seg, (0, 0, base))

    gsum = jax.lax.psum(scatter(seg_sum), sp_axis)
    gpeak = jax.lax.pmax(scatter(seg_peak), sp_axis)

    ncomp = jnp.full((B,), T // W, jnp.int32)
    return meter._dr_epilogue(
        st, km, tp, gsum, gpeak, ncomp, jnp.full((B,), T % W, jnp.int32)
    )


def analyze_dr14(meter: DR14Meter, x, mesh: Mesh):
    """Sharded whole-file DR-14 (or TPnRMS) analysis.

    x: [B, C, T]; B % dp == 0; the local slice T/sp must be % 4 == 0.
    Returns the meter.read() dict of a serial single-update run (window
    sums at shard boundaries differ only by f32 addition order).
    """
    from jax import shard_map

    assert x.shape[1] == meter.nchan, (x.shape, meter.nchan)
    body = partial(_dr14_shard, meter, sp_axis="sp")
    st = jax.jit(
        shard_map(
            lambda xs: body(xs), mesh=mesh,
            in_specs=P("dp", None, "sp"), out_specs=P("dp"),
            check_vma=False,
        )
    )(x)
    return meter.read(st)[0]


def analyze_tpnrms(meter, x, mesh: Mesh):
    """TPnRMS flavor of analyze_dr14 (dr_mode=False display meters)."""
    return analyze_dr14(meter, x, mesh)


# ---------------------------------------------------------------------------
# SigDist
# ---------------------------------------------------------------------------


def _sigdist_shard(meter: SigDistMeter, x, T: int, sp_axis: str):
    B, L = x.shape
    k = jax.lax.axis_index(sp_axis)
    nsp = jax.lax.axis_size(sp_axis)

    from ..models.sigdist import DIST_BIN, DIST_RANGE, DIST_ZERO

    bins = jnp.round(DIST_ZERO + x * DIST_RANGE).astype(jnp.int32)
    ok = (bins >= 0) & (bins < DIST_BIN)  # run gate is static-true here
    hist = hist_ops.bincount(
        jnp.where(ok, bins, -1), DIST_BIN, dtype=jnp.int32, radix=64
    )
    hist = jax.lax.psum(hist, sp_axis)
    n = jax.lax.psum(ok.sum(-1, dtype=jnp.int32), sp_axis)
    total = jax.lax.psum(jnp.where(ok, x, 0.0).sum(-1), sp_axis)

    if meter.reference_oor_count:
        # quirk chain: per-shard prefix maps with ABSOLUTE sample indices,
        # entry mean = fold of earlier shards' end-of-block maps
        time0 = jnp.full((B,), 0, jnp.int32) + k * L
        U, Bm = SigDistMeter._oor_maps(x, ok, time0)
        maps = jax.lax.all_gather(
            jnp.stack([U[..., -1], Bm[..., -1]], -1), sp_axis
        )  # [nsp, B, 2]

        def fold(i, m0):
            m1 = m0 - maps[i, :, 0] * m0 + maps[i, :, 1]
            return jnp.where(i < k, m1, m0)

        m0 = jax.lax.fori_loop(0, nsp, fold, jnp.zeros((B,), x.dtype))
        m = m0[..., None] - U * m0[..., None] + Bm
        m_prev = jnp.concatenate([m0[..., None], m[..., :-1]], -1)
        m2 = jax.lax.psum(
            jnp.where(ok, (x - m) * (x - m_prev), 0.0).sum(-1), sp_axis
        )
        mean = jax.lax.all_gather(m[..., -1], sp_axis)[nsp - 1]
    else:
        nb, mb, m2b = hist_ops.welford_block(x, ok)
        parts = jax.lax.all_gather((nb, mb, m2b), sp_axis)

        def fold(i, acc):
            nxt = hist_ops.welford_merge(
                acc, jax.tree_util.tree_map(lambda v: v[i], parts)
            )
            return nxt

        zero = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), x.dtype),
                jnp.zeros((B,), x.dtype))
        _, mean, m2 = jax.lax.fori_loop(0, nsp, fold, zero)

    return SigDistState(
        hist=hist, n=n, mean=mean, m2=m2, total=total,
        time=jnp.full((B,), T, jnp.int32),
        integrating=jnp.ones((B,), bool),
    )


def analyze_sigdist(meter: SigDistMeter, x, mesh: Mesh):
    """Sharded whole-file signal-distribution analysis.  x: [B, T] with
    T < 2^31 (the reference's acquisition cap, sigdistlv2.c:288-295).
    Returns meter.read() of a serial single-update run (hist/counters
    exact; mean/variance within f32 merge-order noise)."""
    from jax import shard_map

    T = x.shape[-1]
    assert T < _CAP, "whole-file analysis beyond the 2^31 cap"
    body = partial(_sigdist_shard, meter, T=T, sp_axis="sp")
    st = jax.jit(
        shard_map(
            lambda xs: body(xs), mesh=mesh,
            in_specs=P("dp", "sp"), out_specs=P("dp"),
            check_vma=False,
        )
    )(x)
    return meter.read(st)[0]


# ---------------------------------------------------------------------------
# BitMeter
# ---------------------------------------------------------------------------


def _bitmeter_shard(meter: BitMeter, x, sp_axis: str):
    st = meter.update(meter.init((x.shape[0],)), x)
    psum = lambda v: jax.lax.psum(v, sp_axis)
    return BitMeterState(
        hit=psum(st.hit), one=psum(st.one), dset=psum(st.dset),
        nan=psum(st.nan), inf=psum(st.inf), den=psum(st.den),
        zero=psum(st.zero), pos=psum(st.pos),
        vmin=jax.lax.pmin(st.vmin, sp_axis),
        vmax=jax.lax.pmax(st.vmax, sp_axis),
        time=psum(st.time),
        integrating=st.integrating,
    )


def analyze_bitmeter(meter: BitMeter, x, mesh: Mesh):
    """Sharded whole-file bit statistics — bit-exact integer merge.
    x: [B, T] with T < 2^31."""
    from jax import shard_map

    assert x.shape[-1] < _CAP, "beyond the 2^31 acquisition cap"
    body = partial(_bitmeter_shard, meter, sp_axis="sp")
    st = jax.jit(
        shard_map(
            lambda xs: body(xs), mesh=mesh,
            in_specs=P("dp", "sp"), out_specs=P("dp"),
            check_vma=False,
        )
    )(x)
    return meter.read(st)[0]
