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
  * ``analyze_needle`` — VU (blocked-LTI state handoff, parallel.timepar)
    and the PPM family incl. BBC M-6 (exact sequential ballistics chain);
    one entry point for every needle meter (src/meters.cc:298-331).
  * ``analyze_kmeter`` / ``analyze_stcorr`` / ``analyze_surround`` — the
    K-meter smoother and the correlator lowpasses hand LTI state across
    shards; the correlators' w2 product averages are read only at END of
    file (stcorrdsp.cc:62-76), so each shard contributes one closed-form
    weighted sum scaled by its global decay (1-w2)^(L*(nsp-1-k)) into a
    psum — no second pass over the audio.

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
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.bitmeter import BitMeter, BitMeterState
from ..models.cor import CorrelationMeter, CorState
from ..models.dr14 import DR14Meter
from ..models.kmeter import KMeter
from ..models.needle import BBCMidSideMeter, BBCMSState, VUMeter, VUState
from ..models.sigdist import _CAP, SigDistMeter, SigDistState
from ..models.surround import SurroundMeter, SurroundState
from ..models.truepeak import TruePeakMeter
from ..ops import ballistics as bal
from ..ops import hist as hist_ops
from ..ops import resample, segment
from .timepar import lti_apply_sp, lti_entry_state_sp


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


# ---------------------------------------------------------------------------
# Needle meters (VU / DIN / NOR / BBC / EBU / BBC M-6)
# ---------------------------------------------------------------------------


def _vu_shard(meter: VUMeter, x, sp_axis: str):
    """VU over time shards: the 4-sample-cadence resonant lowpass is LTI,
    so shard entry states compose exactly (parallel.timepar); the needle
    max is a pmax of exact local maxima (vumeterdsp.cc:45-98)."""
    *batch, L = x.shape
    u = jnp.abs(x).reshape(*batch, L // 4, 4)
    s0 = jnp.zeros((*batch, 2), x.dtype)
    y, z = lti_apply_sp(meter.sys, u, s0, sp_axis)
    m = jax.lax.pmax(jnp.max(y[..., 0], axis=-1), sp_axis)
    # per-process()-call epilogue, once for the whole file
    # (vumeterdsp.cc:70-77)
    bad = ~jnp.isfinite(z).all(axis=-1)
    z = jnp.where(bad[..., None], 0.0, z).at[..., 1].add(1e-10)
    m = jnp.where(bad, jnp.inf, m)
    return VUState(z=z, m=m, res=jnp.zeros(tuple(batch), bool))


def _ppm_exit_state(coeffs, t_abs, sp_axis: str) -> bal.PPMState:
    """Whole-file PPM state from local rectified series via the exact
    sequential ballistics chain; the one-per-process()-call denormal
    offset applies once (iec2ppmdsp.cc:76-77)."""
    z1, z2, m, _ = ballistics_chain_sp(coeffs, t_abs, sp_axis)
    return bal.PPMState(
        z1=z1 + 1e-10, z2=z2 + 1e-10, m=m,
        res=jnp.zeros(t_abs.shape[:-1], bool),
    )


def analyze_needle(meter, x, mesh: Mesh, ref_level_db: float = -22.0,
                   s20: bool = False):
    """Sharded whole-file needle-meter reading.

    meter: VUMeter, any _PPMMeter subclass (DIN/NOR/BBC/EBU), or
    BBCMidSideMeter.  x: [B, T] (BBC M-6: [B, 2, T]); B % dp == 0 and
    (T / sp) % 4 == 0.  Returns the value(s) of a serial single
    ``update(init, x)`` + ``read(ref_level_db)`` — exact for the PPM
    family (identical per-sample recurrence from exact entry states),
    within f32 matmul-order noise for VU.
    """
    from jax import shard_map

    if isinstance(meter, BBCMidSideMeter):
        mv_m = jnp.float32(10.0 ** (0.05 * -6.0))
        mv_s = jnp.float32(10.0 ** (0.05 * (14.0 if s20 else -6.0)))

        def body(xs):
            l, r = xs[..., 0, :], xs[..., 1, :]
            return BBCMSState(
                mid=_ppm_exit_state(meter.coeffs, mv_m * jnp.abs(l + r), "sp"),
                side=_ppm_exit_state(meter.coeffs, mv_s * jnp.abs(l - r), "sp"),
            )

        spec = P("dp", None, "sp")
    elif isinstance(meter, VUMeter):
        body = partial(_vu_shard, meter, sp_axis="sp")
        spec = P("dp", "sp")
    else:  # _PPMMeter family
        body = lambda xs: _ppm_exit_state(meter.coeffs, jnp.abs(xs), "sp")
        spec = P("dp", "sp")

    st = jax.jit(
        shard_map(
            body, mesh=mesh, in_specs=spec, out_specs=P("dp"),
            check_vma=False,
        )
    )(x)
    return meter.read(st, ref_level_db)[0]


# ---------------------------------------------------------------------------
# K-meter (K12/K14/K20)
# ---------------------------------------------------------------------------


def analyze_kmeter(meter: KMeter, x, mesh: Mesh):
    """Sharded whole-file K-meter: LTI smoother handoff + pmax digital
    peak, then the per-process()-call hold/fall epilogue once with the
    global block length (kmeterdsp.cc:101-139).  x: [B, T] (channels are
    extra leading batch dims in this package); (T / sp) % 4 == 0."""
    from jax import shard_map

    T = x.shape[-1]

    def body(xs):
        z, t = _km_sp(meter, xs, "sp")
        return meter.finalize(meter.init(xs.shape[:-1]), z, t, T)

    st = jax.jit(
        shard_map(
            body, mesh=mesh, in_specs=P("dp", "sp"), out_specs=P("dp"),
            check_vma=False,
        )
    )(x)
    return meter.read(st)[0]


# ---------------------------------------------------------------------------
# Stereo correlation (COR) and surround
# ---------------------------------------------------------------------------


def _w2_shard_scales(w2: float, L: int, nsp: int):
    """f64 table of per-shard decay scales for the end-of-file w2 product
    averages: shard k's local weighted sum (cor.ema_final with zp0=0)
    enters the global value scaled by (1-w2)^(L*(nsp-1-k)) — the exact
    factorization of the serial weights w2*(1-w2)^(T-1-g) at g = k*L + t.
    Computed on host in f64 (the f32 serial weights underflow first)."""
    e = L * np.arange(nsp - 1, -1, -1, dtype=np.float64)
    return jnp.asarray(((1.0 - np.float64(w2)) ** e).astype(np.float32))


def _pair_products_sp(cor: CorrelationMeter, y, sel_a, sel_b, sp_axis: str):
    """END-of-file value of the w2 running averages of the routed pair
    products: local closed-form sums, scaled into the global timeline and
    psum-combined.  y: [..., C, L] filtered channels."""
    k = jax.lax.axis_index(sp_axis)
    nsp = jax.lax.axis_size(sp_axis)
    ya = jnp.einsum("pc,...ct->...pt", sel_a, y)
    yb = jnp.einsum("pc,...ct->...pt", sel_b, y)
    prods = jnp.stack([ya * yb, ya * ya, yb * yb], axis=-2)  # [..,P,3,L]
    acc = cor.ema_final(prods, jnp.zeros(prods.shape[:-1], y.dtype))
    scale = _w2_shard_scales(cor.w2, y.shape[-1], nsp)[k]
    return jax.lax.psum(scale * acc, sp_axis)


def analyze_stcorr(meter: CorrelationMeter, x, mesh: Mesh):
    """Sharded whole-file phase correlation.  x: [B, 2, T].  The 2 kHz
    lowpasses hand LTI state across shards; the w2 product averages
    combine closed-form (see _w2_shard_scales).  Matches a serial single
    update + read within f32 dot-order noise (stcorrdsp.cc:49-76)."""
    from jax import shard_map

    def body(xs):
        l, r = xs[..., 0, :], xs[..., 1, :]
        eps = jnp.float32(1e-20 / meter.w1)
        s0 = jnp.zeros((*l.shape[:-1], 1), xs.dtype)
        yl, zl = lti_apply_sp(meter.lp, l + eps, s0, "sp")
        yr, zr = lti_apply_sp(meter.lp, r + eps, s0, "sp")
        y = jnp.stack([yl, yr], axis=-2)  # [B, 2, L]
        # one routed pair (L, R): the generic helper returns [B, 1, 3]
        # = (zlr, zll, zrr), exactly CorState.zp's layout
        eye = jnp.eye(2, dtype=xs.dtype)
        zp = _pair_products_sp(
            meter, y, eye[0:1], eye[1:2], "sp"
        )[..., 0, :]
        # per-process()-call epilogue once (stcorrdsp.cc:65-76)
        zl = jnp.where(jnp.isfinite(zl), zl, 0.0)
        zr = jnp.where(jnp.isfinite(zr), zr, 0.0)
        zp = jnp.where(jnp.isfinite(zp), zp, 0.0) + 1e-10
        return CorState(zl=zl, zr=zr, zp=zp)

    st = jax.jit(
        shard_map(
            body, mesh=mesh, in_specs=P("dp", None, "sp"),
            out_specs=P("dp"), check_vma=False,
        )
    )(x)
    return meter.read(st)[0]


def analyze_surround(meter: SurroundMeter, x, mesh: Mesh):
    """Sharded whole-file surround analysis (surround3..8).  x: [B, C, T]
    with C == meter.nchan; (T / sp) % 4 == 0.  Per-channel K-meters and
    correlator lowpasses hand LTI state across shards; routed pair
    averages combine closed-form; the K hold/fall epilogue runs once with
    the global length (surmeter.c:115-128)."""
    from jax import shard_map

    assert x.shape[-2] == meter.nchan, (x.shape, meter.nchan)
    T = x.shape[-1]
    cor = meter.cor
    sel_a, sel_b = meter._sel(None, x.dtype)

    def body(xs):
        kmz, tmax = _km_sp(meter.km, xs, "sp")
        km = meter.km.finalize(meter.km.init(xs.shape[:-1]), kmz, tmax, T)
        eps = jnp.float32(1e-20 / cor.w1)
        s0 = jnp.zeros((*xs.shape[:-1], 1), xs.dtype)
        y, zl = lti_apply_sp(cor.lp, xs + eps, s0, "sp")
        zp = _pair_products_sp(cor, y, sel_a, sel_b, "sp")
        # epilogue once (stcorrdsp.cc:65-76 via surround.update)
        zl = jnp.where(jnp.isfinite(zl), zl, 0.0)
        zp = jnp.where(jnp.isfinite(zp), zp, 0.0) + 1e-10
        return SurroundState(km=km, zl=zl, zp=zp)

    st = jax.jit(
        shard_map(
            body, mesh=mesh, in_specs=P("dp", None, "sp"),
            out_specs=P("dp"), check_vma=False,
        )
    )(x)
    return meter.read(st)[0]
