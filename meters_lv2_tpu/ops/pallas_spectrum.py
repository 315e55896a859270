"""Fused Pallas TPU kernel for the 30-band 1/3-octave analyzer hot path.

One pass over the (downmixed) input computes, per stream and band:

  * the 6th-order IEC 61260 band-pass output y (the banked modal-balanced
    12-state blocked LTI, ops/lti.BankedLTISystem — src/spectr.c:68-87),
  * the squared signal fed through the display one-pole smoother with the
    RUNTIME omega (spectrumlv2.c:170-177),
  * the running peak-hold of the smoothed value (spectrumlv2.c:224),

carrying the 12-dim filter states and smoother values across blocks.

Why a kernel: the unfused XLA graph materializes the 30-band full-rate
series three times ([..., 30, T] filter output, its square, the smoothed
series — a 90x HBM blowup of the input, ~7 GB per B=256 x 1 s update) and
measured HBM-bound at 13.9 ms (docs/BENCHMARKS.md round 4).  Here the
full-rate intermediates never leave VMEM; the only HBM traffic is one
read of x plus O(B*30) state words.

Layout (v4 — band-PACKED, MODAL VPU state chain): grid is
(row_tiles, time_tiles) only.  All 30 bands ride in the lane dimension:

  * conv: ONE streamed dot [r,128] @ K_all [128, 30*128] per 128-sample
    block — Mosaic keeps the MXU busy streaming weight tiles instead of
    issuing 30 small dependent dots (the v1 per-band grid measured 38%
    MXU efficiency on the conv alone).
  * states: s_packed [r, 512] (16 lanes per band, 12 used, padded to a
    128-lane multiple so lane rotates stay cheap).  The band systems are
    cascades of balanced 2x2 modal sections (design.
    cascade_modal_state_space), so the per-block propagator A^128 is
    exactly block lower-triangular in 2x2 section blocks — s @ At
    decomposes into <= 6 lane-shifted exact-f32 VPU FMAs (same-parity
    sources via 2k-lane rolls of s, opposite-parity via rolls of the
    pair-swap).  This replaced the v2 480x480 6-pass bf16 GEMM (~43% of
    the kernel's MXU work) with exact-f32 VPU ops — the same move that
    made pallas_r128's d=4 chain faster AND more accurate (state-chain
    errors compound across blocks x resonance; see the precision table
    in docs/BENCHMARKS.md).  NB a fully-diagonal parallel modal form was
    tried and is UNSTABLE: LAPACK cluster-splitting error on the
    clustered high-Q poles pushes exactified eigenvalues outside the
    unit circle (the ~1e-13 off-block couplings of the numeric
    similarity are load-bearing).
  * smoother (two variants, METERS_TPU_SPECTRUM_SMOOTH=gemm|scan):
    - gemm (default): per-band 3-pass bf16 dots against a traced
      [128,128] one-pole Toeplitz operator (the v2 formulation),
      weight-stationary.  Measured 7.82 ms at B=256 x 1 s (32.7k x rt).
    - scan: exact-f32 log-doubling one-pole prefix scan over the 128
      lanes of each band group (7 masked roll-FMA steps on the whole
      [r, 3840] row), then per-band carry add + max.  Measured SLOWER
      (15.2 ms): Mosaic lane rolls on [64, 3840] are relayout-grade
      (~0.9 us per roll+FMA step), so 7 x 375 of them swamp the 1.8 ms
      GEMM they replace.  Kept for narrow-parity experiments (it is
      exact f32).

Precision: Mosaic lowers plain f32 dots to ONE bf16 pass, so the
feed-forward conv/Sy/G GEMMs run as manual 3-pass bf16 splits (== XLA
Precision.HIGH); the state chain and (in scan mode) the smoother are
exact f32 VPU arithmetic.  tools/tpu_parity_check.py's spectrum family
validates the result on-chip against the compiled reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 128
_DP = 16  # padded per-band state lanes (12 used)
_F32 = jnp.float32
_SCAN_STEPS = 7  # log2(128) doubling steps


# shared split algebra (ops/bf16split)
from .bf16split import (
    split2 as _split_bf16,
    split2_host as _split_bf16_host,
    split3 as _split3_bf16,
)


def _state_tri_parts(
    at_bd: np.ndarray, d: int, nsec: int
) -> tuple[np.ndarray, np.ndarray]:
    """Split a packed state propagator into lane-shift coefficient rows.

    at_bd: [W, W] with band b's (transposed) A^block in the 16-lane block
    [16b, 16b+16).  Requires each band's propagator to be EXACTLY block
    lower-triangular over 2x2 section blocks (adjacent lane pairs) —
    guaranteed by design.cascade_modal_state_space: powers of a block-
    triangular matrix keep exact structural zeros.  Returns
    (cka [8, W], ckb [8, W]) such that

        s @ at_bd == sum_k  shift(s, 2k) * cka[k] + shift(sw, 2k) * ckb[k]

    where shift(v, n)[l] = v[l-n] (band-masked) and sw = pair-swap(s):
    dest lane l's section receives from section k-below's same-parity
    lane via cka and its partner lane via ckb.
    """
    W = at_bd.shape[0]
    cka = np.zeros((8, W), np.float32)
    ckb = np.zeros((8, W), np.float32)
    assert nsec <= 8, nsec
    lane16 = np.arange(W) % _DP
    for k in range(nsec):
        ok = (lane16 < d) & (lane16 >= 2 * k)
        (idx,) = np.nonzero(ok)
        cka[k, idx] = at_bd[idx - 2 * k, idx]
        ckb[k, idx] = at_bd[(idx - 2 * k) ^ 1, idx]
    chk = np.zeros_like(at_bd)
    for k in range(nsec):
        ok = (lane16 < d) & (lane16 >= 2 * k)
        (idx,) = np.nonzero(ok)
        chk[idx - 2 * k, idx] += cka[k, idx]
        chk[(idx - 2 * k) ^ 1, idx] += ckb[k, idx]
    if not np.array_equal(chk, at_bd):
        raise ValueError(
            "state propagator is not exactly section-block-triangular; "
            "build the band systems with design.cascade_modal_state_space"
        )
    return cka, ckb


def _prepare_weights(op) -> tuple[np.ndarray, ...]:
    """Host-side pre-split packed weight stacks from a banked LTIBlockOp.

    Band b's state occupies lanes [16b, 16b+16) of the packed Wp-lane
    state row (Wp = NB*16 padded up to a multiple of 128); all maps are
    zero-padded so the pad lanes stay zero through the recurrence.
    """
    nb, blk, _ = op.kmat.shape
    d = op.d
    W = nb * _DP
    Wp = -(-W // _BLK) * _BLK  # lane rotates need a 128-multiple row
    # K_all [128, NB*128]: y_all lanes grouped per band
    k_all = np.concatenate([op.kmat[b] for b in range(nb)], axis=1)
    kh, kl = _split_bf16_host(k_all)
    # Sy per band [NB, 16, 128] (s_b @ sy_b)
    sy = np.zeros((nb, _DP, _BLK), np.float32)
    sy[:, :d, :] = op.sy
    syh, syl = _split_bf16_host(sy)
    # G_all [128, Wp] (u @ g, all bands at once)
    g_all = np.zeros((_BLK, Wp), np.float32)
    for b in range(nb):
        g_all[:, b * _DP : b * _DP + d] = op.g[b]
    gh, gl = _split_bf16_host(g_all)
    # At block-diagonal [Wp, Wp] -> exact lane-shift coefficient rows
    at_bd = np.zeros((Wp, Wp), np.float32)
    for b in range(nb):
        at_bd[b * _DP : b * _DP + d, b * _DP : b * _DP + d] = op.at[b]
    assert d % 2 == 0, d
    cka, ckb = _state_tri_parts(at_bd, d, d // 2)
    return kh, kl, syh, syl, gh, gl, cka, ckb


def _make_kernel(nblk: int, nb: int, Wp: int, d: int, smooth: str):
    W3 = nb * _BLK
    nsec = d // 2

    def kernel(x_ref, z0_ref, v0_ref,
               kh_ref, kl_ref, syh_ref, syl_ref, gh_ref, gl_ref,
               cka_ref, ckb_ref, sm0_ref, sm1_ref, pw_ref,
               zout_ref, vout_ref, pout_ref,
               s_scr, v_scr, p_scr):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            s_scr[...] = z0_ref[...]
            v_scr[...] = v0_ref[...]
            p_scr[...] = jnp.zeros_like(p_scr)

        dot = functools.partial(jnp.dot, preferred_element_type=_F32)

        def dot3(ahl, bh, bl):
            ah, al = ahl
            return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))

        kh, kl = kh_ref[...], kl_ref[...]
        gh, gl = gh_ref[...], gl_ref[...]
        cka, ckb = cka_ref[...], ckb_ref[...]
        pw = pw_ref[...]  # [1, 128] (1-w)^{i+1}
        r = x_ref.shape[0]
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (r, Wp), 1)
        even_w = (lane_w % 2) == 0
        lane16 = lane_w % _DP
        # per-offset masks: dest lane must be a used state lane whose
        # shift-source stays inside the SAME band's 16-lane group (a
        # SELECT, not zero coefficients: a neighbouring band's saturated
        # Inf state times 0.0 would mint NaNs)
        sec_ok = [
            (lane16 < d) & (lane16 >= 2 * kk) for kk in range(nsec)
        ]
        if smooth == "scan":
            wrow = sm0_ref[...]       # [1, 3840] omega per lane
            ck = sm1_ref[...]         # [8, 3840] masked (1-w)^{2^k} rows
            lane128 = (
                jax.lax.broadcasted_iota(jnp.int32, (r, W3), 1) % _BLK
            )
        elif smooth == "gemm6":
            omh = sm0_ref[...]                       # [128,128] bf16 hi
            omm = sm1_ref[:_BLK, :]                  # [128,128] bf16 mid
            oml6 = sm1_ref[_BLK:, :]                 # [128,128] bf16 lo
        else:
            omh, oml = sm0_ref[...], sm1_ref[...]  # [128,128] bf16 splits

        def block_step(j, carry):
            s, vcol, pk = carry
            xb = x_ref[:, pl.ds(j * _BLK, _BLK)]  # [R, 128]
            x_hl = _split_bf16(xb)
            s_hl = _split_bf16(s)
            # one streamed conv for ALL bands; + per-band state response
            y_all = dot3(x_hl, kh, kl)  # [R, NB*128]
            ys = [
                dot3(
                    (s_hl[0][:, b * _DP : (b + 1) * _DP],
                     s_hl[1][:, b * _DP : (b + 1) * _DP]),
                    syh_ref[b], syl_ref[b],
                )
                for b in range(nb)
            ]
            sq_all = y_all + jnp.concatenate(ys, axis=1)
            sq_all = sq_all * sq_all  # [R, NB*128]
            # state advance: EXACT f32 on the VPU.  The cascade-modal At
            # is block lower-triangular in 2x2 sections, so s @ At is a
            # sum of 2k-lane-shifted FMAs — same-parity sources via
            # shifts of s, opposite-parity via shifts of the pair-swap
            # sw — plus one 3-pass G_all injection.
            sw = jnp.where(
                even_w,
                pltpu.roll(s, Wp - 1, 1),  # even lane l takes s[l+1]
                pltpu.roll(s, 1, 1),       # odd lane l takes s[l-1]
            )
            acc = dot3(x_hl, gh, gl)
            for kk in range(nsec):
                sk = s if kk == 0 else pltpu.roll(s, 2 * kk, 1)
                swk = sw if kk == 0 else pltpu.roll(sw, 2 * kk, 1)
                con = sk * cka[kk : kk + 1, :] + swk * ckb[kk : kk + 1, :]
                acc = acc + jnp.where(sec_ok[kk], con, 0.0)
            s = acc
            if smooth == "scan":
                # exact-f32 one-pole prefix over each band's 128 lanes:
                # v[i] = w*sq[i] + (1-w) v[i-1]  via log-doubling rolls;
                # ck rows carry the group mask folded into (1-w)^{2^k}.
                # The boundary mask must be a SELECT, not the ck zeros
                # alone: rolls cross band groups, and a neighbouring
                # band's legitimate Inf (low bands saturate exactly as
                # the XLA path does) times a zero coefficient would mint
                # NaNs that poison this band's peak max.
                v = sq_all * wrow
                for kk in range(_SCAN_STEPS):
                    sh = 1 << kk
                    contrib = pltpu.roll(v, sh, 1) * ck[kk : kk + 1, :]
                    v = v + jnp.where(lane128 >= sh, contrib, 0.0)
            elif smooth == "gemm6":
                sq_h3, sq_m3, sq_l3 = _split3_bf16(sq_all)
            else:
                sq_hl = _split_bf16(sq_all)
            nv = []
            np_ = []
            for b in range(nb):
                sl = slice(_BLK * b, _BLK * (b + 1))
                if smooth == "scan":
                    vs = v[:, sl] + vcol[:, b : b + 1] * pw
                elif smooth == "gemm6":
                    # f32-exact 6-pass smoother dot: the 3-pass HIGH form
                    # measured 0.009 dB on deep stopband display bins ON
                    # CHIP (r5 attribution; interpret shows 0.0015 —
                    # Mosaic-side accumulation of the dropped tiers), the
                    # same display-bin law pallas_stft hit in r4
                    ah = sq_h3[:, sl]
                    am = sq_m3[:, sl]
                    al = sq_l3[:, sl]
                    vs = (
                        (dot(ah, oml6) + dot(al, omh) + dot(am, omm))
                        + (dot(ah, omm) + dot(am, omh))
                        + dot(ah, omh)
                    )
                    vs = vs + vcol[:, b : b + 1] * pw  # [R, 128]
                else:
                    vs = dot3((sq_hl[0][:, sl], sq_hl[1][:, sl]), omh, oml)
                    vs = vs + vcol[:, b : b + 1] * pw  # [R, 128]
                nv.append(vs[:, _BLK - 1 : _BLK])
                np_.append(jnp.max(vs, axis=1, keepdims=True))
            pad = vcol.shape[1] - nb
            zpad = jnp.zeros((vcol.shape[0], pad), _F32)
            vcol = jnp.concatenate(nv + [zpad], axis=1)
            pk = jnp.maximum(pk, jnp.concatenate(np_ + [zpad], axis=1))
            return s, vcol, pk

        s, vcol, pk = jax.lax.fori_loop(
            0, nblk, block_step, (s_scr[...], v_scr[...], p_scr[...])
        )

        s_scr[...] = s
        v_scr[...] = vcol
        p_scr[...] = pk
        # revisited small outputs: the final time tile's write wins
        zout_ref[...] = s
        vout_ref[...] = vcol
        pout_ref[...] = pk

    return kernel


def _pick_tile(n: int, options):
    for o in options:
        if n % o == 0:
            return o
    return None


def smoother_op(omega, dtype=jnp.float32):
    """Traced one-pole display-smoother block operator (gemm mode).

    Returns (ksm [128,128] with ksm[j,i] = w(1-w)^{i-j} for i>=j, so the
    smoothed series is sq @ ksm + v_in * pw; pw [1,128] = (1-w)^{i+1}) —
    the same math as ops/lti.one_pole_block_op_traced at block=128.
    """
    om = jnp.asarray(omega, dtype)
    l1 = jnp.log1p(-om)
    i = jnp.arange(_BLK, dtype=dtype)
    idx = i[None, :] - i[:, None]  # [j, i] = i - j
    ksm = jnp.where(idx >= 0, om * jnp.exp(idx * l1), jnp.zeros((), dtype))
    pw = jnp.exp((i + 1) * l1)[None, :]
    return ksm, pw


def smoother_scan_rows(omega, nb: int, dtype=jnp.float32):
    """Traced per-lane coefficient rows for the scan-mode smoother.

    Returns (wrow [1, nb*128], ck [8, nb*128], pw [1, 128]): wrow is the
    omega splat, ck[k] is (1-w)^{2^k} masked to zero on lanes whose roll
    source would cross a 128-lane band-group boundary, pw the carry
    powers (1-w)^{i+1}.
    """
    om = jnp.asarray(omega, dtype)
    l1 = jnp.log1p(-om)
    lane = jnp.arange(_BLK, dtype=jnp.int32)
    rows = []
    for k in range(_SCAN_STEPS):
        sh = 1 << k
        rows.append(
            jnp.where(lane >= sh, jnp.exp(sh * l1), jnp.zeros((), dtype))
        )
    rows.append(jnp.zeros(_BLK, dtype))  # pad to 8 sublanes
    ck = jnp.tile(jnp.stack(rows), (1, nb))  # [8, nb*128]
    wrow = jnp.tile(jnp.broadcast_to(om, (_BLK,)), nb)[None, :]
    pw = jnp.exp((jnp.arange(_BLK, dtype=dtype) + 1) * l1)[None, :]
    return wrow, ck, pw


def fused_core(
    x: jax.Array,
    z0: jax.Array,
    v0: jax.Array,
    omega: jax.Array,
    op,
    *,
    interpret: bool = False,
    r_tile: int | None = None,
    k: int | None = None,
    smooth: str | None = None,
):
    """Fused band-filter + square + smoother + peak over one block.

    Args:
      x:     [B, T] downmixed input, T % 128 == 0.
      z0:    [B, NB, d] banked filter state.
      v0:    [B, NB] smoother value state (the meter's `val`).
      omega: traced scalar smoother coefficient.
      op:    banked ops.lti.LTIBlockOp at block=128 (numpy leaves) whose
             band systems are exact section-block-triangular cascades
             (design.cascade_modal_state_space; _prepare_weights raises
             otherwise).
      smooth: 'gemm' (3-pass bf16 Toeplitz dots), 'gemm6' (f32-exact
             6-pass dots — the display-bin precision mode, r5) or
             'scan' (exact-f32 VPU prefix scan, measured 2x slower);
             METERS_TPU_SPECTRUM_SMOOTH overrides.

    Returns (val [B, NB], peak [B, NB], zf [B, NB, d]): end-of-block
    smoothed value, the block's peak of the smoothed series (combine with
    the carried peak outside), and the filter state.
    """
    import os

    B, T = x.shape
    NB = op.kmat.shape[0]
    d = op.d
    W = NB * _DP
    Wp = -(-W // _BLK) * _BLK
    VP = 32  # val/peak lane padding
    assert T % _BLK == 0 and z0.shape[-2:] == (NB, d) and NB <= VP
    if smooth is None:
        smooth = os.environ.get("METERS_TPU_SPECTRUM_SMOOTH", "gemm")
    assert smooth in ("scan", "gemm", "gemm6"), smooth

    # packed states: band b in lanes [16b, 16b+16)
    zp = jnp.pad(z0, ((0, 0), (0, 0), (0, _DP - d))).reshape(B, W)
    zp = jnp.pad(zp, ((0, 0), (0, Wp - W)))
    vp = jnp.pad(v0, ((0, 0), (0, VP - NB)))

    rpad = (-B) % 8
    if rpad:
        x = jnp.pad(x, ((0, rpad), (0, 0)))
        zp = jnp.pad(zp, ((0, rpad), (0, 0)))
        vp = jnp.pad(vp, ((0, rpad), (0, 0)))
    Bp = B + rpad

    if r_tile is None:
        # 64 rows: the fori body's [R, NB*128] temporaries put r_tile=128
        # 2 MB over the 16 MB scoped-VMEM stack limit
        r_tile = _pick_tile(Bp, (64, 32, 16, 8))
    nbk = T // _BLK
    # blocks per time tile: amortizes per-program overhead (v1's k=5 band-
    # grid measured 12.4 ms at B=256 x 1 s; see docs/BENCHMARKS.md round 4)
    if k is None:
        k = _pick_tile(nbk, range(15, 0, -1))
    assert Bp % r_tile == 0 and nbk % k == 0, (Bp, r_tile, nbk, k)
    t_tile = k * _BLK
    nt = T // t_tile
    grid = (Bp // r_tile, nt)

    weights = tuple(jnp.asarray(w) for w in _prepare_weights(op))
    if smooth == "scan":
        wrow, ck, pw = smoother_scan_rows(omega, NB, jnp.float32)
        sm0, sm1 = wrow, ck
    elif smooth == "gemm6":
        ksm, pw = smoother_op(omega, jnp.float32)
        h3, m3, l3 = _split3_bf16(ksm)
        sm0, sm1 = h3, jnp.concatenate([m3, l3], axis=0)  # [128],[256]x128
    else:
        ksm, pw = smoother_op(omega, jnp.float32)
        sm0, sm1 = _split_bf16(ksm)

    vm = pltpu.VMEM
    cmap2 = lambda r, t: (0, 0)
    cmap3 = lambda r, t: (0, 0, 0)
    smap = lambda r, t: (r, 0)

    wspecs = []
    for w in weights:
        wspecs.append(pl.BlockSpec(
            w.shape, cmap3 if w.ndim == 3 else cmap2, memory_space=vm
        ))

    zout, vout, pout = pl.pallas_call(
        _make_kernel(k, NB, Wp, d, smooth),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_tile, t_tile), lambda r, t: (r, t),
                         memory_space=vm),
            pl.BlockSpec((r_tile, Wp), smap, memory_space=vm),
            pl.BlockSpec((r_tile, VP), smap, memory_space=vm),
            *wspecs,
            pl.BlockSpec(sm0.shape, cmap2, memory_space=vm),
            pl.BlockSpec(sm1.shape, cmap2, memory_space=vm),
            pl.BlockSpec(pw.shape, cmap2, memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((r_tile, Wp), smap, memory_space=vm),
            pl.BlockSpec((r_tile, VP), smap, memory_space=vm),
            pl.BlockSpec((r_tile, VP), smap, memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Wp), _F32),
            jax.ShapeDtypeStruct((Bp, VP), _F32),
            jax.ShapeDtypeStruct((Bp, VP), _F32),
        ),
        scratch_shapes=[
            pltpu.VMEM((r_tile, Wp), _F32),
            pltpu.VMEM((r_tile, VP), _F32),
            pltpu.VMEM((r_tile, VP), _F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * T * NB * 3 * (_BLK + _DP + _BLK // 8),
            bytes_accessed=Bp * T * 4 + Bp * (Wp + 2 * VP) * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, zp, vp, *weights, sm0, sm1, pw)

    zf = zout[:, :W].reshape(Bp, NB, _DP)[:, :, :d]
    val = vout[:, :NB]
    peak = pout[:, :NB]
    if rpad:
        zf, val, peak = zf[:B], val[:B], peak[:B]
    return val, peak, zf


def available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
