"""Fused Pallas TPU kernel for the 30-band 1/3-octave analyzer hot path.

One pass over the (downmixed) input computes, per stream and band:

  * the 6th-order IEC 61260 band-pass output y (the banked modal-balanced
    12-state blocked LTI, ops/lti.BankedLTISystem — src/spectr.c:68-87),
  * the squared signal fed through the display one-pole smoother with the
    RUNTIME omega (spectrumlv2.c:170-177; omega arrives as a traced
    [128,128] one-pole Toeplitz operator built in XLA per call),
  * the running peak-hold of the smoothed value (spectrumlv2.c:224),

carrying the 12-dim filter states and smoother values across blocks.

Why a kernel: the unfused XLA graph materializes the 30-band full-rate
series three times ([..., 30, T] filter output, its square, the smoothed
series — a 90x HBM blowup of the input, ~7 GB per B=256 x 1 s update) and
measured HBM-bound at 13.9 ms (docs/BENCHMARKS.md round 4).  Here the
full-rate intermediates never leave VMEM; the only HBM traffic is one
read of x plus O(B*30) state words.

Layout (v2 — band-PACKED): grid is (row_tiles, time_tiles) only.  All 30
bands ride in the lane dimension:

  * conv: ONE streamed dot [r,128] @ K_all [128, 30*128] per 128-sample
    block — Mosaic keeps the MXU busy streaming weight tiles instead of
    issuing 30 small dependent dots (the v1 per-band grid measured 38%
    MXU efficiency on the conv alone).
  * states: s_packed [r, 30*16] advances through a block-diagonal
    At [480,480] and one G_all [128,480] dot per block.
  * smoother: per-band dots against the SAME traced operator, issued
    back-to-back so the weights stay loaded (weight-stationary).

Precision: as in pallas_r128, Mosaic lowers plain f32 dots to ONE bf16
pass, so GEMMs run as manual bf16-split passes — 3-pass (== XLA
Precision.HIGH) for the feed-forward conv/Sy/G/smoother, 6-pass (3-way
splits, ~f32-exact) for the At state propagation whose errors compound
across blocks amplified by the resonant poles: 3-pass At measured
0.25 dB on the 25 Hz band (pole radius 1-1e-5), 6-pass 0.0006 dB; the
same finding forced ops/lti.py's state chain to Precision.HIGHEST
(docs/BENCHMARKS.md round 4).  tools/tpu_parity_check.py's spectrum
family validates the result on-chip against the compiled reference.
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


def _split_bf16_host(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    import ml_dtypes

    bf16 = np.dtype(ml_dtypes.bfloat16)
    a = np.asarray(a, np.float32)
    hi = a.astype(bf16)
    lo = (a - hi.astype(np.float32)).astype(bf16)
    return hi, lo


def _split3_bf16_host(a: np.ndarray) -> tuple[np.ndarray, ...]:
    """3-way bf16 split (hi+mid+lo ~ f32 exactly to 2^-24)."""
    import ml_dtypes

    bf16 = np.dtype(ml_dtypes.bfloat16)
    a = np.asarray(a, np.float32)
    hi = a.astype(bf16)
    r = a - hi.astype(np.float32)
    mid = r.astype(bf16)
    lo = (r - mid.astype(np.float32)).astype(bf16)
    return hi, mid, lo


def _split_bf16(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    hi = a.astype(jnp.bfloat16)
    return hi, (a - hi.astype(_F32)).astype(jnp.bfloat16)


def _split3_bf16(a: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    hi = a.astype(jnp.bfloat16)
    r = a - hi.astype(_F32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(_F32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _prepare_weights(op) -> tuple[np.ndarray, ...]:
    """Host-side pre-split packed weight stacks from a banked LTIBlockOp.

    Band b's state occupies lanes [16b, 16b+16) of the packed 480-lane
    state row; all maps are zero-padded so the pad lanes stay zero
    through the recurrence.
    """
    nb, blk, _ = op.kmat.shape
    d = op.d
    W = nb * _DP
    # K_all [128, NB*128]: y_all lanes grouped per band
    k_all = np.concatenate([op.kmat[b] for b in range(nb)], axis=1)
    kh, kl = _split_bf16_host(k_all)
    # Sy per band [NB, 16, 128] (s_b @ sy_b)
    sy = np.zeros((nb, _DP, _BLK), np.float32)
    sy[:, :d, :] = op.sy
    syh, syl = _split_bf16_host(sy)
    # G_all [128, NB*16] (u @ g, all bands at once)
    g_all = np.zeros((_BLK, W), np.float32)
    for b in range(nb):
        g_all[:, b * _DP : b * _DP + d] = op.g[b]
    gh, gl = _split_bf16_host(g_all)
    # At block-diagonal [W, W] (s_packed @ At_bd), 3-way split for 6-pass
    at_bd = np.zeros((W, W), np.float32)
    for b in range(nb):
        at_bd[b * _DP : b * _DP + d, b * _DP : b * _DP + d] = op.at[b]
    ath, atm, atl = _split3_bf16_host(at_bd)
    return kh, kl, syh, syl, gh, gl, ath, atm, atl


def _make_kernel(nblk: int, nb: int):
    W = nb * _DP

    def kernel(x_ref, z0_ref, v0_ref,
               kh_ref, kl_ref, syh_ref, syl_ref, gh_ref, gl_ref,
               ath_ref, atm_ref, atl_ref, omh_ref, oml_ref, pw_ref,
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

        def dot6(ahml, bh, bm, bl):
            # 6-pass ~ f32-exact: hh + (hm + mh) + (hl + mm + lh)
            ah, am, al = ahml
            return (
                dot(ah, bh)
                + (dot(ah, bm) + dot(am, bh))
                + (dot(ah, bl) + dot(am, bm) + dot(al, bh))
            )

        kh, kl = kh_ref[...], kl_ref[...]
        gh, gl = gh_ref[...], gl_ref[...]
        ath, atm, atl = ath_ref[...], atm_ref[...], atl_ref[...]
        omh, oml = omh_ref[...], oml_ref[...]
        pw = pw_ref[...]  # [1, 128] (1-w)^{i+1}

        # lax.fori_loop (not a python unroll): each iteration's [R, NB*128]
        # temporaries are ~2 MB — unrolling blew the 16 MB scoped-VMEM stack
        def block_step(j, carry):
            s, vcol, pk = carry
            xb = x_ref[:, pl.ds(j * _BLK, _BLK)]  # [R, 128]
            x_hl = _split_bf16(xb)
            s_hml = _split3_bf16(s)
            # one streamed conv for ALL bands; + per-band state response
            # ((hi, mid) of the 3-way split == the 2-way split)
            y_all = dot3(x_hl, kh, kl)  # [R, NB*128]
            ys = [
                dot3(
                    (s_hml[0][:, b * _DP : (b + 1) * _DP],
                     s_hml[1][:, b * _DP : (b + 1) * _DP]),
                    syh_ref[b], syl_ref[b],
                )
                for b in range(nb)
            ]
            sq_all = y_all + jnp.concatenate(ys, axis=1)
            sq_all = sq_all * sq_all  # [R, NB*128]
            # state advance: block-diag 6-pass At + one G_all injection
            s = dot6(s_hml, ath, atm, atl) + dot3(x_hl, gh, gl)
            # smoother: back-to-back dots against the SAME traced operator
            # (weight-stationary), then the exact-f32 carry correction
            sq_hl = _split_bf16(sq_all)
            nv = []
            np_ = []
            for b in range(nb):
                sl = slice(_BLK * b, _BLK * (b + 1))
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
    """Traced one-pole display-smoother block operator for the kernel.

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
):
    """Fused band-filter + square + smoother + peak over one block.

    Args:
      x:     [B, T] downmixed input, T % 128 == 0.
      z0:    [B, NB, d] banked filter state.
      v0:    [B, NB] smoother value state (the meter's `val`).
      omega: traced scalar smoother coefficient.
      op:    banked ops.lti.LTIBlockOp at block=128 (numpy leaves).

    Returns (val [B, NB], peak [B, NB], zf [B, NB, d]): end-of-block
    smoothed value, the block's peak of the smoothed series (combine with
    the carried peak outside), and the filter state.
    """
    B, T = x.shape
    NB = op.kmat.shape[0]
    d = op.d
    W = NB * _DP
    VP = 32  # val/peak lane padding
    assert T % _BLK == 0 and z0.shape[-2:] == (NB, d) and NB <= VP

    # packed states: band b in lanes [16b, 16b+16)
    zp = jnp.pad(z0, ((0, 0), (0, 0), (0, _DP - d))).reshape(B, W)
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
    ksm, pw = smoother_op(omega, jnp.float32)
    omh, oml = _split_bf16(ksm)

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
        _make_kernel(k, NB),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_tile, t_tile), lambda r, t: (r, t),
                         memory_space=vm),
            pl.BlockSpec((r_tile, W), smap, memory_space=vm),
            pl.BlockSpec((r_tile, VP), smap, memory_space=vm),
            *wspecs,
            pl.BlockSpec(ksm.shape, cmap2, memory_space=vm),
            pl.BlockSpec(ksm.shape, cmap2, memory_space=vm),
            pl.BlockSpec(pw.shape, cmap2, memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((r_tile, W), smap, memory_space=vm),
            pl.BlockSpec((r_tile, VP), smap, memory_space=vm),
            pl.BlockSpec((r_tile, VP), smap, memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, W), _F32),
            jax.ShapeDtypeStruct((Bp, VP), _F32),
            jax.ShapeDtypeStruct((Bp, VP), _F32),
        ),
        scratch_shapes=[
            pltpu.VMEM((r_tile, W), _F32),
            pltpu.VMEM((r_tile, VP), _F32),
            pltpu.VMEM((r_tile, VP), _F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * T * NB * 3 * (2 * _BLK + 3 * _DP),
            bytes_accessed=Bp * T * 4 + Bp * (W + 2 * VP) * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, zp, vp, *weights, omh, oml, pw)

    zf = zout.reshape(Bp, NB, _DP)[:, :, :d]
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
