"""Fused Pallas TPU kernel for the surround meter hot path.

One pass over the [B, C, T] block computes, per stream, everything
SurroundMeter.update needs (reference: src/surmeter.c:50-160 — N
Kmeterdsp instances + 4 Stcorrdsp instances on routable channel pairs):

  * per-channel K-meter smoother state advance on x^2 (the grouped-4
    two-stage RMS recurrence, kmeterdsp.cc:77-107) — only the FINAL
    2-dim state is ever read, so each 128-sample block contributes two
    exact-f32 VPU lane-reduces (no MXU, no full-rate output),
  * per-channel NaN-skipped block max of x^2 (kmeterdsp.cc:124),
  * the per-channel correlator one-pole lowpass y = lp(x + eps)
    (stcorrdsp.cc:56-60; filtering commutes with pair selection, see
    models/surround.py), as a 3-pass bf16 block-Toeplitz GEMM — the only
    MXU work, one [128,128] operand per 128-sample block per channel,
  * the end-of-block values of the per-pair product averages
    (zab, zaa, zbb): the w2 one-poles evaluate as a closed-form weighted
    sum (models/cor.ema_final algebra), accumulated per block in VMEM —
    the full-rate filtered signals and pair products NEVER touch HBM.

The unfused XLA path materializes y [B,C,T] and prods [B,P,3,T] in HBM
(3P+C full-rate intermediates vs ONE input read here); at 204x5ch x 1 s
that is ~0.7 GB of traffic for a 0.2 GB input — this kernel is why the
surround family moves from pass-bound to input-bound.

Layout and grid mirror ops/pallas_r128.py: streams are rows, channels
ride the lane dim of one [B, C*T] operand, grid = (row_tiles,
time_tiles, channel) with channel INNERMOST.  Each channel program
writes its filtered block into a VMEM scratch y_scr[c]; the LAST
channel's program forms the routed pair products for the whole time
tile (runtime sel matrices ride in SMEM, so re-routing never
recompiles) and accumulates the weighted sums.  TPU grids run
sequentially, so per-channel states and the pair accumulators persist
in scratch across time tiles.

Precision: the lowpass conv GEMM runs the shared 3-pass bf16 hi/lo
split (== XLA Precision.HIGH, what the unfused path uses — the one-pole
has no resonance, the state-chain law only binds propagation operators,
which here are scalar f32 broadcasts and therefore exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bf16split import split2_host as _split_bf16_host

_BLK = 128
_F32 = jnp.float32


def _make_kernel(nblk: int, C: int, P: int, km_op, lp_op, eps: float):
    """Kernel body for one (row_tile, time_tile, channel) program.

    Small state operators bake in as python-float immediates; the
    [128,128] lowpass Toeplitz splits arrive as refs.
    """
    at2 = np.asarray(km_op.at, np.float32)  # [2, 2], s' = s @ at2
    a128 = float(np.asarray(lp_op.at, np.float64)[0, 0])  # (1-w1)^128
    epsf = float(eps)

    def kernel(x_ref, z0_ref, zl0_ref, sela_ref, selb_ref, wv_ref,
               g2_ref, k1h_ref, k1l_ref, sy1_ref, g1_ref,
               zout_ref, zlout_ref, pkout_ref, pacc_ref,
               s2_scr, zl_scr, pk_scr, y_scr, pacc_scr):
        t = pl.program_id(1)
        c = pl.program_id(2)

        @pl.when(t == 0)
        def _():
            s2_scr[c] = z0_ref[0]
            zl_scr[c] = zl0_ref[0]
            pk_scr[c] = jnp.zeros_like(pk_scr[c])

        @pl.when((t == 0) & (c == 0))
        def _():
            pacc_scr[...] = jnp.zeros_like(pacc_scr)

        g2_rows = [g2_ref[i: i + 1, :] for i in range(2)]  # [1, 128]
        sy1 = sy1_ref[...]  # [1, 128]
        g1 = g1_ref[...]  # [1, 128]
        k1h, k1l = k1h_ref[...], k1l_ref[...]

        def split(a):
            hi = a.astype(jnp.bfloat16)
            return hi, (a - hi.astype(_F32)).astype(jnp.bfloat16)

        dot = functools.partial(jnp.dot, preferred_element_type=_F32)

        sc = [s2_scr[c, :, i: i + 1] for i in range(2)]  # [R, 1] columns
        zl = zl_scr[c]  # [R, 1]
        pk = pk_scr[c]  # [R, 1]
        for j in range(nblk):
            sl = slice(_BLK * j, _BLK * (j + 1))
            xb = x_ref[:, sl]  # [R, 128]
            sq = xb * xb
            # NaN samples must not erase the block peak (kmeterdsp.cc:124)
            pk = jnp.maximum(
                pk,
                jnp.max(jnp.where(sq != sq, 0.0, sq), axis=1, keepdims=True),
            )
            # K-meter smoother state: s' = s @ At + sq @ G (exact f32 VPU)
            gin = [
                jnp.sum(sq * g2_rows[i], axis=1, keepdims=True)
                for i in range(2)
            ]
            sc = [
                at2[0, i] * sc[0] + at2[1, i] * sc[1] + gin[i]
                for i in range(2)
            ]
            # correlator lowpass: y = (x+eps) @ K1 + zl * Sy1 (3-pass HIGH)
            xe = xb + epsf
            xh, xl = split(xe)
            y = (dot(xh, k1h) + (dot(xh, k1l) + dot(xl, k1h))) + zl * sy1
            zl = a128 * zl + jnp.sum(xe * g1, axis=1, keepdims=True)
            y_scr[c, :, sl] = y

        s2_scr[c] = jnp.concatenate(sc, axis=1)
        zl_scr[c] = zl
        pk_scr[c] = pk
        # revisited small outputs: each channel's final time tile wins
        zout_ref[0] = s2_scr[c]
        zlout_ref[0] = zl_scr[c]
        pkout_ref[0] = pk_scr[c]

        @pl.when(c == C - 1)
        def _():
            # all channels of this time tile are filtered: form the routed
            # pair products and accumulate the ema_final weighted sums
            acc = pacc_scr[...]  # [R, 3P]
            for j in range(nblk):
                sl = slice(_BLK * j, _BLK * (j + 1))
                wvb = wv_ref[:, sl]  # [1, 128]
                ys = [y_scr[cc, :, sl] for cc in range(C)]
                cols = []
                for p in range(P):
                    ya = ys[0] * sela_ref[p, 0]
                    yb = ys[0] * selb_ref[p, 0]
                    for cc in range(1, C):
                        ya = ya + ys[cc] * sela_ref[p, cc]
                        yb = yb + ys[cc] * selb_ref[p, cc]
                    for prod in (ya * yb, ya * ya, yb * yb):
                        cols.append(
                            jnp.sum(prod * wvb, axis=1, keepdims=True)
                        )
                # one [R, 3P] concat + add per block beats 3P separate
                # column updates (lane writes pad to 128 each)
                acc = acc + jnp.concatenate(cols, axis=1)
            pacc_scr[...] = acc

        pacc_ref[...] = pacc_scr[...]

    return kernel


def _make_kernel_wide(nblk: int, CP: int, P: int, km_op, lp_op, eps: float):
    """Wide-kernel body: channels ride SUBLANES — rows are (stream,
    channel) pairs, grid is (row_tiles, time_tiles) with NO channel
    dimension, so the per-channel grid sequencing and the cross-program
    y scratch of the narrow kernel disappear (round-5 roofline: surround
    sat at <6% of both roofs; the binder was the sequential channel
    programs).  The routed pair sums reshape [r, 128] -> [r/CP, CP, 128]
    (CP a power of two -> a native sublane split) and combine channels
    with SMEM routing scalars."""
    at2 = np.asarray(km_op.at, np.float32)  # [2, 2]
    a128 = float(np.asarray(lp_op.at, np.float64)[0, 0])
    epsf = float(eps)

    def kernel(x_ref, z0_ref, zl0_ref, sela_ref, selb_ref, wv_ref,
               g2_ref, k1h_ref, k1l_ref, sy1_ref, g1_ref,
               zout_ref, zlout_ref, pkout_ref, pacc_ref,
               s2_scr, zl_scr, pk_scr, pacc_scr):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            s2_scr[...] = z0_ref[...]
            zl_scr[...] = zl0_ref[...]
            pk_scr[...] = jnp.zeros_like(pk_scr)
            pacc_scr[...] = jnp.zeros_like(pacc_scr)

        g2_rows = [g2_ref[i: i + 1, :] for i in range(2)]
        sy1 = sy1_ref[...]
        g1 = g1_ref[...]
        k1h, k1l = k1h_ref[...], k1l_ref[...]

        def split(a):
            hi = a.astype(jnp.bfloat16)
            return hi, (a - hi.astype(_F32)).astype(jnp.bfloat16)

        dot = functools.partial(jnp.dot, preferred_element_type=_F32)

        r = x_ref.shape[0]
        sc = [s2_scr[:, i: i + 1] for i in range(2)]
        zl = zl_scr[...]
        pk = pk_scr[...]
        acc = pacc_scr[...]  # [r // CP, 3P]
        for j in range(nblk):
            sl = slice(_BLK * j, _BLK * (j + 1))
            xb = x_ref[:, sl]  # [r, 128], rows = (stream, channel)
            sq = xb * xb
            pk = jnp.maximum(
                pk,
                jnp.max(jnp.where(sq != sq, 0.0, sq), axis=1, keepdims=True),
            )
            gin = [
                jnp.sum(sq * g2_rows[i], axis=1, keepdims=True)
                for i in range(2)
            ]
            sc = [
                at2[0, i] * sc[0] + at2[1, i] * sc[1] + gin[i]
                for i in range(2)
            ]
            xe = xb + epsf
            xh, xl = split(xe)
            y = (dot(xh, k1h) + (dot(xh, k1l) + dot(xl, k1h))) + zl * sy1
            zl = a128 * zl + jnp.sum(xe * g1, axis=1, keepdims=True)
            # routed pair products, channels gathered over sublanes
            yr = y.reshape(r // CP, CP, _BLK)
            wvb = wv_ref[:, sl]  # [1, 128]
            cols = []
            for p in range(P):
                ya = yr[:, 0, :] * sela_ref[p, 0]
                yb = yr[:, 0, :] * selb_ref[p, 0]
                for cc in range(1, CP):
                    ya = ya + yr[:, cc, :] * sela_ref[p, cc]
                    yb = yb + yr[:, cc, :] * selb_ref[p, cc]
                for prod in (ya * yb, ya * ya, yb * yb):
                    cols.append(
                        jnp.sum(prod * wvb, axis=1, keepdims=True)
                    )
            acc = acc + jnp.concatenate(cols, axis=1)

        s2_scr[...] = jnp.concatenate(sc, axis=1)
        zl_scr[...] = zl
        pk_scr[...] = pk
        pacc_scr[...] = acc
        zout_ref[...] = s2_scr[...]
        zlout_ref[...] = zl_scr[...]
        pkout_ref[...] = pk_scr[...]
        pacc_ref[...] = pacc_scr[...]

    return kernel


def _fused_core_wide(
    x, km_z, zl, sel_a, sel_b, km_op, lp_op, w1, w2,
    *, interpret=False, r_tile=None, k=None,
):
    """Channels-on-sublanes variant of fused_core (same contract)."""
    B, C, T = x.shape
    P = sel_a.shape[0]
    CP = 1 << (C - 1).bit_length()  # channel rows padded to a power of 2
    x4 = jnp.pad(x, ((0, 0), (0, CP - C), (0, 0))).reshape(B * CP, T)
    z4 = jnp.pad(km_z, ((0, 0), (0, CP - C), (0, 0))).reshape(B * CP, 2)
    zl4 = jnp.pad(zl, ((0, 0), (0, CP - C), (0, 0))).reshape(B * CP, 1)
    sela = jnp.pad(sel_a.astype(_F32), ((0, 0), (0, CP - C)))
    selb = jnp.pad(sel_b.astype(_F32), ((0, 0), (0, CP - C)))

    R = B * CP
    rpad = (-R) % (8 * CP)
    if rpad:
        x4 = jnp.pad(x4, ((0, rpad), (0, 0)))
        z4 = jnp.pad(z4, ((0, rpad), (0, 0)))
        zl4 = jnp.pad(zl4, ((0, rpad), (0, 0)))
    Rp = R + rpad

    import os as _os

    from .pallas_r128 import _pick_tile, _warn_rejected_override

    if r_tile is None:
        env_r = _os.environ.get("METERS_TPU_SURROUND_RTILE")
        if env_r:
            v = int(env_r)
            if Rp % v == 0 and v % CP == 0:
                r_tile = v
            else:
                _warn_rejected_override(
                    "METERS_TPU_SURROUND_RTILE", env_r,
                    f"padded rows {Rp} not divisible (or not % {CP})")
        if r_tile is None:
            r_tile = _pick_tile(
                Rp, [o * CP for o in (64, 32, 16, 8, 4, 2, 1)]
            )
    nb = T // _BLK
    if k is None:
        env_k = _os.environ.get("METERS_TPU_SURROUND_K")
        if env_k and nb % int(env_k) == 0:
            k = int(env_k)
        if k is None:
            k = _pick_tile(nb, range(15, 0, -1))
    assert Rp % r_tile == 0 and r_tile % CP == 0 and nb % k == 0
    t_tile = k * _BLK
    nt = T // t_tile
    grid = (Rp // r_tile, nt)

    k1h, k1l = _split_bf16_host(lp_op.kmat)
    sy1 = np.asarray(lp_op.sy, np.float32)
    g1 = np.ascontiguousarray(np.asarray(lp_op.g, np.float32).T)
    g2 = np.ascontiguousarray(np.asarray(km_op.g, np.float32).T)
    wv = jnp.asarray(ema_weights(w2, T)[None, :])
    weights = tuple(jnp.asarray(w) for w in (g2, k1h, k1l, sy1, g1))

    vm = pltpu.VMEM
    cmap = lambda r, t: (0, 0)
    rmap = lambda r, t: (r, 0)

    in_specs = [
        pl.BlockSpec((r_tile, t_tile), lambda r, t: (r, t),
                     memory_space=vm),
        pl.BlockSpec((r_tile, 2), rmap, memory_space=vm),
        pl.BlockSpec((r_tile, 1), rmap, memory_space=vm),
        pl.BlockSpec((P, CP), cmap, memory_space=pltpu.SMEM),
        pl.BlockSpec((P, CP), cmap, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, t_tile), lambda r, t: (0, t), memory_space=vm),
    ] + [pl.BlockSpec(w.shape, cmap, memory_space=vm) for w in weights]

    eps = 1e-20 / w1
    zout, zlout, pkout, pacc = pl.pallas_call(
        _make_kernel_wide(k, CP, P, km_op, lp_op, eps),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((r_tile, 2), rmap, memory_space=vm),
            pl.BlockSpec((r_tile, 1), rmap, memory_space=vm),
            pl.BlockSpec((r_tile, 1), rmap, memory_space=vm),
            pl.BlockSpec((r_tile // CP, 3 * P), rmap, memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, 2), _F32),
            jax.ShapeDtypeStruct((Rp, 1), _F32),
            jax.ShapeDtypeStruct((Rp, 1), _F32),
            jax.ShapeDtypeStruct((Rp // CP, 3 * P), _F32),
        ),
        scratch_shapes=[
            pltpu.VMEM((r_tile, 2), _F32),
            pltpu.VMEM((r_tile, 1), _F32),
            pltpu.VMEM((r_tile, 1), _F32),
            pltpu.VMEM((r_tile // CP, 3 * P), _F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * T * 3 * _BLK,
            bytes_accessed=Rp * T * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x4, z4, zl4, sela, selb, wv, *weights)

    zout = zout[:R].reshape(B, CP, 2)[:, :C]
    zlout = zlout[:R].reshape(B, CP, 1)[:, :C]
    pkout = pkout[:R].reshape(B, CP)[:, :C]
    pacc = pacc[: R // CP].reshape(B, P, 3)
    return zout, zlout, pkout, pacc


def ema_weights(w2: float, T: int) -> np.ndarray:
    """Closed-form weights of the w2 one-pole's end-of-block value:
    z_T = (1-w2)^T z_0 + sum_t w2 (1-w2)^{T-1-t} p_t (stcorrdsp.cc:62-64;
    same algebra as models/cor.ema_final)."""
    t = np.arange(T, dtype=np.float64)
    return (w2 * (1.0 - w2) ** (T - 1.0 - t)).astype(np.float32)


def fused_core(
    x: jax.Array,
    km_z: jax.Array,
    zl: jax.Array,
    sel_a: jax.Array,
    sel_b: jax.Array,
    km_op,
    lp_op,
    w1: float,
    w2: float,
    *,
    interpret: bool = False,
    r_tile: int | None = None,
    k: int | None = None,
):
    """Fused surround block: K-meter smoothers + block peaks + routed
    correlator weighted product sums, one HBM read of the input.

    Args:
      x:     [B, C, T] input block, T % 128 == 0.
      km_z:  [B, C, 2] K-meter smoother state (pre-clamped by the caller,
             kmeterdsp.cc:101).
      zl:    [B, C, 1] correlator lowpass state.
      sel_a, sel_b: [P, C] f32 one-hot routing matrices (may be traced —
             the reference re-reads surc_a/b every run(), surmeter.c:
             119-128).
      km_op: ops.lti.LTIBlockOp of grouped4_smoother_system at block=32
             (d=2, m=4 — 128 samples per block).
      lp_op: LTIBlockOp of the w1 one-pole at block=128 (d=1).
      w1, w2: stcorr coefficients (eps = 1e-20/w1 folds the denormal
             offset into the input, stcorrdsp.cc:56-60).

    Returns:
      (km_z' [B, C, 2], zl' [B, C, 1], pk [B, C] block max of x^2,
       pacc [B, P, 3] weighted product sums): the caller finishes with
      zp' = zp * (1-w2)^T + pacc and the usual NaN flushes.
    """
    B, C, T = x.shape
    P = sel_a.shape[0]
    assert T % _BLK == 0, (T, _BLK)
    assert km_op.block * 4 == _BLK and km_op.d == 2 and km_op.m == 4
    assert lp_op.block == _BLK and lp_op.d == 1
    assert sel_a.shape == sel_b.shape == (P, C)

    import os as _os0

    if _os0.environ.get("METERS_TPU_SURROUND_WIDE", "0") == "1":
        return _fused_core_wide(
            x, km_z, zl, sel_a, sel_b, km_op, lp_op, w1, w2,
            interpret=interpret, r_tile=r_tile, k=k,
        )

    x2 = x.reshape(B, C * T)
    z2 = jnp.swapaxes(km_z, 0, 1)  # [C, B, 2]
    zl2 = jnp.swapaxes(zl, 0, 1)  # [C, B, 1]

    rpad = (-B) % 8
    if rpad:
        x2 = jnp.pad(x2, ((0, rpad), (0, 0)))
        z2 = jnp.pad(z2, ((0, 0), (0, rpad), (0, 0)))
        zl2 = jnp.pad(zl2, ((0, 0), (0, rpad), (0, 0)))
    Bp = B + rpad

    import os as _os

    from .pallas_r128 import _pick_tile, _warn_rejected_override

    if r_tile is None:
        env_r = _os.environ.get("METERS_TPU_SURROUND_RTILE")
        if env_r:
            if Bp % int(env_r) == 0:
                r_tile = int(env_r)
            else:
                _warn_rejected_override(
                    "METERS_TPU_SURROUND_RTILE", env_r,
                    f"padded batch {Bp} not divisible")
        if r_tile is None:
            r_tile = _pick_tile(Bp, (128, 64, 32, 16, 8))
    nb = T // _BLK
    if k is None:
        env_k = _os.environ.get("METERS_TPU_SURROUND_K")
        if env_k:
            if nb % int(env_k) == 0:
                k = int(env_k)
            else:
                _warn_rejected_override("METERS_TPU_SURROUND_K", env_k,
                                        f"{nb} blocks not divisible")
        if k is None:
            # y_scr [C, r_tile, k*128] f32 must fit the 16 MB scoped-VMEM
            # budget with room for the x blocks (see pallas_r128 k note)
            kmax = max(1, (6 << 20) // (C * r_tile * _BLK * 4))
            k = _pick_tile(nb, range(min(15, kmax), 0, -1))
    assert Bp % r_tile == 0 and nb % k == 0, (Bp, r_tile, nb, k)
    t_tile = k * _BLK
    nt = T // t_tile
    grid = (Bp // r_tile, nt, C)

    k1h, k1l = _split_bf16_host(lp_op.kmat)  # [128, 128]
    sy1 = np.asarray(lp_op.sy, np.float32)  # [1, 128]
    g1 = np.ascontiguousarray(np.asarray(lp_op.g, np.float32).T)  # [1, 128]
    g2 = np.ascontiguousarray(np.asarray(km_op.g, np.float32).T)  # [2, 128]
    wv = jnp.asarray(ema_weights(w2, T)[None, :])  # [1, T]
    weights = tuple(jnp.asarray(w) for w in (g2, k1h, k1l, sy1, g1))

    vm = pltpu.VMEM
    cmap = lambda r, t, c: (0, 0)
    smap = lambda r, t, c: (c, r, 0)

    in_specs = [
        pl.BlockSpec((r_tile, t_tile), lambda r, t, c: (r, c * nt + t),
                     memory_space=vm),
        pl.BlockSpec((1, r_tile, 2), smap, memory_space=vm),
        pl.BlockSpec((1, r_tile, 1), smap, memory_space=vm),
        pl.BlockSpec((P, C), cmap, memory_space=pltpu.SMEM),
        pl.BlockSpec((P, C), cmap, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, t_tile), lambda r, t, c: (0, t), memory_space=vm),
    ] + [pl.BlockSpec(w.shape, cmap, memory_space=vm) for w in weights]

    eps = 1e-20 / w1
    zout, zlout, pkout, pacc = pl.pallas_call(
        _make_kernel(k, C, P, km_op, lp_op, eps),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, r_tile, 2), smap, memory_space=vm),
            pl.BlockSpec((1, r_tile, 1), smap, memory_space=vm),
            pl.BlockSpec((1, r_tile, 1), smap, memory_space=vm),
            pl.BlockSpec((r_tile, 3 * P), lambda r, t, c: (r, 0),
                         memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, Bp, 2), _F32),
            jax.ShapeDtypeStruct((C, Bp, 1), _F32),
            jax.ShapeDtypeStruct((C, Bp, 1), _F32),
            jax.ShapeDtypeStruct((Bp, 3 * P), _F32),
        ),
        scratch_shapes=[
            pltpu.VMEM((C, r_tile, 2), _F32),
            pltpu.VMEM((C, r_tile, 1), _F32),
            pltpu.VMEM((C, r_tile, 1), _F32),
            pltpu.VMEM((C, r_tile, t_tile), _F32),
            pltpu.VMEM((r_tile, 3 * P), _F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * C * T * 3 * _BLK,
            bytes_accessed=Bp * C * T * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, z2, zl2, sel_a.astype(_F32), sel_b.astype(_F32), wv, *weights)

    zout = jnp.swapaxes(zout, 0, 1)  # [Bp, C, 2]
    zlout = jnp.swapaxes(zlout, 0, 1)
    pkout = jnp.swapaxes(pkout, 0, 1)[..., 0]  # [Bp, C]
    if rpad:
        zout, zlout, pkout, pacc = (
            zout[:B], zlout[:B], pkout[:B], pacc[:B]
        )
    return zout, zlout, pkout, pacc.reshape(B, P, 3)


def available() -> bool:
    """True on a TPU backend (same gate as ops/pallas_r128)."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
