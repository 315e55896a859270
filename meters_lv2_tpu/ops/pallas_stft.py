"""Fused Pallas TPU kernel for the STFT display analyzers (phasewheel /
stereoscope — gui/fft.c:209-237 + gui/phasewheel.c:1307-1342,
gui/stereoscope.c:705-741).

Why a kernel: the XLA path materializes the overlapping frame tensor
[B, 2, F, 8192] and ~6 same-size intermediates in HBM (window product,
rfft workspace, power, phase — a ~4.3x data blowup per pass; profiled
HBM-bound at ~25 full-array passes, docs/BENCHMARKS.md round 4).  Here
frames are sliced, windowed, transformed and analyzed entirely in VMEM;
HBM traffic is one read of the (pre-transposed) input ring and one write
of the per-bin display quantities.

Layout: the caller reshapes the sample stream ext = [tail | x] to
[B, 2, 128, R] (sample n at [n % 128, n // 128] — ONE cheap XLA
transpose).  Because hop % 128 == 0, frame f is then the contiguous
lane-slice ext_t[:, :, :, hop128*(f+1) : +64] with shape [128(n2),
64(n1)], n = 128*n1 + n2 — exactly the transposed orientation the
GEMM DFT wants, so no in-kernel input relayout.

The 8192-point real DFT factors over bins k = k1 + 64*k2 (k1 < 64,
k2 < 64 covers the data_size bins 0..4095):

  stage 1 : Y[(f,n2), k1]  = sum_n1 Xt[(f,n2), n1] * e^{-2pi i n1 k1/64}
            — ONE [F*128, 64] @ [64, 64] dot per re/im part, frames
            batched on sublanes.
  twiddle : T = Y * e^{-2pi i n2 k1 / 8192}   (elementwise, tiled rows)
  reblock : per-frame [128, 64] -> [64, 128] transposes (XLU)
  stage 2 : X[(f,k1), k2] = sum_n2 T2[(f,k1), n2] * e^{-2pi i n2 k2/128}
            — [F*64, 128] @ [128, 64] dots, frames batched on sublanes.

Bin order: out[(f, k1), k2] holds bin k1 + 64*k2; the caller transposes
the trailing [64, 64] and reshapes — b = 64*k2' + k1' in transposed
order — one fused XLA pass.

Precision: Mosaic lowers plain f32 dots to a SINGLE bf16 pass (2e-3 rel
— fails the repo's 2e-4 on-chip STFT power bar, measured on the round-4
GemmRFFT attempt), so the GEMMs run as f32-exact 6-pass 3-way bf16
splits (a 3-pass hi/lo variant, METERS_TPU_STFT_PASSES=3, drops the
lo*lo tier ~2^-18*||frame|| and measurably fails the bar on weak bins —
display thresholds read individual -60 dB bins, so the feed-forward
3-pass rule of the other kernels does NOT transfer).  MXU utilization
comes instead from operator fusion: each stage's cos and sin operators
are concatenated on the output dim so every pass runs 128 lanes wide
(see _dft_mats).  DFT matrices are pre-split on the host.  The analysis
elementwise math (power, atan2, thresholds) is exact f32 VPU.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_BF16 = jnp.bfloat16
_W = 8192  # window size (gui/fft.c fft_bins*2 at the analyzers' 4096)
_D = _W // 2  # data_size


# shared split/pass algebra (ops/bf16split): one home for the precision
# helpers used by every kernel
from .bf16split import (
    dot3 as _dot3,
    dot6 as _dot6,
    split2_host as _split2_host,
    split3_host as _split3_host,
)


def _atan2(y: jax.Array, x: jax.Array) -> jax.Array:
    """Elementwise atan2 from VPU primitives (Mosaic has no atan2
    lowering).  Octant reduction + the Cephes atanf minimax polynomial
    (~1e-7 abs); matches jnp.arctan2 to f32 rounding except y == -0.0
    with x < 0 (returns +pi, not -pi — below any analyzer threshold)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    den = jnp.maximum(ax, ay)
    z = jnp.minimum(ax, ay) / jnp.where(den == 0.0, 1.0, den)
    # z in [0, 1]: fold [tan(pi/8), 1] down via atan(z) = pi/4 + atan((z-1)/(z+1))
    red = z > 0.4142135623730951
    a = jnp.where(red, (z - 1.0) / (z + 1.0), z)
    z2 = a * a
    p = (
        (8.05374449538e-2 * z2 - 1.38776856032e-1) * z2 + 1.99777106478e-1
    ) * z2 - 3.33329491539e-1
    at = a + a * z2 * p + jnp.where(red, 0.7853981633974483, 0.0)
    at = jnp.where(ay > ax, 1.5707963267948966 - at, at)
    at = jnp.where(x < 0.0, 3.141592653589793 - at, at)
    return jnp.where(y < 0.0, -at, at)


def _dft_mats(F: int, passes: int):
    """Host DFT operator stack for the two-stage factorization.

    The cos and sin operators of each stage are CONCATENATED along the
    output (lane) dimension — [64, 128] and [128, 128] — so each MXU pass
    runs at full 128-lane width instead of two half-width [.., 64] dots
    (measured 8.3 -> ~4 ms kernel at B=256; same MACs, half the passes)."""
    split = _split3_host if passes == 6 else _split2_host
    n1 = np.arange(64)
    k1 = np.arange(64)
    a1 = -2.0 * math.pi / 64.0 * np.outer(n1, k1)
    c1 = np.concatenate([np.cos(a1), np.sin(a1)], axis=1)  # [64, 128]
    n2 = np.arange(128)
    at = -2.0 * math.pi / _W * np.outer(n2, k1)  # twiddle [n2, k1]
    twc = np.cos(at).astype(np.float32)
    tws = np.sin(at).astype(np.float32)
    k2 = np.arange(64)
    a2 = -2.0 * math.pi / 128.0 * np.outer(n2, k2)
    w2 = np.concatenate([np.cos(a2), np.sin(a2)], axis=1)  # [128, 128]
    return (
        split(c1),
        twc.astype(np.float32), tws.astype(np.float32),
        split(w2),
    )


def _make_kernel(F: int, hop128: int, mode: str, thr: float, passes: int):
    FR = F * 128  # stacked stage-1 sublanes
    FK = F * 64  # stacked stage-2 sublanes
    ns = 3 if passes == 6 else 2  # split components per operand
    _dot = _dot6 if passes == 6 else _dot3

    def kernel(*refs):
        (ext_ref, win_ref, twc_ref, tws_ref) = refs[:4]
        mats = refs[4 : 4 + 2 * ns]
        outa_ref, outb_ref = refs[4 + 2 * ns : 6 + 2 * ns]
        xt_scr, t2r_scr, t2i_scr = refs[6 + 2 * ns :]
        win = win_ref[...]  # [128, 64] transposed window
        c1f = tuple(r[...] for r in mats[0:ns])  # [64, 128] = [cos|sin]
        w2f = tuple(r[...] for r in mats[ns : 2 * ns])  # [128, 128]
        twc, tws = twc_ref[...], tws_ref[...]  # [n2, k1] base twiddle

        def channel(c):
            # frame extraction: contiguous lane-slices of the transposed
            # ring, windowed on the way into the stacked scratch (static
            # offsets — the frame loop is unrolled)
            for f in range(F):
                sl = ext_ref[0, c, :, pl.ds(hop128 * (f + 1), 64)]
                xt_scr[f * 128 : (f + 1) * 128, :] = sl * win
            xt = xt_scr[...]  # [(f,n2), n1]
            y = _dot(xt, c1f)  # [(f,n2), k1(re) | k1(im)] full-width
            yr, yi = y[:, :64], y[:, 64:]
            # twiddle + reblock: per-frame elementwise complex multiply
            # on the [128, 64] slab, then an XLU transpose into the
            # frames-x-k1-sublane stage-2 layout
            for f in range(F):
                yrf = yr[f * 128 : (f + 1) * 128, :]
                yif = yi[f * 128 : (f + 1) * 128, :]
                t2r_scr[f * 64 : (f + 1) * 64, :] = jnp.transpose(
                    yrf * twc - yif * tws
                )
                t2i_scr[f * 64 : (f + 1) * 64, :] = jnp.transpose(
                    yrf * tws + yif * twc
                )
            t2r = t2r_scr[...]  # [(f,k1), n2]
            t2i = t2i_scr[...]
            u = _dot(t2r, w2f)  # [(f,k1), k2(cos) | k2(sin)]
            v = _dot(t2i, w2f)
            xr = u[:, :64] - v[:, 64:]  # t2r@w2c - t2i@w2s
            xi = u[:, 64:] + v[:, :64]  # t2r@w2s + t2i@w2c
            return xr, xi

        if mode == "raw":
            # pure fused STFT: (re, im) of the channel this grid cell
            # owns (grid is (B, 2) — one channel per cell keeps the cell
            # under the 16 MB scoped-VMEM stack; both-channel raw cells
            # measured 204 KB over).  The analyzer math (power/atan2/
            # thresholds) runs as one fused XLA pass outside — Mosaic's
            # in-kernel atan2 substitute measured 2.4x slower end-to-end
            # (docs/BENCHMARKS.md round 4).
            xr0, xi0 = channel(0)  # block index map selects the channel
            outa_ref[0, 0] = xr0
            outb_ref[0, 0] = xi0
            return
        lr0, li0 = channel(0)
        rr0, ri0 = channel(1)
        pwl = lr0 * lr0 + li0 * li0
        pwr = rr0 * rr0 + ri0 * ri0
        # top data bin (k1=63, k2=63) is zeroed before the threshold test
        # (fft.c ft_analyze leaves it 0)
        row = jax.lax.broadcasted_iota(jnp.int32, (FK, 64), 0) % 64
        col = jax.lax.broadcasted_iota(jnp.int32, (FK, 64), 1)
        top = (row == 63) & (col == 63)
        pwl = jnp.where(top, 0.0, pwl)
        pwr = jnp.where(top, 0.0, pwr)
        if mode == "phasewheel":
            # phase of bins 0 and 4095 forced 0 (fft.c:166-178)
            edge = top | ((row == 0) & (col == 0))
            phl = jnp.where(edge, 0.0, _atan2(li0, lr0))
            phr = jnp.where(edge, 0.0, _atan2(ri0, rr0))
            ok = (pwl >= thr) & (pwr >= thr)
            outa_ref[0] = jnp.where(ok, phr - phl, 0.0)
            outb_ref[0] = jnp.where(ok, jnp.maximum(pwl, pwr), -100.0)
        else:  # stereoscope: per-bin L/R position + level
            lv = jnp.maximum(pwl, pwr)
            ok = (pwl >= thr) | (pwr >= thr)
            pos = 0.5 + 0.5 * (jnp.sqrt(pwr) - jnp.sqrt(pwl)) * jax.lax.rsqrt(
                jnp.maximum(lv, 1e-30)
            )
            outa_ref[0] = jnp.where(ok, pos, 0.5)
            outb_ref[0] = jnp.where(ok, lv, 0.0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("hop", "mode", "thr", "interpret", "passes")
)
def _frames(ext, win_t, *, hop, mode, thr, interpret=False, passes=3):
    B, C, L = ext.shape
    assert C == 2 and L % 128 == 0 and hop % 128 == 0
    F = (L - _W) // hop
    hop128 = hop // 128
    R = L // 128
    ext_t = jnp.swapaxes(ext.reshape(B, 2, R, 128), -1, -2)  # [B,2,128,R]
    mats = _dft_mats(F, passes)
    (c1f, twc, tws, w2f) = mats
    FR, FK = F * 128, F * 64
    vm = pltpu.VMEM
    cm = lambda b: (0, 0)
    consts = [jnp.asarray(twc), jnp.asarray(tws)]
    for tri in (c1f, w2f):
        consts.extend(jnp.asarray(t) for t in tri)
    cspecs = [
        pl.BlockSpec(c.shape, cm, memory_space=vm) for c in consts
    ]
    if mode == "raw":
        grid = (B, 2)
        oshape = (B, 2, FK, 64)
        ospec = pl.BlockSpec((1, 1, FK, 64), lambda b, c: (b, c, 0, 0),
                             memory_space=vm)
        espec = pl.BlockSpec((1, 1, 128, R), lambda b, c: (b, c, 0, 0),
                             memory_space=vm)
        cm = lambda b, c: (0, 0)
        cspecs = [
            pl.BlockSpec(c.shape, cm, memory_space=vm) for c in consts
        ]
    else:
        grid = (B,)
        oshape = (B, FK, 64)
        ospec = pl.BlockSpec((1, FK, 64), lambda b: (b, 0, 0),
                             memory_space=vm)
        espec = pl.BlockSpec((1, 2, 128, R), lambda b: (b, 0, 0, 0),
                             memory_space=vm)
    outa, outb = pl.pallas_call(
        _make_kernel(F, hop128, mode, thr, passes),
        grid=grid,
        in_specs=[
            espec,
            pl.BlockSpec((128, 64), cm, memory_space=vm),
            *cspecs,
        ],
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct(oshape, _F32),
            jax.ShapeDtypeStruct(oshape, _F32),
        ),
        scratch_shapes=[
            pltpu.VMEM((FR, 64), _F32),
            pltpu.VMEM((FK, 128), _F32),
            pltpu.VMEM((FK, 128), _F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 2 * passes * (FR * 64 * 64 * 2 + FK * 128 * 64 * 4),
            bytes_accessed=B * 2 * L * 4 + 2 * B * FK * 64 * 4,
            transcendentals=2 * B * FK * 64 if mode == "phasewheel" else 0,
        ),
        interpret=interpret,
    )(ext_t, win_t, *consts)
    # un-permute bins: out[(f,k1),k2] -> bin k1 + 64 k2
    def to_bins(o):
        lead = o.shape[:-2]
        o = o.reshape(*lead, F, 64, 64)
        return jnp.swapaxes(o, -1, -2).reshape(*lead, F, _D)

    return to_bins(outa), to_bins(outb)


def analyzer_frames(
    ext: jax.Array,
    win: jax.Array,
    hop: int,
    mode: str,
    thr: float,
    interpret: bool = False,
):
    """Per-frame display quantities for one update block.

    Args:
      ext: [..., 2, W + T] sample stream (carried tail + new block),
           T % hop == 0, hop % 128 == 0, W == 8192.
      win: [W] analysis window (fft.make_window).
      mode: 'phasewheel' -> (dphi, level[-100-marked]) per bin;
            'stereoscope' -> (pos, level[0-marked]) per bin;
            'raw' -> ((re_l, im_l), (re_r, im_r)) as two [..., 2, F, 4096]
            arrays (no boundary-bin handling — caller's analysis applies
            it, matching ops.fft.STFT.update).
      thr: power threshold of the ok-test.

    Returns two [..., F, 4096] arrays (see mode).
    """
    *batch, C, L = ext.shape
    ext2 = ext.reshape(-1, C, L)
    win_t = jnp.asarray(win, _F32).reshape(64, 128).T  # [n2, n1]
    # trace-time knob (like METERS_TPU_R128_RTILE).  Default 6 = f32-exact
    # 3-way splits: the 3-pass hi/lo variant drops the lo*lo tier
    # (~2^-18 * ||frame||), which lands at 1.6e-3 rel on weak (-70 dB)
    # bins — over the repo's 2e-4 STFT power bar (measured, interpret
    # suite).  Feed-forward-ness does not save it here because display
    # thresholds read individual weak bins, not aggregates.
    passes = int(os.environ.get("METERS_TPU_STFT_PASSES", "6"))
    assert passes in (3, 6), passes
    a, b = _frames(
        ext2, win_t, hop=hop, mode=mode, thr=float(thr),
        interpret=interpret, passes=passes,
    )
    F = a.shape[-2]
    if mode == "raw":
        return (a.reshape(*batch, 2, F, _D), b.reshape(*batch, 2, F, _D))
    return a.reshape(*batch, F, _D), b.reshape(*batch, F, _D)


def usable(window_size: int, hop: int, T: int) -> bool:
    """Static gate: the kernel covers the analyzers' native geometry.

    The frame count F = T/hop is bounded because every frame's scratch
    and output live in VMEM (~200 KB/frame: FR*64 + 2*FK*128 f32
    scratch + 2*FK*64 output + stage temporaries) against the 16 MB
    scoped-VMEM limit.  F <= 32 keeps the analyzers' native ~1 s blocks
    (F = 25 at 25 fps) on the kernel with ample headroom; longer blocks
    fall back to the XLA rfft path, which handles any T."""
    return (
        window_size == _W
        and hop % 128 == 0
        and T % hop == 0
        and (T + _W) % 128 == 0
        and 0 < T // hop <= 32
    )


def available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def mode_env() -> str:
    return os.environ.get("METERS_TPU_STFT_FUSED", "auto")
