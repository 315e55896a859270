"""Fused Pallas TPU kernel for the EBU R128 hot path.

One pass over the input block computes, per stream:

  * the combined K-weighted power p[t] = sum_c gain_c * y_c[t]^2 — i.e.
    everything the fragment-power machinery consumes
    (ebu_r128_proc.cc:302-337 detect_process + power accumulate),
  * the running max of the 4x-oversampled stream over all channels
    (TruePeakdsp::process_max, truepeakdsp.cc:109-131, as used by
    src/ebulv2.cc:344-347),

carrying the per-channel 4-dim K-weighting filter state and 47-sample
resampler history across blocks.  The math is identical to the unfused
path (ops/lti.lti_scan + ops/resample.upsample4_absmax): the same blocked
state-space operator (128-sample blocks) and the same polyphase block
matrix, evaluated inside one kernel so the 4-byte/sample input is read
from HBM exactly once and the only full-rate output is the 1-per-frame
combined power (C+1 -> 1 passes of HBM traffic vs ~6 for the unfused
XLA graph; docs/BENCHMARKS.md round-2 cost breakdown showed the update
is HBM/pass-bound at production batch sizes).

Layout: streams are rows; the C channels of a stream live in the lane
dimension of one row (x is [B, C*T], a free reshape of [B, C, T]).  The
grid is (row_tiles, time_tiles, channel) with channel INNERMOST: each
program handles one channel's [r_tile, t_tile] window (the x BlockSpec
picks the lane offset from the channel index, so the single input
operand is never duplicated — an early two-operand variant cost a full
94 MB copy per call), and the channel power sum accumulates in the
resident output block across the C channel programs.  TPU grids execute
sequentially, so per-channel filter states, the previous 128-sample
block (the true-peak conv halo) and the running oversampled max persist
in VMEM scratch across time tiles.  Within a program, a static python
loop over 128-sample blocks issues the MXU work: the 128x128 block-
Toeplitz filter GEMM and two stride-64 polyphase frame GEMMs (a 111-tap
frame zero-padded to one 128-lane contraction tile -> 256 output lanes;
see _tp_frame_mats for why this halves the TP MAC count).

Precision (measured on v5e, see docs/BENCHMARKS.md round 3): Mosaic
lowers a plain f32 jnp.dot to a SINGLE bf16 MXU pass (~2e-3 relative —
0.03 dB loudness error, over the ±0.01 budget), and DotAlgorithm presets
are not supported in kernels.  So the big GEMMs run as a manual 3-pass
bf16 split (a@b ~ ah@bh + ah@bl + al@bh — exactly XLA Precision.HIGH,
the suite default, 4.5e-6 relative), with weight splits precomputed on
the host.  The tiny d=4 state recurrences (s@At, s@Sy, x@G) avoid the
MXU entirely: they run as exact-f32 VPU broadcast/reduce chains, so the
per-block state propagation is *more* accurate than the unfused HIGH
GEMM path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 128  # filter/conv block size (samples)
_HL = 24
_NH = 2 * _HL - 1  # 47-sample true-peak conv history
_F32 = jnp.float32


# shared split algebra (ops/bf16split): pure numpy via ml_dtypes — runs
# on host even inside a jit trace, so operator splits embed as
# constants, never tracers (see the ops/lti.py numpy-cache note)
from .bf16split import (
    split2_host as _split_bf16_host,
    split3_host as _split3_host,
)


def _make_kernel(nblk: int, C: int, op, seg_info=None, exact_kw=False):
    """Build the kernel body for one (row_tile, time_tile, channel)
    program.  The small state-space operator At [4,4] is baked in as
    python-float immediates; Sy / G^T and the big GEMM weights arrive as
    refs (Pallas kernels may not capture array constants).

    seg_info = (fragm, n_slots): emit per-FRAGMENT power sums [R, n_slots]
    instead of the full-rate power [R, T].  Each 128-sample block spans at
    most two fragment slots (fragm > 128), so its contribution is two
    masked lane-reduces scattered by per-row one-hot adds into a VMEM
    accumulator — the full-rate p never touches HBM and the consumer's
    [B,T] -> [B,n_slots,fragm] lane-split retile disappears (VERDICT
    round 3 item 6).  An extra int32 input carries the per-row sample
    offset `off` of the open fragment."""
    at = np.asarray(op.at, np.float32)  # [4, 4], s' = s @ at

    nk = 3 if exact_kw else 2  # K-weighting conv operand splits

    def kernel(*refs):
        if seg_info is None:
            (x_ref, z0_ref, hist_ref, gains_ref, sy_ref, gt_ref) = refs[:6]
            kmats = refs[6 : 6 + nk]
            (mth_ref, mtl_ref,
             p_ref, zout_ref, histout_ref, tpmax_ref,
             s_scr, prev_scr, acc_scr) = refs[6 + nk :]
        else:
            (x_ref, off_ref, z0_ref, hist_ref, gains_ref,
             sy_ref, gt_ref) = refs[:7]
            kmats = refs[7 : 7 + nk]
            (mth_ref, mtl_ref,
             p_ref, zout_ref, histout_ref, tpmax_ref,
             s_scr, prev_scr, acc_scr, seg_scr) = refs[7 + nk :]
            fragm, n_slots = seg_info
        t = pl.program_id(1)
        c = pl.program_id(2)

        @pl.when(t == 0)
        def _():
            # entering this channel's first time tile: load carried state
            s_scr[c] = z0_ref[0]
            prev_scr[c] = jnp.zeros_like(prev_scr[c])
            # the 47-sample history is the tail of a virtual previous block
            prev_scr[c, :, _BLK - _NH:] = hist_ref[0]

        @pl.when((t == 0) & (c == 0))
        def _():
            acc_scr[...] = jnp.zeros_like(acc_scr)
            if seg_info is not None:
                seg_scr[...] = jnp.zeros_like(seg_scr)

        gain = gains_ref[c, 0]
        sy_rows = [sy_ref[i: i + 1, :] for i in range(4)]  # [1, 128]
        g_cols = [gt_ref[i: i + 1, :] for i in range(4)]  # [1, 128]
        kms = [r[...] for r in kmats]
        mth, mtl = mth_ref[...], mtl_ref[...]

        def split(a):
            hi = a.astype(jnp.bfloat16)
            return hi, (a - hi.astype(_F32)).astype(jnp.bfloat16)

        dot = functools.partial(jnp.dot, preferred_element_type=_F32)

        def dot3(ahl, bh, bl):
            ah, al = ahl
            return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))

        def conv_kw(xb, x_hl):
            if not exact_kw:
                return dot3(x_hl, kms[0], kms[1])
            # f32-exact 6-pass: 3-way splits both sides, drop <=2^-24 terms
            ah = x_hl[0]
            r = xb - ah.astype(_F32)
            am = r.astype(jnp.bfloat16)
            al = (r - am.astype(_F32)).astype(jnp.bfloat16)
            bh, bm, bl = kms
            return (
                (dot(ah, bl) + dot(al, bh) + dot(am, bm))
                + (dot(ah, bm) + dot(am, bh))
                + dot(ah, bh)
            )

        # this channel's state: four [R, 1] columns (exact-f32 VPU math)
        sc = [s_scr[c, :, i: i + 1] for i in range(4)]
        prev = prev_scr[c]  # [R, 128] previous input block (f32)
        acc = acc_scr[...]  # [R, 256] running |oversampled| max, all chans
        zpad = jnp.zeros((prev.shape[0], _BLK - _TPB - _NH), _F32)

        first = c == 0
        if seg_info is not None:
            R = prev.shape[0]
            off = off_ref[:, :1]  # [R, 1] int32
            lane = jax.lax.broadcasted_iota(jnp.int32, (R, _BLK), 1)
            slots = jax.lax.broadcasted_iota(jnp.int32, (R, n_slots), 1)
            segacc = seg_scr[...]  # [R, n_slots] running fragment sums
            tbase = t * (nblk * _BLK)
        for j in range(nblk):
            xb = x_ref[:, _BLK * j: _BLK * (j + 1)]  # [R, 128]
            x_hl = split(xb)
            # 4x polyphase oversample: two stride-64 frames per block,
            # frame g = [x[64g-47 : 64g+64], 17 zero lanes] @ Mt
            for fr in (
                jnp.concatenate(
                    [prev[:, _BLK - _NH:], xb[:, :_TPB], zpad], axis=1
                ),
                jnp.concatenate([xb[:, _TPB - _NH:], zpad], axis=1),
            ):
                ytp = dot3(split(fr), mth, mtl)  # [R, 256]
                av = jnp.abs(ytp)
                # NaN oversamples are skipped, as the reference's
                # `if (v > m)` comparison does (truepeakdsp.cc:111-122)
                av = jnp.where(av != av, 0.0, av)
                acc = jnp.maximum(acc, av)
            # K-weighting: y = xb@K + s@Sy (VPU); s' = s@At + xb@G
            y = conv_kw(xb, x_hl) + (
                sc[0] * sy_rows[0] + sc[1] * sy_rows[1]
                + sc[2] * sy_rows[2] + sc[3] * sy_rows[3]
            )
            gin = [
                jnp.sum(xb * g_cols[i], axis=1, keepdims=True)
                for i in range(4)
            ]
            sc = [
                at[0, i] * sc[0] + at[1, i] * sc[1]
                + at[2, i] * sc[2] + at[3, i] * sc[3] + gin[i]
                for i in range(4)
            ]
            wy = gain * y * y
            if seg_info is None:
                sl = slice(_BLK * j, _BLK * (j + 1))
                # channel programs revisit the same resident p block:
                # c == 0 initializes, later channels accumulate
                if C == 1:
                    p_ref[:, sl] = wy
                else:
                    p_ref[:, sl] = jnp.where(first, wy, p_ref[:, sl] + wy)
            else:
                # fragment-slot accumulation: this 128-block spans at most
                # two slots (fragm > 128); two masked lane-reduces + one-hot
                # adds into the running [R, n_slots] sums
                pos0 = off + (tbase + _BLK * j)  # [R, 1]
                slot_lo = pos0 // fragm
                bpos = fragm - pos0 % fragm  # lanes < bpos stay in slot_lo
                head = lane < bpos
                hs = jnp.sum(jnp.where(head, wy, 0.0), axis=1, keepdims=True)
                ts = jnp.sum(jnp.where(head, 0.0, wy), axis=1, keepdims=True)
                segacc = (segacc
                          + jnp.where(slots == slot_lo, hs, 0.0)
                          + jnp.where(slots == slot_lo + 1, ts, 0.0))
            prev = xb
            last = xb

        for i in range(4):
            s_scr[c, :, i: i + 1] = sc[i]
        prev_scr[c] = last
        acc_scr[...] = acc
        # small outputs: revisited blocks, the final program's write wins
        zout_ref[0] = s_scr[c]
        histout_ref[0] = last[:, _BLK - _NH:]
        tpmax_ref[...] = jnp.max(acc, axis=1, keepdims=True)
        if seg_info is not None:
            seg_scr[...] = segacc
            p_ref[...] = segacc

    return kernel


_TPB = 64  # true-peak frame stride: two frames per 128-sample block


@functools.lru_cache(maxsize=8)
def _tp_frame_mats() -> tuple[np.ndarray, np.ndarray]:
    """[128, 256] hi/lo bf16 polyphase frame matrix at stride 64.

    A stride-64 frame needs 64+47=111 input samples (zero-padded to one
    128-lane contraction tile) and yields 256 output lanes — 1536 bf16
    MAC/sample at 3-pass vs 3072 for the earlier stride-128 two-matrix
    split, whose second matrix was 81/128 zero rows.  Measured 1.27x on
    a TP-only kernel (docs/BENCHMARKS.md round 3)."""
    from .design import upsample4_kernel
    from .resample import _block_matrix

    taps = upsample4_kernel(_HL).astype(np.float32)
    M = _block_matrix(taps, _TPB)  # [111, 256]
    Mp = np.zeros((_BLK, 4 * _TPB), np.float32)
    Mp[: _TPB + _NH, :] = M
    return _split_bf16_host(Mp)


_warned_overrides: set[str] = set()


def _warn_rejected_override(name: str, value: str, why: str) -> None:
    """Tile-sweep env overrides exist precisely to be honored; a silently
    ignored non-dividing value wastes a 5-10 min TPU compile (ADVICE
    round 3) — warn once per env var."""
    if name not in _warned_overrides:
        _warned_overrides.add(name)
        import warnings

        warnings.warn(
            f"{name}={value} rejected ({why}); falling back to auto tile",
            stacklevel=3,
        )


def _pick_tile(n: int, options) -> int | None:
    for o in options:
        if n % o == 0:
            return o
    return None


def fused_core(
    x: jax.Array,
    z0: jax.Array,
    hist: jax.Array,
    gains: tuple[float, ...],
    op,
    *,
    interpret: bool = False,
    r_tile: int | None = None,
    k: int | None = None,
    off: jax.Array | None = None,
    fragm: int | None = None,
    n_slots: int | None = None,
):
    """Fused K-weighting combined power + true-peak max over one block.

    Args:
      x:     [B, C, T] input streams, T % 128 == 0 — or pre-flattened
             [B, C*T] (channel-major lanes, i.e. reshape(B, C*T) of the
             3D layout).  Passing the flat layout skips the [B,C,T] ->
             [B,C*T] physical retile (the C=2 sublane dim pads on TPU;
             measured 132 us at B=256 x 1 s, docs/BENCHMARKS.md round 3)
             when the producer can lay audio out channel-major directly.
      z0:    [B, C, 4] K-weighting filter state.
      hist:  [B, C, 47] true-peak resampler history.
      gains: per-channel power gains (R128_CHAN_GAIN / mono 2.0), static.
      op:    ops.lti.LTIBlockOp for the K-weighting system at block=128
             (numpy leaves; baked into the kernel as constants).
      off/fragm/n_slots: SEG MODE — when `off` ([B] int32 sample offset of
             the open fragment) is given, the kernel accumulates the
             per-FRAGMENT power sums in VMEM and the first return value is
             seg [B, n_slots] (== ops.segment.shifted_segments(p, off,
             fragm, n_slots, 'sum') up to f32 reduce order) instead of the
             full-rate p [B, T], which then never touches HBM.

    Returns:
      (p [B, T] | seg [B, n_slots], z [B, C, 4], hist [B, C, 47],
      tpmax [B]): combined K-weighted power (or its fragment sums),
      updated states, and the block's max absolute oversampled sample
      over all channels.
    """
    if x.ndim == 2:
        B = x.shape[0]
        C = z0.shape[1]
        T = x.shape[1] // C
        x2 = x
    else:
        B, C, T = x.shape
        # channels ride in the lane dim: one row per stream; the reshape
        # is a physical retile on TPU (see the flat-layout note above)
        x2 = x.reshape(B, C * T)
    assert T % _BLK == 0, (T, _BLK)
    assert C == len(gains)
    assert op.block == _BLK and op.d == 4 and op.m == 1 and op.p == 1
    z2 = jnp.swapaxes(z0, 0, 1)  # [C, B, 4]
    h2 = jnp.swapaxes(hist, 0, 1)  # [C, B, 47]

    seg_mode = off is not None
    if seg_mode:
        assert fragm is not None and n_slots is not None and fragm > _BLK
        off2 = off.astype(jnp.int32).reshape(B, 1)

    rpad = (-B) % 8
    if rpad:
        x2 = jnp.pad(x2, ((0, rpad), (0, 0)))
        z2 = jnp.pad(z2, ((0, 0), (0, rpad), (0, 0)))
        h2 = jnp.pad(h2, ((0, 0), (0, rpad), (0, 0)))
        if seg_mode:
            off2 = jnp.pad(off2, ((0, rpad), (0, 0)))
    Bp = B + rpad

    import os as _os

    if r_tile is None:
        env_r = _os.environ.get("METERS_TPU_R128_RTILE")
        if env_r:
            if Bp % int(env_r) == 0:
                r_tile = int(env_r)
            else:
                _warn_rejected_override("METERS_TPU_R128_RTILE", env_r,
                                        f"padded batch {Bp} not divisible")
        if r_tile is None:
            r_tile = _pick_tile(Bp, (128, 64, 32, 16, 8))
    nb = T // _BLK
    # blocks per time tile: capped at 15 (measured best of the compiling
    # configs; k >= 25 unrolls blow the 16 MB VMEM scoped-allocation
    # budget at r_tile=128).  METERS_TPU_R128_K overrides for tile sweeps.
    if k is None:
        env_k = _os.environ.get("METERS_TPU_R128_K")
        if env_k:
            if nb % int(env_k) == 0:
                k = int(env_k)
            else:
                _warn_rejected_override("METERS_TPU_R128_K", env_k,
                                        f"{nb} blocks not divisible")
        if k is None:
            k = _pick_tile(nb, range(15, 0, -1))
    assert Bp % r_tile == 0 and nb % k == 0, (Bp, r_tile, nb, k)
    t_tile = k * _BLK
    nt = T // t_tile
    grid = (Bp // r_tile, nt, C)

    # big-GEMM weights, pre-split hi/lo bf16 on the host (kmat is stored
    # transposed by build_lti_block_op so y = u @ kmat directly).
    # METERS_TPU_R128_EXACT=1: the K-weighting conv runs f32-exact 6-pass
    # 3-way splits instead of 3-pass HIGH — for knife-edge parity runs
    # (the measured 96 kHz -14.55 LUFS bin flip); costs ~3 extra MXU
    # passes per block (docs/BENCHMARKS.md round 4)
    exact_kw = _os.environ.get("METERS_TPU_R128_EXACT", "0") == "1"
    if exact_kw:
        kmats = _split3_host(op.kmat)
    else:
        kmats = _split_bf16_host(op.kmat)  # [128, 128] hi/lo
    mth, mtl = _tp_frame_mats()  # [128, 256]
    sy = np.asarray(op.sy, np.float32)  # [4, 128]
    gt = np.ascontiguousarray(np.asarray(op.g, np.float32).T)  # [4, 128]
    weights = tuple(
        jnp.asarray(w) for w in (sy, gt, *kmats, mth, mtl)
    )
    gvec = jnp.asarray(np.asarray(gains, np.float32)[:, None])  # [C, 1]

    vm = pltpu.VMEM
    cmap = lambda r, t, c: (0, 0)
    smap = lambda r, t, c: (c, r, 0)  # channel-major per-channel states

    in_specs = [
        # one operand; the channel picks the lane-block offset
        pl.BlockSpec((r_tile, t_tile), lambda r, t, c: (r, c * nt + t),
                     memory_space=vm),
    ]
    args = [x2]
    if seg_mode:
        in_specs.append(
            pl.BlockSpec((r_tile, 1), lambda r, t, c: (r, 0),
                         memory_space=vm)
        )
        args.append(off2)
    in_specs += [
        pl.BlockSpec((1, r_tile, 4), smap, memory_space=vm),
        pl.BlockSpec((1, r_tile, _NH), smap, memory_space=vm),
        pl.BlockSpec((C, 1), lambda r, t, c: (0, 0),
                     memory_space=pltpu.SMEM),
    ] + [
        pl.BlockSpec(w.shape, cmap, memory_space=vm) for w in weights
    ]
    args += [z2, h2, gvec, *weights]
    if seg_mode:
        p_spec = pl.BlockSpec((r_tile, n_slots), lambda r, t, c: (r, 0),
                              memory_space=vm)
        p_shape = jax.ShapeDtypeStruct((Bp, n_slots), _F32)
        extra_scratch = [pltpu.VMEM((r_tile, n_slots), _F32)]
    else:
        p_spec = pl.BlockSpec((r_tile, t_tile), lambda r, t, c: (r, t),
                              memory_space=vm)
        p_shape = jax.ShapeDtypeStruct((Bp, T), _F32)
        extra_scratch = []

    p, zout, histout, tpmax = pl.pallas_call(
        _make_kernel(k, C, op, (fragm, n_slots) if seg_mode else None,
                     exact_kw),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            p_spec,
            pl.BlockSpec((1, r_tile, 4), smap, memory_space=vm),
            pl.BlockSpec((1, r_tile, _NH), smap, memory_space=vm),
            pl.BlockSpec((r_tile, 1), lambda r, t, c: (r, 0),
                         memory_space=vm),
        ),
        out_shape=(
            p_shape,
            jax.ShapeDtypeStruct((C, Bp, 4), _F32),
            jax.ShapeDtypeStruct((C, Bp, _NH), _F32),
            jax.ShapeDtypeStruct((Bp, 1), _F32),
        ),
        scratch_shapes=[
            pltpu.VMEM((C, r_tile, 4), _F32),
            pltpu.VMEM((C, r_tile, _BLK), _F32),
            pltpu.VMEM((r_tile, 4 * _TPB), _F32),
        ] + extra_scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * C * T * 3 * (_BLK + 2 * 4 * _BLK),
            bytes_accessed=Bp * T * (C + (0 if seg_mode else 1)) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)

    zout = jnp.swapaxes(zout, 0, 1)  # [Bp, C, 4]
    histout = jnp.swapaxes(histout, 0, 1)
    if rpad:
        p, zout, histout, tpmax = (
            p[:B], zout[:B], histout[:B], tpmax[:B]
        )
    return p, zout, histout, tpmax[:, 0]


def available() -> bool:
    """True on a TPU backend (same gate as ops/pallas_ballistics)."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
