"""Fused Pallas TPU kernel for the bit-meter IEEE-754 field statistics.

The XLA bitmeter path (models/bitmeter.py + ops/swar.py) is element-op
bound at ~9.7k x realtime: the 19 positional-count trees each stream the
block through HBM several times (masks, group-sum reshapes).  This
kernel computes EVERY counter in one pass over the input held in VMEM:

  * flag counts (NaN/Inf/denormal/zero/positive), |min|/|max| of normals
    (float_stats, src/bitmeter.c:63-105),
  * the 280-position absolute-bit exposure (`hit`) and set-bit (`one`)
    counts — the per-sample 24-bit field shifted by the effective
    exponent, spread over nine 32-bit word slots,
  * the 23 per-mantissa-bit set counts (`dset`),

using the same carry-free SWAR width-doubling tree as ops/swar.py but
with TIME ON THE SUBLANE AXIS (the input arrives transposed [T, B]), so
every group-sum is a power-of-2 sublane reshape — the layout TPU relayouts
handle natively.  Group sizes (2, 4, 16) keep every slot within capacity:
bits <= 1, 2-bit slots sum 2 -> <= 2, 4-bit slots sum 4 -> <= 8, 8-bit
slots sum 16 -> <= 128 < 255.

The kernel returns BLOCK DELTAS (sums over the T axis, unconditional);
the integration gate (2^31 cap / transport) is applied by the caller,
matching models/bitmeter.py's `run` semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# masks as int32: Mosaic has no uint32 reductions, and int32 two's-
# complement adds/shifts are bit-identical here — every right-shift is
# masked below the sign-extension bits (the mask top bits are 0)
_M1 = np.int32(0x55555555)
_M2 = np.int32(0x33333333)
_M4 = np.int32(0x0F0F0F0F)

# time-tile (sublanes); % 128 == 0 for the 2*4*16 group chain.  1024
# keeps the 18 unrolled SWAR trees' stage temporaries inside the 16 MB
# scoped-VMEM stack (2048 measured 20.6 MB)
_TT = 1024
NPOS = 280
_NW = 9  # word slots for the shifted 24-bit field


def _tree_rows(w):
    """SWAR positional count of one word-slot array w [S, B] int32 ->
    list of 32 rows [1, B] int32 in bit-position order."""
    S = w.shape[0]

    def gs(v, g):
        # explicit slice adds, not jnp.sum: elementwise int32 adds lower
        # on the VPU (integer reductions over the sublane axis don't)
        v = v.reshape(v.shape[0] // g, g, v.shape[1])
        out = v[:, 0, :]
        for i in range(1, g):
            out = out + v[:, i, :]
        return out

    # stage 1: even/odd bits -> 2-bit slots; sum pairs (<= 2)
    s1 = [gs(w & _M1, 2), gs((w >> 1) & _M1, 2)]
    # stage 2: -> 4-bit slots; sum fours (<= 8)
    s2 = [gs(f(v), 4) for v in s1 for f in
          (lambda a: a & _M2, lambda a: (a >> 2) & _M2)]
    # stage 3: -> 8-bit slots; sum sixteens (<= 128)
    s3 = [gs(f(v), 16) for v in s2 for f in
          (lambda a: a & _M4, lambda a: (a >> 4) & _M4)]
    rows = [None] * 32
    for sidx, v in enumerate(s3):
        # stream index bits encode (p>>2 & 1, p>>1 & 1, p & 1) — same
        # mapping as ops/swar.positional_count
        low3 = ((sidx & 1) << 2) | (sidx & 2) | ((sidx >> 2) & 1)
        v32 = v.astype(jnp.int32)
        for beta in range(4):
            rows[(beta << 3) | low3] = (
                ((v32 >> (8 * beta)) & 0xFF).sum(0, keepdims=True)
            )
    return rows


def _make_kernel(nblk: int):
    def kernel(x_ref, hit_ref, one_ref, dset_ref, flags_ref,
               vmin_ref, vmax_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            hit_ref[...] = jnp.zeros_like(hit_ref)
            one_ref[...] = jnp.zeros_like(one_ref)
            dset_ref[...] = jnp.zeros_like(dset_ref)
            flags_ref[...] = jnp.zeros_like(flags_ref)
            vmin_ref[...] = jnp.full_like(vmin_ref, jnp.inf)
            vmax_ref[...] = jnp.zeros_like(vmax_ref)

        # fori over blocks (NOT a python unroll — the 18 SWAR trees'
        # temporaries would stack per unrolled iteration); all counters
        # accumulate through the out refs, so the carry is empty
        def block_step(j, _):
            xb = x_ref[pl.ds(j * _TT, _TT), :]  # [S, B] f32
            bits = jax.lax.bitcast_convert_type(xb, jnp.int32)
            exp = (bits >> 23) & 0xFF  # arithmetic-shift fill masked off
            man = bits & 0x7FFFFF
            neg = bits < 0

            is_inf = (exp == 255) & (man == 0)
            is_nan = (exp == 255) & (man != 0)
            is_zero = (exp == 0) & (man == 0)
            is_den = (exp == 0) & (man != 0)
            is_num = (exp != 255) & ~is_zero
            is_norm = is_num & (exp > 0)

            cnt = lambda m: m.astype(jnp.int32).sum(0, keepdims=True)
            fl = jnp.concatenate(
                [cnt(is_nan), cnt(is_inf), cnt(is_den), cnt(is_zero),
                 cnt(~neg & is_num),
                 jnp.zeros((3, xb.shape[1]), jnp.int32)], axis=0,
            )
            flags_ref[...] += fl

            av = jnp.abs(xb)
            vmax_ref[...] = jnp.maximum(
                vmax_ref[...],
                jnp.max(jnp.where(is_norm, av, 0.0), 0, keepdims=True),
            )
            vmin_ref[...] = jnp.minimum(
                vmin_ref[...],
                jnp.min(jnp.where(is_norm, av, jnp.inf), 0, keepdims=True),
            )

            # absolute-position fields (denormals use exp=1, normals add
            # the implicit leading 1 — bitmeter.c:97-99)
            e_eff = jnp.where(exp > 0, exp, 1)
            one24 = jnp.where(
                is_num, jnp.where(is_norm, man | (1 << 23), man), 0
            )
            hit24 = jnp.where(
                is_num,
                jnp.where(is_norm, jnp.int32(0xFFFFFF), jnp.int32(0x7FFFFF)),
                0,
            )
            s = e_eff & 31
            widx = e_eff >> 5

            for v24, out in ((one24, one_ref), (hit24, hit_ref)):
                lo = v24 << s
                # v24 is positive, so >> is a logical shift here; s == 0
                # (shift by 32) is masked out
                hi = jnp.where(s == 0, 0, v24 >> (32 - s))
                for w in range(_NW):
                    wv = (
                        jnp.where(widx == w, lo, 0)
                        | jnp.where(widx == w - 1, hi, 0)
                    )
                    rows = _tree_rows(wv)
                    out[32 * w : 32 * (w + 1), :] += jnp.concatenate(
                        rows, axis=0
                    )

            drows = _tree_rows(jnp.where(is_num, man, 0))
            dset_ref[...] += jnp.concatenate(drows, axis=0)
            return 0

        jax.lax.fori_loop(0, nblk, block_step, 0)

    return kernel


def _pick_tile(n, options):
    for o in options:
        if n % o == 0:
            return o
    return None


def fused_stats(x: jax.Array, *, interpret: bool = False,
                b_tile: int | None = None, k: int | None = None):
    """All bit-meter counter deltas for block x [B, T] in one kernel pass.

    T must be a multiple of _TT = 1024 (callers chain an XLA tail for
    the rest; the tile was halved from 2048 for the 16 MB VMEM limit).
    Returns dict(hit [B,280] i32, one [B,280] i32, dset [B,23] i32,
    nan/inf/den/zero/pos [B] i32, vmin/vmax [B] f32) — unconditional
    block sums; apply the integration gate outside.
    """
    B, T = x.shape
    assert T % _TT == 0, (T, _TT)
    xt = x.T  # [T, B] — time on sublanes

    bpad = (-B) % 8
    if bpad:
        xt = jnp.pad(xt, ((0, 0), (0, bpad)))
    Bp = B + bpad
    if b_tile is None:
        b_tile = _pick_tile(Bp, (128, 64, 32, 16, 8))
    nbt = T // _TT
    if k is None:
        k = _pick_tile(nbt, range(8, 0, -1))  # fori body: stack is O(1)
    t_tile = k * _TT
    nt = T // t_tile
    grid = (Bp // b_tile, nt)

    vm = pltpu.VMEM
    omap = lambda b, t: (0, b)

    hit, one, dset, flags, vmin, vmax = pl.pallas_call(
        _make_kernel(k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_tile, b_tile), lambda b, t: (t, b),
                         memory_space=vm),
        ],
        out_specs=tuple(
            pl.BlockSpec((r, b_tile), omap, memory_space=vm)
            for r in (32 * _NW, 32 * _NW, 32, 8, 1, 1)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((32 * _NW, Bp), jnp.int32),
            jax.ShapeDtypeStruct((32 * _NW, Bp), jnp.int32),
            jax.ShapeDtypeStruct((32, Bp), jnp.int32),
            jax.ShapeDtypeStruct((8, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ),
        interpret=interpret,
    )(xt)

    return {
        "hit": hit.T[:B, :NPOS],
        "one": one.T[:B, :NPOS],
        "dset": dset.T[:B, :23],
        "nan": flags[0, :B],
        "inf": flags[1, :B],
        "den": flags[2, :B],
        "zero": flags[3, :B],
        "pos": flags[4, :B],
        "vmin": vmin[0, :B],
        "vmax": vmax[0, :B],
    }


def available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
