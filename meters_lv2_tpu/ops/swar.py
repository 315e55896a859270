"""SWAR bit-sliced counting for per-sample statistics on TPU.

Several meters need PER-SAMPLE counting at full audio rate: the bit
meter counts every mantissa/exponent bit position (src/bitmeter.c:63-105)
and the signal-distribution histogram bins every sample
(src/sigdistlv2.c:303-326).  A one-hot formulation (ops/hist.bincount)
costs O(T * nbins) compares — fine for the R128 gating histograms (a few
points per second) but ~100 ms/s-batch when applied per sample.

This module counts set bits per BIT POSITION across the time axis in
O(T * passes) with a carry-free width-doubling tree (SWAR —
"SIMD within a register"):

  1. de-interleave even/odd bits -> 2 streams of 2-bit slots (capacity 3)
  2. sum groups of 3 words       -> slots hold <= 3
  3. de-interleave 2->4 bit      -> 4 streams (capacity 15), sum 5s
  4. de-interleave 4->8 bit      -> 8 streams (capacity 255), sum 17s
  5. extract bytes, final int32 sum over the residual axis

Every stage is a reshape-sum / mask — no scans, no scatters, no one-hot
expansion; data volume shrinks geometrically (total ~4 passes over the
input).  A value-histogram then falls out by first encoding each sample
as a one-hot BIT (value v -> bit v%32 of word v//32) and positional-
counting the words.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_M1 = np.uint32(0x55555555)
_M2 = np.uint32(0x33333333)
_M4 = np.uint32(0x0F0F0F0F)


def _group_sum(v: jax.Array, g: int) -> jax.Array:
    """Sum along time in groups of g (pads with zeros): [..., T] ->
    [..., ceil(T/g)]."""
    T = v.shape[-1]
    pad = (-T) % g
    if pad:
        v = jnp.concatenate(
            [v, jnp.zeros((*v.shape[:-1], pad), v.dtype)], -1
        )
    return v.reshape(*v.shape[:-1], -1, g).sum(-1)


def positional_count(wv: jax.Array) -> jax.Array:
    """Count set bits per position over the last axis.

    wv: [..., T] uint32.  Returns [..., 32] int32 with
    out[..., p] = sum_t (wv[..., t] >> p) & 1, exact for T < 2^31.
    """
    wv = wv.astype(jnp.uint32)
    # stage 1: even/odd bit streams; 2-bit slots
    streams = [wv & _M1, (wv >> 1) & _M1]  # stream index = p & 1
    streams = [_group_sum(s, 3) for s in streams]  # slots <= 3
    # stage 2: 2-bit -> 4-bit slots
    streams = [f(s) for s in streams for f in
               (lambda a: a & _M2, lambda a: (a >> 2) & _M2)]
    # ordering note: after this, stream index bits are (p>>1 & 1, p & 1)
    streams = [_group_sum(s, 5) for s in streams]  # slots <= 15
    # stage 3: 4-bit -> 8-bit slots
    streams = [f(s) for s in streams for f in
               (lambda a: a & _M4, lambda a: (a >> 4) & _M4)]
    streams = [_group_sum(s, 17) for s in streams]  # slots <= 255
    # final: accumulate bytes in int32 over the residual axis
    cols: list = [None] * 32
    for sidx, s in enumerate(streams):
        # stream index bits encode (p>>2 & 1, p>>1 & 1, p & 1)
        low3 = ((sidx & 1) << 2) | (sidx & 2) | ((sidx >> 2) & 1)
        s32 = s.astype(jnp.int32)
        for beta in range(4):
            cols[(beta << 3) | low3] = (
                (s32 >> (8 * beta)) & 0xFF
            ).sum(-1, dtype=jnp.int32)
    return jnp.stack(cols, axis=-1)


def positional_count_words(words: list[jax.Array]) -> jax.Array:
    """positional_count over a list of word slots -> [..., 32*len]."""
    return jnp.concatenate([positional_count(w) for w in words], -1)


def value_histogram(idx: jax.Array, nbins: int) -> jax.Array:
    """Per-sample value histogram via SWAR counting.

    idx: [..., T] int32 bin indices; entries outside [0, nbins) are
    ignored.  Returns [..., nbins] int32 counts.  Work is
    O(T * ceil(nbins/32) / 8) word-ops — for a few hundred bins this
    beats the one-hot matmul by the bins/32 factor.
    """
    nw = (nbins + 31) // 32
    ok = (idx >= 0) & (idx < nbins)
    idx = jnp.where(ok, idx, 0)
    bit = jnp.where(ok, jnp.uint32(1), jnp.uint32(0)) << (
        idx.astype(jnp.uint32) & 31
    )
    widx = idx >> 5
    counts = []
    for w in range(nw):
        counts.append(positional_count(
            jnp.where(widx == w, bit, jnp.uint32(0))
        ))
    return jnp.concatenate(counts, -1)[..., :nbins]
