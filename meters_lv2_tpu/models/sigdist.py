"""Signal-distribution histogram (SigDistHist).

Reference: src/sigdistlv2.c — 361-bin histogram of raw sample values
(bin = rint(180 + v*150), out-of-range dropped), histogram peak bin/count,
running sum and Welford variance, integration gated by transport/UI with a
2^31-point cap (:287-326).

TPU design: per-block binning via the one-hot-matmul histogram (ops.hist);
the running variance uses the parallel (Chan) merge of per-block moments —
numerically better than the reference's sequential double-precision Welford
and well within tolerance.

Reference quirk opt-in: the reference's running-variance count is the GLOBAL
sample index (`cnt_a = integration_time + s + 1`, sigdistlv2.c:317), which
keeps advancing for out-of-range samples even though their values are
skipped (`if (bin < 0) continue;`) — so with clipping-hot material the
variance denominator is inflated relative to the accepted-sample count.
``SigDistMeter(reference_oor_count=True)`` reproduces that semantics
exactly (same pattern as ``EbuR128Meter(reference_radar=True)``): the
quirky per-sample mean recurrence is a first-order affine chain, run as a
``lax.associative_scan`` prefix composition rather than a serial loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import hist as hist_ops
from .base import register

DIST_BIN = 361
DIST_RANGE = 150.0
DIST_ZERO = 180.0
_CAP = 2147483647


@dataclasses.dataclass(frozen=True)
class SigDistState:
    hist: jax.Array  # [..., 361] int32 counts (reference: int, :298)
    n: jax.Array  # [...] int32 count of integrated in-range samples
    mean: jax.Array  # [...] f32 running mean (of all samples)
    m2: jax.Array  # [...] f32 running M2
    total: jax.Array  # [...] f32 running sum (reference reports avg as sum)
    time: jax.Array  # [...] int32 integration time in samples (all samples;
    # the reference itself caps acquisition at 2^31 points, :288-295)
    integrating: jax.Array  # [...] bool


jax.tree_util.register_dataclass(
    SigDistState,
    data_fields=["hist", "n", "mean", "m2", "total", "time", "integrating"],
    meta_fields=[],
)


@register("SigDistHist")
class SigDistMeter:
    def __init__(self, fs: float, dtype=jnp.float32,
                 reference_oor_count: bool = False):
        self.fs = float(fs)
        self.dtype = dtype
        # Reproduce the reference's out-of-range Welford count semantics
        # (sigdistlv2.c:316-318); see module docstring.
        self.reference_oor_count = bool(reference_oor_count)

    def init(self, batch_shape=()) -> SigDistState:
        z = jnp.zeros(batch_shape, self.dtype)
        zi = jnp.zeros(batch_shape, jnp.int32)
        return SigDistState(
            hist=jnp.zeros((*batch_shape, DIST_BIN), jnp.int32),
            n=zi, mean=z, m2=z, total=z,
            time=zi,
            integrating=jnp.ones(batch_shape, bool),
        )

    def update(self, state: SigDistState, x: jax.Array) -> SigDistState:
        *batch, T = x.shape
        run = state.integrating & (state.time < _CAP - T)
        bins = jnp.round(DIST_ZERO + x * DIST_RANGE).astype(jnp.int32)
        ok = (bins >= 0) & (bins < DIST_BIN) & run[..., None]
        hist = state.hist + hist_ops.bincount(
            jnp.where(ok, bins, -1), DIST_BIN, dtype=jnp.int32, radix=64
        )
        # variance/average integrate ALL samples while running (the
        # histogram drops out-of-range bins but avg/var do not,
        # sigdistlv2.c:303-318 — avg += val before the bin check?  No:
        # `if (bin < 0) continue;` skips avg too; match that).
        if self.reference_oor_count:
            mean, m2 = self._oor_welford(state, x, ok)
            n = state.n + ok.sum(-1, dtype=jnp.int32)
        else:
            nb, mb, m2b = hist_ops.welford_block(x, ok)
            n, mean, m2 = hist_ops.welford_merge(
                (state.n, state.mean, state.m2), (nb, mb, m2b)
            )
        total = state.total + jnp.where(ok, x, 0.0).sum(-1)
        time = state.time + jnp.where(run, T, 0)
        return SigDistState(
            hist=hist, n=n, mean=mean, m2=m2, total=total, time=time,
            integrating=state.integrating,
        )

    def _oor_welford(self, state: SigDistState, x: jax.Array, ok: jax.Array):
        """Reference-exact Welford chain (sigdistlv2.c:313-318).

        The count is the global sample index INCLUDING skipped out-of-range
        samples (`cnt_a = integration_time + s + 1`); skipped samples leave
        (var_m, var_s) untouched.  Each accepted sample applies the affine
        map m -> (1 - 1/cnt)*m + val/cnt, a skipped one the identity — so
        the per-sample mean trajectory is a prefix composition of affine
        maps, computed with `lax.associative_scan` (log-depth, no serial
        loop), then var_s increments close over (val - m_t)(val - m_{t-1}).
        """
        U, B = self._oor_maps(x, ok, state.time)
        m0 = state.mean[..., None]
        m = m0 - U * m0 + B  # var_m AFTER sample t
        m_prev = jnp.concatenate(
            [state.mean[..., None], m[..., :-1]], axis=-1
        )
        var_s_inc = jnp.where(ok, (x - m) * (x - m_prev), 0.0).sum(-1)
        return m[..., -1], state.m2 + var_s_inc

    @staticmethod
    def _oor_maps(x: jax.Array, ok: jax.Array, time0: jax.Array):
        """Prefix composition (U, B) of the quirk mean's per-sample affine
        maps m -> (1-u) m + b, u/b carried in complement form (see
        _oor_welford).  time0: [...] int32 global sample count BEFORE this
        block (may be traced — the sequence-parallel path passes each time
        shard's absolute offset).  Exposed so parallel.meters_sharded can
        compose the quirk chain across shards: the maps are independent of
        the entry mean, so shard k's entry is the fold of shards < k's
        end-of-block maps applied to the stream-start mean."""
        T = x.shape[-1]
        # 1-based global index of each sample, counting out-of-range too
        cnt = (time0[..., None]
               + jnp.arange(1, T + 1, dtype=jnp.int32)).astype(x.dtype)
        # the affine map's multiplier is carried in COMPLEMENT form
        # u = 1/cnt (a = 1 - u): computing a directly would round
        # 1 - 1/cnt to exactly 1.0f past cnt ~ 2^24 (f32 eps), freezing
        # the mean recurrence ~6 min into a 48 kHz integration; u stays
        # representable down to 1/2^31.  Residual deviation from the
        # reference's double recurrence is then ordinary f32 state
        # rounding (~1e-7 rel per block), not a collapse.
        u = jnp.where(ok, 1.0 / cnt, 0.0)
        b = jnp.where(ok, x / cnt, 0.0)

        def comp(p, q):  # apply p first, then q; a = 1 - u throughout
            u1, b1 = p
            u2, b2 = q
            return u1 + u2 - u1 * u2, b1 - u2 * b1 + b2

        U, B = jax.lax.associative_scan(comp, (u, b), axis=-1)
        return U, B

    def read(self, state: SigDistState):
        """sdh_histogram atom contents (sigdistlv2.c:332-355)."""
        peak_cnt = jnp.max(state.hist, -1)
        peak_bin = jnp.argmax(state.hist, -1)
        return {
            "hist": state.hist,
            "hist_max": peak_cnt,
            "hist_peak_bin": peak_bin,
            "hist_avg": state.total,  # reference transmits the running sum
            "hist_var": state.m2,  # reference transmits var_s (sum of sq dev)
            "integration_time": state.time,
            "mean": state.mean,
            # the reference UI divides var_s by (integration_spl - 1), i.e.
            # ALL samples incl. out-of-range (gui/sdhmeter.c:316); our
            # default mode divides by the accepted-sample count
            "variance": state.m2 / jnp.maximum(
                (state.time if self.reference_oor_count else state.n)
                .astype(state.m2.dtype) - 1.0, 1.0),
        }, state

    def reset(self, state: SigDistState) -> SigDistState:
        return self.init(state.n.shape)

    def integrate(self, state: SigDistState, on: bool) -> SigDistState:
        return dataclasses.replace(
            state, integrating=jnp.full_like(state.integrating, on)
        )
