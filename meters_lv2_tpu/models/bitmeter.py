"""Bit meter: IEEE-754 field statistics of the sample stream.

Reference: src/bitmeter.c (float_stats, :63-105): per sample, decode
sign/exponent/mantissa; count NaN/Inf/zero/denormal/positive; track |min|
and |max| of normals; and maintain three histogram regions in one array
(layout src/uris.h:52-60):

  hit[j], j = exp + k (k = 0..22 mantissa bits, plus the implicit leading
           bit at k = 23 for normals)  — absolute-bit-position exposure
  one[j]  — same positions, counted only when the bit is set
  dset[k] — per-mantissa-bit set counts

TPU design: bit field extraction is vectorized int ops on a bitcast view.
The absolute-position statistics build the per-sample 280-bit field
DIRECTLY: `one` counts the bits of (mantissa | implicit-lead) << exp and
`hit` the bits of a 23/24-bit all-ones run << exp, each spread over nine
32-bit word slots and counted per position with the SWAR width-doubling
tree (ops/swar.positional_count) — O(T) word ops, no one-hot expansion.
(The previous formulation — 23 masked 256-bin exponent bincounts — cost
~400 ms per 1024x1s batch; this runs ~3.5x faster, and the same word
construction would drop into a Pallas kernel if bitmeter ever became a
primary-path meter.)
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

from ..ops import pallas_bitmeter, swar
from .base import register

NPOS = 280  # hit/one position range (matches reference region width)
_CAP = 2147483647


@dataclasses.dataclass(frozen=True)
class BitMeterState:
    hit: jax.Array  # [..., 280] int32 absolute-bit-position exposure counts
    one: jax.Array  # [..., 280] int32 set-bit counts at those positions
    dset: jax.Array  # [..., 23] int32 per-mantissa-bit set counts
    nan: jax.Array  # [...] int32 counters (reference: int, bitmeter.c:75-105;
    # exact past 2^24 where f32 increments would stall)
    inf: jax.Array
    den: jax.Array
    zero: jax.Array
    pos: jax.Array
    vmin: jax.Array
    vmax: jax.Array
    time: jax.Array  # [...] int32
    integrating: jax.Array  # [...] bool


jax.tree_util.register_dataclass(
    BitMeterState,
    data_fields=[
        "hit", "one", "dset", "nan", "inf", "den", "zero", "pos",
        "vmin", "vmax", "time", "integrating",
    ],
    meta_fields=[],
)


@register("bitmeter")
class BitMeter:
    def __init__(self, fs: float, averaging: bool = True, dtype=jnp.float32):
        self.fs = float(fs)
        self.averaging = averaging
        self.dtype = dtype

    def init(self, batch_shape=()) -> BitMeterState:
        zi = jnp.zeros(batch_shape, jnp.int32)
        return BitMeterState(
            hit=jnp.zeros((*batch_shape, NPOS), jnp.int32),
            one=jnp.zeros((*batch_shape, NPOS), jnp.int32),
            dset=jnp.zeros((*batch_shape, 23), jnp.int32),
            nan=zi, inf=zi, den=zi, zero=zi, pos=zi,
            vmin=jnp.full(batch_shape, jnp.inf, self.dtype),
            vmax=jnp.zeros(batch_shape, self.dtype),
            time=zi,
            integrating=jnp.ones(batch_shape, bool),
        )

    @property
    def _fused_mode(self) -> str:
        return os.environ.get("METERS_TPU_BITMETER_FUSED", "auto")

    def _use_fused(self, T: int) -> bool:
        """Fused Pallas stats kernel (ops/pallas_bitmeter): auto on TPU
        for blocks >= _TT (1024) samples; the kernel covers the
        _TT-aligned bulk, any remainder chains through the XLA path."""
        mode = self._fused_mode
        if mode == "0" or T < pallas_bitmeter._TT:
            return False
        if mode in ("1", "interpret"):
            return True
        return pallas_bitmeter.available()

    def update(self, state: BitMeterState, x: jax.Array) -> BitMeterState:
        *batch, T = x.shape
        # one gate for the whole call (reference: per-process() acquisition
        # stop at INT_MAX) — both the kernel bulk and any XLA tail use it
        run = state.integrating & (state.time < _CAP - T)
        if self._use_fused(T):
            tt = pallas_bitmeter._TT
            Tm = (T // tt) * tt
            d = pallas_bitmeter.fused_stats(
                x[..., :Tm].reshape(-1, Tm),
                interpret=self._fused_mode == "interpret",
            )
            d = {
                k: v.reshape(*batch, *v.shape[1:]) for k, v in d.items()
            }
            runx = run[..., None]
            gi = lambda old, delta: old + jnp.where(
                runx if delta.ndim > run.ndim else run, delta, 0
            )
            state = BitMeterState(
                hit=gi(state.hit, d["hit"]),
                one=gi(state.one, d["one"]),
                dset=gi(state.dset, d["dset"]),
                nan=gi(state.nan, d["nan"]),
                inf=gi(state.inf, d["inf"]),
                den=gi(state.den, d["den"]),
                zero=gi(state.zero, d["zero"]),
                pos=gi(state.pos, d["pos"]),
                vmin=jnp.where(
                    run, jnp.minimum(state.vmin, d["vmin"]), state.vmin
                ),
                vmax=jnp.where(
                    run, jnp.maximum(state.vmax, d["vmax"]), state.vmax
                ),
                time=state.time + jnp.where(run, Tm, 0),
                integrating=state.integrating,
            )
            if Tm < T:
                state = self._accumulate(state, x[..., Tm:], run, T - Tm)
            return state
        return self._accumulate(state, x, run, T)

    def _accumulate(
        self, state: BitMeterState, x: jax.Array, run: jax.Array, T: int
    ) -> BitMeterState:
        """XLA path: SWAR bit-sliced counting (see module docstring)."""
        runx = run[..., None]

        bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
        exp = ((bits >> 23) & 0xFF).astype(jnp.int32)
        man = (bits & 0x7FFFFF).astype(jnp.int32)
        neg = (bits >> 31) == 1

        is_inf = (exp == 255) & (man == 0)
        is_nan = (exp == 255) & (man != 0)
        is_zero = (exp == 0) & (man == 0)
        is_den = (exp == 0) & (man != 0)
        is_num = (exp != 255) & ~is_zero  # participates in bit stats
        is_norm = is_num & (exp > 0)

        cnt = lambda m: (m & runx).sum(-1, dtype=jnp.int32)
        nan = state.nan + cnt(is_nan)
        inf = state.inf + cnt(is_inf)
        den = state.den + cnt(is_den)
        zero = state.zero + cnt(is_zero)
        pos = state.pos + cnt(~neg & is_num)

        av = jnp.abs(x)
        vmax = jnp.maximum(
            state.vmax, jnp.max(jnp.where(is_norm & runx, av, 0.0), -1)
        )
        vmin = jnp.minimum(
            state.vmin, jnp.min(jnp.where(is_norm & runx, av, jnp.inf), -1)
        )

        # absolute-position bit fields: denormals use exp=1 (E-126) for
        # the mantissa positions (bitmeter.c:97-99); normals add the
        # implicit leading 1 at position exp+23
        ok = is_num & runx
        e_eff = jnp.where(exp > 0, exp, 1)
        man_u = man.astype(jnp.uint32)
        one_bits = jnp.where(
            ok, jnp.where(is_norm, man_u | (1 << 23), man_u), 0
        )
        hit_bits = jnp.where(
            ok,
            jnp.where(is_norm, jnp.uint32(0xFFFFFF), jnp.uint32(0x7FFFFF)),
            0,
        )

        def field_counts(v24):
            # spread v24 << e_eff over nine 32-bit word slots and count
            # set bits per absolute position (SWAR tree — no one-hot)
            s = (e_eff & 31).astype(jnp.uint32)
            widx = e_eff >> 5
            lo = v24 << s
            hi = jnp.where(s == 0, jnp.uint32(0), v24 >> (32 - s))
            words = [
                jnp.where(widx == w, lo, 0) | jnp.where(widx == w - 1, hi, 0)
                for w in range(9)
            ]
            return swar.positional_count_words(words)[..., :NPOS]

        one = state.one + field_counts(one_bits)
        hit = state.hit + field_counts(hit_bits)
        dset = state.dset + swar.positional_count(
            jnp.where(ok, man_u, 0)
        )[..., :23]

        return BitMeterState(
            hit=hit, one=one, dset=dset,
            nan=nan, inf=inf, den=den, zero=zero, pos=pos,
            vmin=vmin, vmax=vmax,
            time=state.time + jnp.where(run, T, 0),
            integrating=state.integrating,
        )

    def read(self, state: BitMeterState):
        """bim_stats atom contents (bitmeter.c:268-296)."""
        return {
            "hit": state.hit,
            "one": state.one,
            "dset": state.dset,
            "nan": state.nan,
            "inf": state.inf,
            "den": state.den,
            "zero": state.zero,
            "pos": state.pos,
            "min": state.vmin,
            "max": state.vmax,
            "integration_time": state.time,
        }, state

    def clear(self, state: BitMeterState) -> BitMeterState:
        """5 fps window clear in non-averaging mode (bim_clear,
        bitmeter.c:47-55): keeps nan/inf/den."""
        fresh = self.init(state.time.shape)
        return dataclasses.replace(
            fresh, nan=state.nan, inf=state.inf, den=state.den,
            integrating=state.integrating,
        )

    def reset(self, state: BitMeterState) -> BitMeterState:
        return self.init(state.time.shape)
