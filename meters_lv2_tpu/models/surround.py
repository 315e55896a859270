"""Surround meters (surround3..8): per-channel K-meter RMS/peak plus
user-routable correlation pairs.

Reference: src/surmeter.c — N Kmeterdsp instances and 4 Stcorrdsp
instances (3 when nchan <= 3), each correlating a configurable channel
pair (:115-128).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .base import register
from .cor import CorrelationMeter
from .kmeter import KMeter, KMeterState


@dataclasses.dataclass(frozen=True)
class SurroundState:
    km: KMeterState  # [..., C]
    zl: jax.Array  # [..., C, 1] per-CHANNEL correlator lowpass state
    zp: jax.Array  # [..., P, 3] per-pair (zab, zaa, zbb) integrators


jax.tree_util.register_dataclass(
    SurroundState, data_fields=["km", "zl", "zp"], meta_fields=[]
)


class SurroundMeter:
    """nchan-channel surround meter.

    `pairs` selects the correlator inputs (default: adjacent channels),
    mirroring the surc_a/surc_b control ports (src/surmeter.c:119-128).
    """

    nchan = 8

    def __init__(self, fs: float, pairs=None, dtype=jnp.float32):
        self.fs = float(fs)
        self.km = KMeter(fs, dtype)
        self.cor = CorrelationMeter(fs, dtype=dtype)
        self.npairs = 4 if self.nchan > 3 else 3
        if pairs is None:
            pairs = tuple(
                (i % self.nchan, (i + 1) % self.nchan) for i in range(self.npairs)
            )
        assert len(pairs) == self.npairs
        # clamp BOTH ends into [0, nchan-1] like the reference's port
        # handler (surmeter.c:122-125); an unclamped negative index would
        # one_hot to an all-zero row and read a constant-0 correlation
        self.pairs = tuple(
            (min(max(int(a), 0), self.nchan - 1),
             min(max(int(b), 0), self.nchan - 1))
            for a, b in pairs
        )
        self.dtype = dtype

    def init(self, batch_shape=()) -> SurroundState:
        return SurroundState(
            km=self.km.init((*batch_shape, self.nchan)),
            zl=jnp.zeros((*batch_shape, self.nchan, 1), self.dtype),
            zp=jnp.zeros((*batch_shape, self.npairs, 3), self.dtype),
        )

    def update(
        self, state: SurroundState, x: jax.Array, pairs=None
    ) -> SurroundState:
        """x: [..., C, T].

        `pairs` optionally re-routes the correlators at runtime ([P, 2]
        int array, may be traced) — the reference reads its surc_a/surc_b
        control ports every run() (src/surmeter.c:119-128), so routing is a
        per-call input, not a rebuild.  Channel selection is a one-hot
        matmul (traced-index gathers serialize on TPU).

        The correlator lowpass runs ONCE PER CHANNEL and pairs select the
        FILTERED signals (filtering commutes with selection, so results
        are identical to the reference's per-correlator filters for any
        fixed routing, and the C-channel pass replaces 2P redundant ones
        — measured 23.5 -> 11 ms at 204x5ch x 1 s).  Across a mid-stream
        re-route the pair's product integrators carry (as the reference's
        do); its lowpass state follows the newly selected channel —
        converged within the 2 kHz pole's sub-ms constant.
        """
        assert x.shape[-2] == self.nchan
        km = self.km.update(state.km, x)
        cor = self.cor
        eps = jnp.float32(1e-20 / cor.w1)
        y, zl = cor.lp.apply(x + eps, state.zl)  # [..., C, T]
        if pairs is None:
            a_idx = jnp.array([p[0] for p in self.pairs])
            b_idx = jnp.array([p[1] for p in self.pairs])
        else:
            pr = jnp.asarray(pairs)
            assert pr.shape == (self.npairs, 2), pr.shape
            # rintf + clamp to the channel count (surmeter.c:122-125)
            a_idx = jnp.clip(
                jnp.round(pr[:, 0]).astype(jnp.int32), 0, self.nchan - 1
            )
            b_idx = jnp.clip(
                jnp.round(pr[:, 1]).astype(jnp.int32), 0, self.nchan - 1
            )
        sel_a = jax.nn.one_hot(a_idx, self.nchan, dtype=x.dtype)  # [P, C]
        sel_b = jax.nn.one_hot(b_idx, self.nchan, dtype=x.dtype)
        ya = jnp.einsum("pc,...ct->...pt", sel_a, y)
        yb = jnp.einsum("pc,...ct->...pt", sel_b, y)
        prods = jnp.stack([ya * yb, ya * ya, yb * yb], axis=-2)  # [..,P,3,T]
        zp = cor.ema_final(prods, state.zp)
        # non-finite flush + denormal offsets (stcorrdsp.cc:65-76)
        zl = jnp.where(jnp.isfinite(zl), zl, 0.0)
        zp = jnp.where(jnp.isfinite(zp), zp, 0.0) + 1e-10
        return SurroundState(km=km, zl=zl, zp=zp)

    def read(self, state: SurroundState):
        km_out, km_st = self.km.read(state.km)
        zab, zaa, zbb = (
            state.zp[..., 0], state.zp[..., 1], state.zp[..., 2]
        )
        c = zab / jnp.sqrt(zaa * zbb + 1e-10)
        return {
            "level": km_out["rms"],
            "peak": km_out["peak"],
            "correlation": c,
        }, SurroundState(km=km_st, zl=state.zl, zp=state.zp)


def _make(n):
    @register(f"surround{n}")
    class _Sur(SurroundMeter):
        nchan = n

    _Sur.__name__ = f"Surround{n}Meter"
    return _Sur


Surround3Meter = _make(3)
Surround4Meter = _make(4)
Surround5Meter = _make(5)
Surround6Meter = _make(6)
Surround7Meter = _make(7)
Surround8Meter = _make(8)
