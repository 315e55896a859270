"""Surround meters (surround3..8): per-channel K-meter RMS/peak plus
user-routable correlation pairs.

Reference: src/surmeter.c — N Kmeterdsp instances and 4 Stcorrdsp
instances (3 when nchan <= 3), each correlating a configurable channel
pair (:115-128).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pallas_surround
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

    @property
    def _fused_mode(self) -> str:
        return os.environ.get("METERS_TPU_SURROUND_FUSED", "auto")

    def _use_fused(self, T: int) -> bool:
        """Fused Pallas core (ops/pallas_surround): auto on TPU for
        blocks >= 128 samples; the kernel covers the 128-aligned bulk and
        any remainder tail chains through the XLA path."""
        mode = self._fused_mode
        if mode == "0" or T < 128 or self.dtype != jnp.float32:
            return False
        if mode in ("1", "interpret"):
            return True
        return pallas_surround.available()

    def _sel(self, pairs, dtype):
        """[P, C] one-hot routing matrices from the static construction
        pairs or a runtime [P, 2] array (may be traced) — the reference
        re-reads surc_a/surc_b every run() (src/surmeter.c:119-128), so
        routing is a per-call input, not a rebuild.  Channel selection is
        a one-hot matmul (traced-index gathers serialize on TPU)."""
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
        return (
            jax.nn.one_hot(a_idx, self.nchan, dtype=dtype),
            jax.nn.one_hot(b_idx, self.nchan, dtype=dtype),
        )

    def _xla_core(self, x, kmz, zl, zp, sel_a, sel_b):
        """Unfused blocked-GEMM path over one (sub-)block: raw K-meter
        smoother advance + block peak, correlator lowpass, routed pair
        product averages.  Exact for any T % 4 == 0."""
        kmz, tmax = self.km.block_core(kmz, x)
        cor = self.cor
        eps = jnp.float32(1e-20 / cor.w1)
        y, zl = cor.lp.apply(x + eps, zl)  # [..., C, T]
        ya = jnp.einsum("pc,...ct->...pt", sel_a, y)
        yb = jnp.einsum("pc,...ct->...pt", sel_b, y)
        prods = jnp.stack([ya * yb, ya * ya, yb * yb], axis=-2)  # [..,P,3,T]
        zp = cor.ema_final(prods, zp)
        return kmz, zl, zp, tmax

    def update(
        self, state: SurroundState, x: jax.Array, pairs=None
    ) -> SurroundState:
        """x: [..., C, T].

        `pairs` optionally re-routes the correlators at runtime ([P, 2]
        int array, may be traced); see _sel.

        The correlator lowpass runs ONCE PER CHANNEL and pairs select the
        FILTERED signals (filtering commutes with selection, so results
        are identical to the reference's per-correlator filters for any
        fixed routing, and the C-channel pass replaces 2P redundant ones
        — measured 23.5 -> 11 ms at 204x5ch x 1 s).  Across a mid-stream
        re-route the pair's product integrators carry (as the reference's
        do); its lowpass state follows the newly selected channel —
        converged within the 2 kHz pole's sub-ms constant.

        On TPU the whole per-channel block (K-meter smoothers + peaks +
        correlator lowpass + pair product averages) fuses into one Pallas
        kernel reading the input once (ops/pallas_surround); elsewhere
        (or METERS_TPU_SURROUND_FUSED=0) the equivalent blocked XLA GEMMs
        run.  Identical math either way.
        """
        assert x.shape[-2] == self.nchan
        *batch, C, T = x.shape
        sel_a, sel_b = self._sel(pairs, x.dtype)
        kmz = jnp.clip(state.km.z, 0.0, 50.0)  # entry clamp (kmeterdsp.cc:101)
        zl, zp = state.zl, state.zp
        cor = self.cor

        if self._use_fused(T):
            Tm = (T // 128) * 128
            kmz_r, zl_r, pk, pacc = pallas_surround.fused_core(
                x[..., :Tm].reshape(-1, C, Tm),
                kmz.reshape(-1, C, 2),
                zl.reshape(-1, C, 1),
                sel_a, sel_b,
                self.km.sys.op(32),
                cor.lp.op(128),
                cor.w1, cor.w2,
                interpret=self._fused_mode == "interpret",
            )
            kmz = kmz_r.reshape(*batch, C, 2)
            zl = zl_r.reshape(*batch, C, 1)
            tmax = pk.reshape(*batch, C)
            # end-of-bulk value of the w2 averages (cor.ema_final algebra,
            # composed exactly with any tail below)
            zp = zp * np.float32((1.0 - cor.w2) ** Tm) + pacc.reshape(
                *batch, self.npairs, 3
            )
            if T > Tm:  # non-128-aligned tail: XLA path, chained state
                kmz, zl, zp, tmax_t = self._xla_core(
                    x[..., Tm:], kmz, zl, zp, sel_a, sel_b
                )
                tmax = jnp.maximum(tmax, tmax_t)
        else:
            kmz, zl, zp, tmax = self._xla_core(
                x, kmz, zl, zp, sel_a, sel_b
            )

        km = self.km.finalize(state.km, kmz, tmax, T)
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
