"""Stereo phase-correlation meter (COR).

Reference: jmeters/stcorrdsp.cc, wrapper src/meters.cc:511-536.
Per sample: one-pole lowpass (w1 = 6.28*flp/fs) on L and R, then one-pole
averages (w2 = 1/(tcf*fs)) of zl*zr, zl^2, zr^2; readout
zlr / sqrt(zll*zrr + 1e-10).

TPU design: the lowpass is a blocked MXU recurrence (ops.lti); the
running products need only their END-of-block value (read() is the only
consumer), so the w2 averages evaluate as one closed-form weighted-sum
reduction instead of a second blocked scan (ema_final).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import design, lti
from .base import register


@dataclasses.dataclass(frozen=True)
class CorState:
    zl: jax.Array  # [..., 1]
    zr: jax.Array  # [..., 1]
    zp: jax.Array  # [..., 3] (zlr, zll, zrr) — independent averaging poles


jax.tree_util.register_dataclass(
    CorState, data_fields=["zl", "zr", "zp"], meta_fields=[]
)


@register("COR")
class CorrelationMeter:
    def __init__(self, fs: float, flp: float = 2000.0, tcf: float = 0.3, dtype=jnp.float32):
        self.fs = float(fs)
        w1, w2 = design.stcorr_coeffs(fs, flp, tcf)
        self.w1 = w1
        self.w2 = w2
        self.lp = lti.one_pole_system(w1, dtype)
        self.dtype = dtype

    def ema_final(self, prods: jax.Array, zp0: jax.Array) -> jax.Array:
        """Final value of the w2 running average over prods [..., T].

        Only the END-of-block value is ever read (stcorrdsp::read), so
        the one-pole is a closed-form weighted sum — one reduction pass
        instead of a blocked scan over the full product series:
        z_T = (1-w)^T z_0 + sum_t w (1-w)^{T-1-t} p_t  (exact algebra of
        `z += w2*(p - z)`, stcorrdsp.cc:62-64).

        Precision envelope: the f32 dot reorders the reference's
        sequential f32 recurrence, so agreement degrades as T*w2 grows
        (w2 ~ 1/(tcf*fs) => ~7e-5 per sample at 48 kHz).  Intended
        per-update block sizes are <= a few seconds (T*w2 <~ 10; golden
        suite covers 1 s blocks at ~1e-6 agreement).  For very long
        single-call blocks, segment at the pipeline layer (run_stream)
        instead of passing hour-long arrays in one update()."""
        T = prods.shape[-1]
        t = np.arange(T, dtype=np.float64)
        wv = (self.w2 * (1.0 - self.w2) ** (T - 1.0 - t)).astype(np.float32)
        decay = np.float32((1.0 - self.w2) ** T)
        acc = jnp.einsum(
            "...t,t->...", prods, jnp.asarray(wv),
            precision=jax.lax.Precision.HIGHEST,
        )
        return zp0 * decay + acc

    def init(self, batch_shape=()) -> CorState:
        z1 = jnp.zeros((*batch_shape, 1), self.dtype)
        return CorState(zl=z1, zr=z1, zp=jnp.zeros((*batch_shape, 3), self.dtype))

    def update(self, state: CorState, lr: jax.Array) -> CorState:
        """lr: [..., 2, T]."""
        l, r = lr[..., 0, :], lr[..., 1, :]
        # zl += w1*(x - zl) + 1e-20  →  fold the +1e-20 into the input
        eps = jnp.float32(1e-20 / self.w1)
        yl, zl = self.lp.apply(l + eps, state.zl)
        yr, zr = self.lp.apply(r + eps, state.zr)
        prods = jnp.stack([yl * yr, yl * yl, yr * yr], axis=-2)  # [..., 3, T]
        zp = self.ema_final(prods, state.zp)
        # non-finite flush + denormal offsets (stcorrdsp.cc:65-76)
        zl = jnp.where(jnp.isfinite(zl), zl, 0.0)
        zr = jnp.where(jnp.isfinite(zr), zr, 0.0)
        zp = jnp.where(jnp.isfinite(zp), zp, 0.0) + 1e-10
        return CorState(zl=zl, zr=zr, zp=zp)

    def read(self, state: CorState):
        zlr, zll, zrr = state.zp[..., 0], state.zp[..., 1], state.zp[..., 2]
        return zlr / jnp.sqrt(zll * zrr + 1e-10), state
