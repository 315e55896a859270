"""Goniometer (vectorscope) trace processing.

Reference: gui/goniometer.c:299-538 (draw_rb) + src/goniometerlv2.c.  The
plugin ships raw stereo through a lock-free ring buffer; the GUI thread
optionally oversamples 2x/4x/8x (zita resampler, hlen=12), applies a
one-pole smoother (hpw = e^(-2π·20/(rate·os))), rotates to
(x, y) = (L−R, L+R) and autoscales with asymmetric attack/decay gain.

TPU design: process() is a pure function block → trace points.  The
oversampler is the polyphase MXU conv (ops.resample); the smoother is a
blocked LTI; autogain is per-block scalar logic identical to the
reference's per-draw update.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..ops import lti, resample
from .base import register


@dataclasses.dataclass(frozen=True)
class GonioState:
    rhist: jax.Array  # [..., 2, 2*hl-1] resampler history
    lp: jax.Array  # [..., 2, 1] smoother state
    gain: jax.Array  # [...] autogain


jax.tree_util.register_dataclass(
    GonioState, data_fields=["rhist", "lp", "gain"], meta_fields=[]
)


@register("goniometer")
class Goniometer:
    def __init__(
        self,
        fs: float,
        oversample: int = 4,  # s_sfact default (goniometerlv2.c:95)
        autogain_attack: float = 54.0,
        autogain_decay: float = 58.0,
        autogain_rms: float = 50.0,
        autogain_target: float = 40.0,
        dtype=jnp.float32,
    ):
        assert oversample in (1, 2, 4, 8)
        self.fs = float(fs)
        self.os = oversample
        self.hl = 12
        if oversample > 1:
            self.taps = resample.upsample_taps(oversample, self.hl, dtype)
        else:
            self.taps = None
        hpw = math.exp(-2.0 * math.pi * 20.0 / (fs * oversample))
        self.hpw = hpw
        self.lp_sys = lti.one_pole_system(hpw, dtype)
        # dial mappings (gui/goniometer.c:895-912)
        self.attack_pow = max(0.01, 0.1 * math.exp(0.06 * autogain_attack) - 0.09)
        self.decay_pow = max(0.01, 0.1 * math.exp(0.06 * autogain_decay) - 0.09)
        self.g_rms = 0.01 * autogain_rms
        self.g_target = max(0.15, math.exp(1.8 * (-0.02 * autogain_target + 1.0)))
        self.dtype = dtype

    def init(self, batch_shape=()) -> GonioState:
        return GonioState(
            rhist=resample.upsample_init((*batch_shape, 2), self.hl, self.dtype),
            lp=jnp.zeros((*batch_shape, 2, 1), self.dtype),
            gain=jnp.ones(batch_shape, self.dtype),
        )

    def process(self, state: GonioState, lr: jax.Array, autogain: bool = True):
        """lr: [..., 2, T].  Returns ({'x','y','gain'}, new_state) with
        x/y [..., os*T] trace coordinates (before display gain)."""
        *batch, _, T = lr.shape
        if self.os > 1:
            d, rhist = resample.upsample(lr, state.rhist, self.taps)
        else:
            d, rhist = lr, state.rhist
        # lp += hpw*(d - lp) + 1e-12  → fold constant into the input
        eps = jnp.float32(1e-12 / self.hpw)
        y, lp = self.lp_sys.apply(d + eps, state.lp)
        l, r = y[..., 0, :], y[..., 1, :]
        ax = l - r
        ay = l + r

        # autogain (gui/goniometer.c:497-537), one step per block
        if autogain:
            xdif = jnp.max(ax, -1) - jnp.min(ax, -1)
            ydif = jnp.max(ay, -1) - jnp.min(ay, -1)
            mx = jnp.sqrt(xdif * xdif + ydif * ydif) * 0.707
            rms0 = jnp.sqrt(jnp.mean(jnp.square(l), -1))
            rms1 = jnp.sqrt(jnp.mean(jnp.square(r), -1))
            rms = 5.436 * jnp.maximum(rms0, rms1)
            if self.g_rms > 0:
                mx = mx * (1.0 - self.g_rms) + rms * self.g_rms
            mx = mx * self.g_target
            mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
            tgt = jnp.where(mx < 0.01, 100.0, jnp.where(mx > 100.0, 0.02, 2.0 / jnp.maximum(mx, 1e-6)))
            elapsed = T / self.fs
            att = jnp.where(
                tgt < state.gain,
                self.attack_pow * (0.31 + 0.1 * math.log10(elapsed)),
                self.decay_pow * (0.03 + 0.007 * math.log(elapsed)),
            )
            gain = jnp.maximum(state.gain + att * (tgt - state.gain), 0.001)
        else:
            gain = state.gain

        new_state = GonioState(rhist=rhist, lp=lp, gain=gain)
        return {"x": ax, "y": ay, "gain": gain}, new_state
