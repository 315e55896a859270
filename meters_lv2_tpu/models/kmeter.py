"""K-meter (K-12/K-14/K-20): RMS ballistics + digital peak with hold/fall.

Reference: jmeters/kmeterdsp.cc, wrapper src/meters.cc:333-418.

TPU design: the squared-signal two-stage smoother is linear at 4-sample
cadence → blocked MXU recurrence.  The digital peak hold/fall logic runs at
*block* rate in the reference (one decision per process() call,
kmeterdsp.cc:124-139), so it stays as cheap per-block scalar logic here.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import design, lti
from .base import register


@dataclasses.dataclass(frozen=True)
class KMeterState:
    z: jax.Array  # [..., 2] smoother state
    rms: jax.Array  # [...] max rms since last read
    peak: jax.Array  # [...] held digital peak
    cnt: jax.Array  # [...] int32 hold counter (samples)
    flag: jax.Array  # [...] bool: rms was read


jax.tree_util.register_dataclass(
    KMeterState, data_fields=["z", "rms", "peak", "cnt", "flag"], meta_fields=[]
)


class KMeter:
    """K-system meter; read() returns (rms, peak) like Kmeterdsp::read(rms&,peak&).

    update() takes blocks [..., T], T % 4 == 0.  The peak fall multiplier
    depends on the block length (kmeterdsp.cc:65-69): per block,
    fall = 10^(-0.05 * 15 * T/fs)  (15 dB/s).
    """

    def __init__(self, fs: float, dtype=jnp.float32):
        self.fs = float(fs)
        omega, hold = design.kmeter_coeffs(fs)
        self.hold = hold
        self.sys = lti.grouped4_smoother_system(omega, dtype)
        self.dtype = dtype

    def init(self, batch_shape=()) -> KMeterState:
        z = jnp.zeros(batch_shape, self.dtype)
        return KMeterState(
            z=jnp.zeros((*batch_shape, 2), self.dtype),
            rms=z,
            peak=z,
            cnt=jnp.zeros(batch_shape, jnp.int32),
            flag=jnp.zeros(batch_shape, bool),
        )

    def block_core(
        self, z: jax.Array, x: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """Raw smoother advance + NaN-skipped block max of x^2; no entry
        clamp or finalize (the per-process() pieces live in update /
        finalize so a fused kernel covering the bulk of a block can chain
        an XLA tail through the same epilogue)."""
        *batch, T = x.shape
        assert T % 4 == 0
        sq = jnp.square(x)
        # block digital peak (of x^2); NaN samples are skipped as the
        # reference's `if (t >= _peak)` comparison does (kmeterdsp.cc:124)
        # — a NaN must not erase the block's legitimate peak
        t = jnp.max(jnp.where(jnp.isnan(sq), 0.0, sq), axis=-1)
        _, z = self.sys.apply(sq.reshape(*batch, T // 4, 4), z)
        return z, t

    def finalize(
        self, state: KMeterState, z: jax.Array, t: jax.Array, T: int
    ) -> KMeterState:
        """Per-process()-call epilogue on the advanced smoother state z
        and the block max t of x^2 (kmeterdsp.cc:101-139)."""
        fall = jnp.float32(10.0 ** (-0.05 * 15.0 * (T / self.fs)))

        # NaN flush (kmeterdsp.cc:101-107)
        z = jnp.where(jnp.isnan(z), 0.0, z)
        t = jnp.where(jnp.isfinite(t), t, 0.0)
        z = z + 1e-20

        s = jnp.sqrt(2.0 * z[..., 1])
        t = jnp.sqrt(t)

        rms = jnp.where(state.flag, s, jnp.maximum(s, state.rms))

        # peak hold/fall, one decision per block (kmeterdsp.cc:124-139)
        new_hit = t >= state.peak
        holding = state.cnt > 0
        peak = jnp.where(
            new_hit, t, jnp.where(holding, state.peak, state.peak * fall + 1e-10)
        )
        cnt = jnp.where(
            new_hit,
            jnp.int32(self.hold),
            jnp.where(holding, state.cnt - T, state.cnt),
        )
        return KMeterState(z=z, rms=rms, peak=peak, cnt=cnt, flag=jnp.zeros_like(state.flag))

    def update(self, state: KMeterState, x: jax.Array) -> KMeterState:
        z = jnp.clip(state.z, 0.0, 50.0)  # entry clamp (kmeterdsp.cc:101)
        z, t = self.block_core(z, x)
        return self.finalize(state, z, t, x.shape[-1])

    def read(self, state: KMeterState):
        """Returns ({'rms', 'peak'}, state).  No rlgain argument: the
        K-meter wrapper re-uses the ref-level port for peak-hold reset
        instead of a gain (src/meters.cc:337-357)."""
        out = {"rms": state.rms, "peak": state.peak}
        return out, dataclasses.replace(state, flag=jnp.ones_like(state.flag))

    def reset(self, state: KMeterState) -> KMeterState:
        return self.init(state.rms.shape)

    def reset_peak(self, state: KMeterState) -> KMeterState:
        """Clear the held digital peak only — the K-meter wrapper re-uses
        its ref-level port edge as a peak-hold reset (src/meters.cc:
        337-357); the RMS needle and smoother state are untouched."""
        return dataclasses.replace(
            state,
            peak=jnp.zeros_like(state.peak),
            cnt=jnp.zeros_like(state.cnt),
        )


@register("K12mono")
@register("K12stereo")
class K12Meter(KMeter):
    k_offset = 12.0


@register("K14mono")
@register("K14stereo")
class K14Meter(KMeter):
    k_offset = 14.0


@register("K20mono")
@register("K20stereo")
class K20Meter(KMeter):
    k_offset = 20.0
