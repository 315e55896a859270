"""Needle meters: VU, DIN, Nordic (IEC Type I), BBC, EBU (IEC Type IIa/IIb)
and the BBC mid/side M-6 meter.

Reference semantics: src/meters.cc:298-331 (run), jmeters/vumeterdsp.cc,
iec1ppmdsp.cc, iec2ppmdsp.cc, msppmdsp.cc.  Channels are independent DSP
instances; the readout is ``rlgain * read()`` with
rlgain = 10^(0.05*(ref_level_db+18)).

TPU design: the VU filter is linear at 4-sample cadence → blocked MXU
recurrence (ops.lti).  The PPM family is the nonlinear max-affine
recurrence → batched scan (ops.ballistics).
"""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp

from ..ops import ballistics as bal
from ..ops import design, lti
from .base import register, ref_level_gain


# ---------------------------------------------------------------------------
# VU (IEC 60268-17) — linear path
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VUState:
    z: jax.Array  # [..., 2] filter state (z1, z2)
    m: jax.Array  # [...]
    res: jax.Array  # [...] bool


jax.tree_util.register_dataclass(VUState, data_fields=["z", "m", "res"], meta_fields=[])


class VUMeter:
    """IEC 60268-17 VU ballistics (vumeterdsp.cc:45-98).

    Per channel: 2nd-order resonant lowpass on |x| with the reference's
    exact 4-sample update cadence; read() = 1.5*1.571 * max(z2) since last
    read.  update() takes blocks [..., T] with T % 4 == 0.
    """

    def __init__(self, fs: float, dtype=jnp.float32):
        self.fs = float(fs)
        w, g = design.vu_coeffs(fs)
        self.g = g
        self.sys = lti.vu_grouped4_system(w, dtype)
        self.dtype = dtype

    def init(self, batch_shape=()) -> VUState:
        z = jnp.zeros((*batch_shape, 2), self.dtype)
        return VUState(
            z=z,
            m=jnp.zeros(batch_shape, self.dtype),
            res=jnp.ones(batch_shape, bool),
        )

    def update(self, state: VUState, x: jax.Array) -> VUState:
        *batch, T = x.shape
        assert T % 4 == 0
        z = jnp.clip(state.z, -20.0, 20.0)
        m0 = jnp.where(state.res, 0.0, state.m)
        u = jnp.abs(x).reshape(*batch, T // 4, 4)
        y, z = self.sys.apply(u, z)  # y: [..., T//4, 1] = z2 per group
        m = jnp.maximum(m0, jnp.max(y[..., 0], axis=-1))
        # non-finite flush (vumeterdsp.cc:70-73)
        bad = ~jnp.isfinite(z).all(axis=-1)
        z = jnp.where(bad[..., None], 0.0, z)
        z = z.at[..., 1].add(1e-10)
        m = jnp.where(bad, jnp.inf, m)
        return VUState(z=z, m=m, res=jnp.zeros_like(state.res))

    def read(self, state: VUState, ref_level_db=-22.0):
        val = ref_level_gain(ref_level_db) * jnp.float32(self.g) * state.m
        return val, dataclasses.replace(state, res=jnp.ones_like(state.res))


# ---------------------------------------------------------------------------
# PPM family — nonlinear ballistics path
# ---------------------------------------------------------------------------


class _PPMMeter:
    """Shared Type I/II PPM wrapper around ops.ballistics."""

    def __init__(self, fs: float, coeffs: design.BallisticsCoeffs, dtype=jnp.float32):
        self.fs = float(fs)
        self.coeffs = coeffs
        self.dtype = dtype

    def init(self, batch_shape=()) -> bal.PPMState:
        return bal.ppm_init(batch_shape, self.dtype)

    def update(self, state: bal.PPMState, x: jax.Array) -> bal.PPMState:
        return bal.ppm_update(self.coeffs, state, jnp.abs(x))

    def read(self, state: bal.PPMState, ref_level_db=-22.0):
        val, state = bal.ppm_read(self.coeffs, state)
        return ref_level_gain(ref_level_db) * val, state


class DINMeter(_PPMMeter):
    """DIN PPM (IEC 60268-10 Type I, iec1ppmdsp.cc)."""

    def __init__(self, fs: float, dtype=jnp.float32):
        super().__init__(fs, design.iec1_ppm(fs), dtype)


class NordicMeter(DINMeter):
    """Nordic PPM — same Type I ballistics, different display scale."""


class BBCMeter(_PPMMeter):
    """BBC PPM (IEC 60268-10 Type IIa, iec2ppmdsp.cc)."""

    def __init__(self, fs: float, dtype=jnp.float32):
        super().__init__(fs, design.iec2_ppm(fs), dtype)


class EBUMeter(BBCMeter):
    """EBU PPM (IEC 60268-10 Type IIb) — same DSP, different display scale."""


@dataclasses.dataclass(frozen=True)
class BBCMSState:
    mid: bal.PPMState
    side: bal.PPMState


jax.tree_util.register_dataclass(BBCMSState, data_fields=["mid", "side"], meta_fields=[])


@register("BBCM6")
class BBCMidSideMeter:
    """BBC M-6 mid/side meter (msppmdsp.cc, src/meters.cc:552-589).

    Type II ballistics on mv*|L+R| (mid) and mv*|L-R| (side); mid gain is
    -6 dB; side gain toggles -6/+14 dB ("S20" mode).
    """

    def __init__(self, fs: float, dtype=jnp.float32):
        self.fs = float(fs)
        self.coeffs = design.iec2_ppm(fs)
        self.dtype = dtype

    def init(self, batch_shape=()) -> BBCMSState:
        return BBCMSState(
            mid=bal.ppm_init(batch_shape, self.dtype),
            side=bal.ppm_init(batch_shape, self.dtype),
        )

    def update(self, state: BBCMSState, lr: jax.Array, s20=False) -> BBCMSState:
        """lr: [..., 2, T] stereo block.

        `s20` selects the side-channel gain (-6 dB off, +14 dB on) and may
        be a traced bool (scalar or per-stream batch) — the reference reads
        its port-7 value every run() (src/meters.cc:562-563,577-580), so
        toggling mid-stream must not recompile, matching set_speed /
        set_radar_speed elsewhere in this package.
        """
        l, r = lr[..., 0, :], lr[..., 1, :]
        mv_m = jnp.float32(10.0 ** (0.05 * -6.0))
        mv_s = jnp.where(
            jnp.asarray(s20),
            jnp.float32(10.0 ** (0.05 * 14.0)),
            jnp.float32(10.0 ** (0.05 * -6.0)),
        )
        if mv_s.ndim:  # per-stream s20: broadcast over the time axis
            mv_s = mv_s[..., None]
        mid = bal.ppm_update(self.coeffs, state.mid, mv_m * jnp.abs(l + r))
        side = bal.ppm_update(self.coeffs, state.side, mv_s * jnp.abs(l - r))
        return BBCMSState(mid=mid, side=side)

    def read(self, state: BBCMSState, ref_level_db=-22.0):
        g = ref_level_gain(ref_level_db)
        vm, mid = bal.ppm_read(self.coeffs, state.mid)
        vs, side = bal.ppm_read(self.coeffs, state.side)
        return {"mid": g * vm, "side": g * vs}, BBCMSState(mid=mid, side=side)


# register mono/stereo URI aliases; channel layout is just a batch dim here.
for _name, _cls in [
    ("VU", VUMeter),
    ("DIN", DINMeter),
    ("NOR", NordicMeter),
    ("BBC", BBCMeter),
    ("EBU", EBUMeter),
]:
    register(_name + "mono")(_cls)
    register(_name + "stereo")(_cls)
