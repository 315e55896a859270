"""Nonlinear peak-meter ballistics (PPM attack/release recurrences).

The PPM family (iec1ppmdsp.cc:47-80, iec2ppmdsp.cc:47-80, msppmdsp.cc:45-121,
truepeakdsp.cc:58-107) shares one recurrence per state variable z::

    z *= w3                      # release, once per 4-sample group
    for each of 4 samples:
        if t > z: z += w * (t - z)   # conditional attack

The branch condition is exactly t > z-after-decay, so each sample update is
the max of two affine maps:  z' = max(z, (1-w)*z + w*t)  (with the group
decay folded in at group start).  Both z1 (fast) and z2 (slow) evolve
independently; the meter reads max(z1 + z2) over the block.

TPU strategy: the recurrence is sequential in time but embarrassingly
parallel over (streams x channels).  We scan at 4-sample-group cadence with
the 4 inner updates unrolled, carrying [batch]-shaped vectors, so each scan
step is a handful of fused VPU ops over thousands of lanes.  A Pallas
variant (ops/pallas_ballistics.py) moves the loop into VMEM for the hot
path; results are identical.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .design import BallisticsCoeffs


@dataclasses.dataclass(frozen=True)
class PPMState:
    """Carried per-stream ballistics state (pytree of arrays, shape [...])."""

    z1: jax.Array
    z2: jax.Array
    m: jax.Array  # max(z1+z2) since last read
    res: jax.Array  # bool: max was read, restart accumulation


jax.tree_util.register_dataclass(
    PPMState, data_fields=["z1", "z2", "m", "res"], meta_fields=[]
)


def ppm_init(batch_shape=(), dtype=jnp.float32) -> PPMState:
    z = jnp.zeros(batch_shape, dtype)
    return PPMState(z1=z, z2=z, m=z, res=jnp.ones(batch_shape, bool))


def ppm_update(
    coeffs: BallisticsCoeffs,
    state: PPMState,
    t: jax.Array,
    clamp_lo: float = 0.0,
    clamp_hi: float = 20.0,
    denormal: float = 1e-10,
) -> PPMState:
    """Process one block of rectified samples t, shape [..., T] (T % 4 == 0).

    Mirrors one process() call: state clamped on entry
    (iec2ppmdsp.cc:49-50), denormal offset added on exit (:76-77).
    """
    *batch, T = t.shape
    assert T % 4 == 0, T

    z1 = jnp.clip(state.z1, clamp_lo, clamp_hi)
    z2 = jnp.clip(state.z2, clamp_lo, clamp_hi)
    m0 = jnp.where(state.res, 0.0, state.m)

    z1, z2, m, _ = _run_ballistics(coeffs, t, z1, z2, m0, None)
    return PPMState(
        z1=z1 + denormal, z2=z2 + denormal, m=m, res=jnp.zeros_like(state.res)
    )


def _use_pallas() -> bool:
    import os

    mode = os.environ.get("METERS_TPU_PALLAS", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _run_ballistics(coeffs, t, z1, z2, m, p):
    """Dispatch the core recurrence: Pallas kernel on TPU, grouped lax.scan
    elsewhere.  p (raw peak tracking) may be None.  Shapes: t [..., T],
    states [...]."""
    *batch, T = t.shape
    track_peak = p is not None
    if _use_pallas():
        import numpy as np

        from . import pallas_ballistics as pb

        import os

        nb = int(np.prod(batch)) if batch else 1
        pz = (p if track_peak else jnp.zeros_like(m)).reshape(nb)
        # envelope composition variant (SURVEY §7 option (a), measured —
        # see docs/BENCHMARKS.md round 4); METERS_TPU_BALLISTICS_ENV=1/0
        env = os.environ.get("METERS_TPU_BALLISTICS_ENV", "0") == "1"
        z1f, z2f, mf, pf = pb.ballistics_pallas(
            t.reshape(nb, T), z1.reshape(nb), z2.reshape(nb), m.reshape(nb),
            pz, w1=coeffs.w1, w2=coeffs.w2, w3=coeffs.w3,
            track_peak=track_peak, envelope=env,
        )
        rs = lambda v: v.reshape(*batch) if batch else v.reshape(())
        return rs(z1f), rs(z2f), rs(mf), (rs(pf) if track_peak else None)

    return _scan_ballistics(coeffs, t, z1, z2, m, p, track_peak)


def _scan_ballistics(coeffs, t, z1, z2, m, p, track_peak):
    """The grouped lax.scan formulation (used off-TPU and for sub-group
    tails that would waste a kernel launch)."""
    *batch, T = t.shape
    w1 = jnp.float32(coeffs.w1)
    w2 = jnp.float32(coeffs.w2)
    w3 = jnp.float32(coeffs.w3)
    tg = jnp.moveaxis(t.reshape(*batch, T // 4, 4), -2, 0)  # [G, ..., 4]

    def step(carry, tb):
        z1, z2, m, p = carry
        z1 = z1 * w3
        z2 = z2 * w3
        for i in range(4):
            ti = tb[..., i]
            # where(t > z) matches the reference branch exactly — a NaN
            # sample compares false and is skipped (iec2ppmdsp.cc:59-72),
            # unlike max() which would propagate it into the state
            z1 = jnp.where(ti > z1, z1 + w1 * (ti - z1), z1)
            z2 = jnp.where(ti > z2, z2 + w2 * (ti - z2), z2)
            if track_peak:
                p = jnp.where(ti > p, ti, p)
        m = jnp.maximum(m, z1 + z2)
        return (z1, z2, m, p), None

    p0 = p if track_peak else jnp.zeros_like(m)
    (z1, z2, m, p), _ = jax.lax.scan(step, (z1, z2, m, p0), tg)
    return z1, z2, m, (p if track_peak else None)


def ppm_read(coeffs: BallisticsCoeffs, state: PPMState) -> tuple[jax.Array, PPMState]:
    """read(): returns g * max and arms the reset flag (iec2ppmdsp.cc:83-87)."""
    return jnp.float32(coeffs.g) * state.m, dataclasses.replace(
        state, res=jnp.ones_like(state.res)
    )


# ---------------------------------------------------------------------------
# True peak: same ballistics on the 4x oversampled stream, plus raw peak and
# different max bookkeeping (truepeakdsp.cc:58-107: m is scaled by g *inside*
# process and maxed across calls; p is the raw oversampled peak).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TruePeakState:
    z1: jax.Array
    z2: jax.Array
    m: jax.Array  # g-scaled ballistic max since last read
    p: jax.Array  # raw oversampled |peak| since last read
    res: jax.Array


jax.tree_util.register_dataclass(
    TruePeakState, data_fields=["z1", "z2", "m", "p", "res"], meta_fields=[]
)


def true_peak_init(batch_shape=(), dtype=jnp.float32) -> TruePeakState:
    z = jnp.zeros(batch_shape, dtype)
    return TruePeakState(z1=z, z2=z, m=z, p=z, res=jnp.ones(batch_shape, bool))


def true_peak_update(
    coeffs: BallisticsCoeffs, state: TruePeakState, up_abs: jax.Array
) -> TruePeakState:
    """Process a block of the rectified 4x-oversampled stream [..., 4*n]."""
    *batch, T4 = up_abs.shape
    assert T4 % 4 == 0

    z1 = jnp.clip(state.z1, 0.0, 20.0)
    z2 = jnp.clip(state.z2, 0.0, 20.0)
    m0 = jnp.zeros_like(state.m)
    p0 = jnp.zeros_like(state.p)

    z1, z2, m, p = _run_ballistics(coeffs, up_abs, z1, z2, m0, p0)
    m = m * jnp.float32(coeffs.g)
    m = jnp.where(state.res, m, jnp.maximum(m, state.m))
    p = jnp.where(state.res, p, jnp.maximum(p, state.p))
    return TruePeakState(
        z1=z1 + 1e-20, z2=z2 + 1e-20, m=m, p=p, res=jnp.zeros_like(state.res)
    )


def true_peak_read(state: TruePeakState) -> tuple[jax.Array, jax.Array, TruePeakState]:
    """read(m, p): returns (ballistic max, raw peak), arms reset."""
    return state.m, state.p, dataclasses.replace(
        state, res=jnp.ones_like(state.res)
    )


def true_peak_update_fused(
    coeffs: BallisticsCoeffs,
    state: TruePeakState,
    x: jax.Array,
    hist: jax.Array,
    interpret: bool = False,
) -> tuple[TruePeakState, jax.Array]:
    """true_peak_update with the 4x oversampling fused INTO the
    ballistics kernel (ops/pallas_truepeak): the oversampled stream
    never touches HBM.  x is the RAW block [..., T] (T % 4 == 0), hist
    the [..., 47] resampler history; returns (state', hist').

    Semantics mirror one process() call exactly: entry clamps once, the
    64-aligned bulk runs in the kernel, any sub-frame tail chains
    through upsample4 + the scan recurrence on the carried states, and
    the g-scale / res-merge / denormal epilogue applies once at the end
    (jmeters/truepeakdsp.cc:58-107)."""
    import numpy as np

    from . import pallas_truepeak as ptp
    from . import resample

    *batch, T = x.shape
    assert T % 4 == 0, T
    nb = int(np.prod(batch)) if batch else 1

    z1 = jnp.clip(state.z1, 0.0, 20.0).reshape(nb)
    z2 = jnp.clip(state.z2, 0.0, 20.0).reshape(nb)
    m = jnp.zeros_like(z1)
    p = jnp.zeros_like(z1)
    xf = x.reshape(nb, T)
    hf = hist.reshape(nb, hist.shape[-1])

    Tm = (T // 64) * 64
    if Tm:
        z1, z2, m, p, hf = ptp.truepeak_pallas(
            xf[:, :Tm], hf, z1, z2, m, p,
            w1=coeffs.w1, w2=coeffs.w2, w3=coeffs.w3,
            interpret=interpret,
        )
    if Tm < T:  # sub-frame tail: XLA oversample + scan, chained states
        up, hf = resample.upsample4(xf[:, Tm:], hf)
        z1, z2, m, p = _scan_ballistics(
            coeffs, jnp.abs(up), z1, z2, m, p, True
        )

    rs = lambda v: v.reshape(*batch) if batch else v.reshape(())
    z1, z2, m, p = rs(z1), rs(z2), rs(m), rs(p)
    m = m * jnp.float32(coeffs.g)
    m = jnp.where(state.res, m, jnp.maximum(m, state.m))
    p = jnp.where(state.res, p, jnp.maximum(p, state.p))
    st = TruePeakState(
        z1=z1 + 1e-20, z2=z2 + 1e-20, m=m, p=p, res=jnp.zeros_like(state.res)
    )
    return st, hf.reshape(hist.shape)
