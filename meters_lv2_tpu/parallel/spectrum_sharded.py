"""Whole-file 30-band spectrum analysis sharded over a ('dp','sp') mesh.

The filter bank is a banked linear recurrence, so a file's timeline can
split over sequence-parallel devices exactly like the R128 K-weighting
(parallel.timepar): one all_gather of [nsp, B, 30, 12] zero-state
responses composes every shard's true entry state.  The display smoother
is a per-band one-pole — also linear — so its value chains across shards
with a scalar (1-w)^L composition; the peak-hold combines with pmax.

Readout semantics match a serial SpectrumAnalyzer run over the full
file: same smoothed series, same peak-hold, same final state (the
per-update 1e-20 denormal offset is applied once, as one serial
update() call would).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.spectrum import N_BANDS, SpectrumAnalyzer, SpectrumState
from ..ops import lti
from .timepar import banked_lti_apply_sp


def _analyze_shard(meter: SpectrumAnalyzer, x, omega, sp_axis: str):
    """Per-shard body; x: [b_local, T_local] (downmixed)."""
    k = jax.lax.axis_index(sp_axis)
    nsp = jax.lax.axis_size(sp_axis)
    B, Tl = x.shape

    s0 = meter.bank.init((B,))
    v, zf = banked_lti_apply_sp(meter.bank, x, s0, sp_axis)
    sq = jnp.square(v)  # [B, 30, Tl]

    # smoother: local zero-state pass, then chain values across shards
    # with the scalar composition v_in[k] = sum_{i<k} b[i] * pw^{k-1-i}
    # (stream-start value is 0, as a fresh serial meter's)
    vs, vloc = lti.one_pole_apply_traced(
        omega, sq, jnp.zeros((B, N_BANDS, 1), x.dtype)
    )
    pw_l = jnp.exp(Tl * jnp.log1p(-jnp.asarray(omega, x.dtype)))  # (1-w)^L
    b_all = jax.lax.all_gather(vloc[..., 0], sp_axis)  # [nsp, B, 30]

    def step(i, s):
        return jnp.where(i < k, s * pw_l + b_all[i], s)

    v_in = jax.lax.fori_loop(
        0, nsp, step, jnp.zeros_like(b_all[0])
    )  # [B, 30] smoother value entering this shard
    # exact local series given the true entry value: the zero-state local
    # series plus the entry value's decaying tail
    t = jnp.arange(Tl, dtype=x.dtype)
    tail = jnp.exp((t + 1.0) * jnp.log1p(-jnp.asarray(omega, x.dtype)))
    vs = vs + v_in[..., None] * tail  # [B, 30, Tl]

    peak = jax.lax.pmax(jnp.max(vs, axis=-1), sp_axis)
    val = jax.lax.all_gather(vs[..., -1], sp_axis)[nsp - 1]
    zf = jnp.where(jnp.isfinite(zf), zf, 0.0)
    val = jnp.where(jnp.isfinite(val), val, 0.0) + 1e-20
    peak = jnp.where(jnp.isfinite(peak), peak, 0.0)
    return {"zf": zf, "val": val, "peak": peak}


def analyze_spectrum(meter: SpectrumAnalyzer, x, mesh: Mesh, stereo=True):
    """Sharded whole-file spectrum analysis.

    Args:
      meter: a SpectrumAnalyzer (supplies the bank + smoother speed).
      x: [B, 2, T] (stereo, averaged) or [B, T] mono; B divisible by the
         mesh 'dp' size, T by the 'sp' size.
    Returns (read_dict, SpectrumState) matching a serial full-file run.
    """
    from jax import shard_map

    if stereo and x.ndim == 3:
        x = 0.5 * (x[..., 0, :] + x[..., 1, :])
    omega = jnp.asarray(meter.omega, meter.dtype)
    body = partial(_analyze_shard, meter, sp_axis="sp")
    out = jax.jit(
        shard_map(
            lambda xs: body(xs, omega),
            mesh=mesh,
            in_specs=P("dp", "sp"),
            out_specs={
                "zf": P("dp", None, None),
                "val": P("dp", None),
                "peak": P("dp", None),
            },
            check_vma=False,
        )
    )(x)
    st = SpectrumState(
        zf=out["zf"], val=out["val"], peak=out["peak"], omega=omega
    )
    return meter.read(st)[0], st
