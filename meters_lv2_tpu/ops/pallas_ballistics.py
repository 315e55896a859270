"""Pallas TPU kernel for the PPM/true-peak ballistics recurrence.

The attack/release recurrence (ops/ballistics.py) is inherently sequential
in time; throughput comes from the batch.  The lax.scan formulation pays
XLA loop overhead every 4 samples; this kernel keeps the whole inner loop
in VMEM with the batch laid out as full [8, 128] vector registers:

  * input is staged time-major as [T, nb, 8, 128] (1024 streams per tile)
  * grid = (batch_tiles, time_chunks); TPU executes the grid sequentially,
    so (z1, z2, m, p) persist across time chunks in VMEM scratch
  * each sample update is a handful of VPU ops on a full vreg

State clamping / read-reset semantics stay in the caller (they happen per
update() call, not per sample).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 1024  # streams per tile: [8, 128] vregs
_SL = 8
_LN = 128


def _kernel(w1, w2, w3, track_peak, tchunk, in_ref, s0_ref, out_ref, scratch):
    """in_ref: [tchunk, 1, 8, 128]; s0/out: [1, 4, 8, 128];
    scratch: [4, 8, 128] persistent across the time grid dim."""
    tj = pl.program_id(1)

    @pl.when(tj == 0)
    def _():
        scratch[...] = s0_ref[0]

    z1 = scratch[0]
    z2 = scratch[1]
    m = scratch[2]
    p = scratch[3]

    def group(g, carry):
        z1, z2, m, p = carry
        z1 = z1 * w3
        z2 = z2 * w3
        for j in range(4):
            t = in_ref[4 * g + j, 0]
            # NaN-skipping branch semantics (see ops/ballistics.py)
            z1 = jnp.where(t > z1, z1 + w1 * (t - z1), z1)
            z2 = jnp.where(t > z2, z2 + w2 * (t - z2), z2)
            if track_peak:
                p = jnp.where(t > p, t, p)
        m = jnp.maximum(m, z1 + z2)
        return z1, z2, m, p

    z1, z2, m, p = jax.lax.fori_loop(0, tchunk // 4, group, (z1, z2, m, p))
    scratch[0] = z1
    scratch[1] = z2
    scratch[2] = m
    scratch[3] = p

    @pl.when(tj == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = scratch[...]


def _pick_tchunk(T: int, cap: int = 2048) -> int:
    best = 4
    for c in range(4, cap + 1, 4):
        if T % c == 0:
            best = c
    return best


@functools.partial(jax.jit, static_argnames=("w1", "w2", "w3", "track_peak"))
def ballistics_pallas(
    t_abs: jax.Array,
    z1: jax.Array,
    z2: jax.Array,
    m: jax.Array,
    p: jax.Array,
    *,
    w1: float,
    w2: float,
    w3: float,
    track_peak: bool = False,
):
    """Run the ballistics recurrence over t_abs [B, T] (T % 4 == 0).

    States z1/z2/m/p are [B]; returns updated (z1, z2, m, p).  B is padded
    to a multiple of 1024 internally.
    """
    B, T = t_abs.shape
    assert T % 4 == 0
    Bp = ((B + LANES - 1) // LANES) * LANES
    nb = Bp // LANES
    tchunk = _pick_tchunk(T)
    nt = T // tchunk

    def pad(v):
        return jnp.pad(v, ((0, Bp - B),))

    xt = jnp.pad(t_abs, ((0, Bp - B), (0, 0)))
    xt = xt.T.reshape(T, nb, _SL, _LN)  # time-major tiles
    s0 = jnp.stack([pad(z1), pad(z2), pad(m), pad(p)]).reshape(
        4, nb, _SL, _LN
    ).transpose(1, 0, 2, 3)  # [nb, 4, 8, 128]

    # coefficients are static python floats — baked into the kernel as
    # immediates (traced scalars would be captured constants)
    kernel = functools.partial(
        _kernel, float(w1), float(w2), float(w3), track_peak, tchunk,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec(
                (tchunk, 1, _SL, _LN),
                lambda b, t: (t, b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 4, _SL, _LN), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, _SL, _LN), lambda b, t: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 4, _SL, _LN), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, _SL, _LN), jnp.float32)],
    )(xt, s0)

    out = out.transpose(1, 0, 2, 3).reshape(4, Bp)[:, :B]
    return out[0], out[1], out[2], out[3]


def available() -> bool:
    """True when running on a TPU backend where the kernel compiles."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
