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


def _kernel(w1, w2, w3, track_peak, tchunk, envelope,
            in_ref, s0_ref, out_ref, scratch):
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

    def group_env(g, carry):
        """SURVEY §7 option (a): max-of-affine envelope per 4-sample group.

        Each sample step is z' = max(z, (1-w)z + w t) — a max of monotone
        affine maps, so max distributes over the composition and the
        group's exact response is the 5-piece convex envelope
        z_out = max_k (w3 * (1-w)^k * z + b_k), where b_k (the best
        intercept over attack subsets of size k) is INDEPENDENT of z.
        The serial dependency per group shrinks from ~12 chained VPU ops
        to mul + fma + max-tree (~5); the b_k max-plus DP pipelines
        across loop iterations since it never touches the carry.
        NaN samples never attack (reference branch compares false) —
        equivalent to t = -inf, which drops out of every max candidate.
        """
        z1, z2, m, p = carry
        t = [in_ref[4 * g + j, 0] for j in range(4)]
        ninf = jnp.float32(np.float32("-inf"))
        ts = [jnp.where(tt == tt, tt, ninf) for tt in t]

        def env(z, w):
            a = 1.0 - w
            u = [w * tt for tt in ts]
            # max-plus DP over samples: b_k = best intercept with k
            # attacks so far; attacking scales prior intercept by a
            b1 = u[0]
            b2 = b3 = b4 = ninf
            for j in (1, 2, 3):
                b4 = jnp.maximum(b4, b3 * a + u[j])
                b3 = jnp.maximum(b3, b2 * a + u[j])
                b2 = jnp.maximum(b2, b1 * a + u[j])
                b1 = jnp.maximum(b1, u[j])
            d = z * w3
            out = jnp.maximum(
                jnp.maximum(d, d * a + b1),
                jnp.maximum(d * (a * a) + b2, d * (a * a * a) + b3),
            )
            return jnp.maximum(out, d * (a * a * a * a) + b4)

        z1 = env(z1, w1)
        z2 = env(z2, w2)
        if track_peak:
            pg = jnp.maximum(
                jnp.maximum(ts[0], ts[1]), jnp.maximum(ts[2], ts[3])
            )
            p = jnp.maximum(p, pg)
        m = jnp.maximum(m, z1 + z2)
        return z1, z2, m, p

    body = group_env if envelope else group
    z1, z2, m, p = jax.lax.fori_loop(0, tchunk // 4, body, (z1, z2, m, p))
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


@functools.partial(
    jax.jit,
    static_argnames=("w1", "w2", "w3", "track_peak", "envelope", "interpret"),
)
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
    envelope: bool = False,
    interpret: bool = False,
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
        envelope,
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
        interpret=interpret,
    )(xt, s0)

    out = out.transpose(1, 0, 2, 3).reshape(4, Bp)[:, :B]
    return out[0], out[1], out[2], out[3]


def available() -> bool:
    """True when running on a TPU backend where the kernel compiles."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
