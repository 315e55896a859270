"""Fused Pallas TPU kernel for the standalone true-peak meter: 4x
polyphase oversampling + IEC ballistics + raw peak in ONE pass.

Why: the unfused dBTP path materializes the 4x oversampled stream in HBM
between the conv and the ballistics kernel — write [B, 4T], read it back
for the time-major transpose, write the transpose, read it in the
ballistics kernel.  At B=1024 x 1 s that is ~1.6 GB of HBM round-trip for
a 0.2 GB input; the round-5 roofline table (docs/BENCHMARKS.md) names it
the shared binder of the dBTP / DR-14 / goniometer rows.  Here the
oversampled samples are born in VMEM, feed the ballistics groups
immediately, and never touch HBM at all.

Layout (the proven time-major ballistics layout, ops/pallas_ballistics):
the batch is a full [8, 128] vector register; the input arrives
TIME-MAJOR as [T, nb, 8, 128] (one XLA transpose of [B, T] — 2 passes of
B*T, vs 8 passes of B*4T it replaces).  Grid = (batch_tiles,
time_chunks), sequential, so the carried state (z1, z2, m, p) and the
64-sample conv halo persist in VMEM scratch across time chunks.

Per 64 input samples (one polyphase frame, reference taps
jmeters/truepeakdsp.cc / zita resampler):

  frame GEMM   y4 = Mp2^T @ ext[64f : 64f+128]   — [256,128] @ [128,1024]
               (contraction over time sublanes; Mp2 is the stride-64
               [128, 256] frame matrix of ops/pallas_r128._tp_frame_mats
               TRANSPOSED, with its 17 zero pad rows moved to the FRONT so
               the frame window is a plain 128-row slice of [halo | x])
  ballistics   |y4| reshaped [64, 4, 8, 128]: 64 sequential 4-sample
               groups of the iec2-style attack/release recurrence
               (truepeakdsp.cc:58-107), identical math to
               ops/ballistics._run_ballistics

Precision: the frame GEMM runs the shared 3-pass bf16 hi/lo split
(== XLA Precision.HIGH — what the unfused ops/resample path uses); the
ballistics recurrence is exact f32 VPU, bitwise the same update rule as
the standalone kernel.  State clamps / g-scale / read-reset semantics
stay in the caller (ops/ballistics.true_peak_update).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bf16split import split2 as _split2
from .pallas_r128 import _tp_frame_mats, _NH

_SL = 8
_LN = 128
LANES = _SL * _LN  # 1024 streams per batch tile
_FRM = 64  # input samples per polyphase frame (stride)
_F32 = jnp.float32


@functools.lru_cache(maxsize=None)
def _frame_mats_tmajor() -> tuple[np.ndarray, np.ndarray]:
    """[256, 128] hi/lo bf16 frame operator for time-major frames.

    _tp_frame_mats gives Mp [128, 256] with rows [0:111] = the 111-tap
    frame (47 history + 64 new) and rows [111:128] zero.  Time-major
    frames slice 128 consecutive rows of [halo(64) | x], whose first
    64-47=17 rows are EXCESS history — so the zero rows must lead: shift
    the 111 tap rows to [17:128] and transpose for y4 = M @ frame."""
    mh, ml = _tp_frame_mats()  # bf16 [128, 256] hi/lo
    m = mh.astype(np.float32) + ml.astype(np.float32)
    m2 = np.zeros_like(m)
    m2[_LN - (_FRM + _NH):, :] = m[: _FRM + _NH, :]
    from .bf16split import split2_host

    h, l = split2_host(m2.T.copy())  # [256, 128]
    return h, l


def _kernel(w1, w2, w3, tchunk, mh_ref, ml_ref, x_ref, s0_ref, h0_ref,
            out_ref, hout_ref, s_scr, halo_scr, y4_scr):
    """x_ref [tchunk, 1, 8, 128]; s0/out [1, 4, 8, 128]; h0/hout
    [64, 1, 8, 128]; s_scr [4, 8, 128]; halo_scr [64, 8, 128]; y4_scr
    [64, 4, 8, 128] (one frame's oversampled groups — a REF because the
    group loop reads it at a traced index, which Mosaic only lowers for
    refs, exactly like pallas_ballistics' in_ref)."""
    tj = pl.program_id(1)

    @pl.when(tj == 0)
    def _():
        s_scr[...] = s0_ref[0]
        halo_scr[...] = h0_ref[:, 0]

    mh = mh_ref[...]
    ml = ml_ref[...]
    dot = functools.partial(
        jnp.dot, preferred_element_type=_F32
    )

    def conv_frame(fr):
        """|4x oversampled| samples of one [128, 8, 128] frame window
        (rows [64f : 64f+128] of [halo(64) | x(tchunk)]) -> y4_scr."""
        frf = fr.reshape(2 * _FRM, LANES)  # [128, 1024]
        fh, fl = _split2(frf)
        y = dot(mh, fh) + (dot(mh, fl) + dot(ml, fh))  # [256, 1024]
        y4_scr[...] = jnp.abs(y).reshape(_FRM, 4, _SL, _LN)

    def run_groups(carry):
        def group(g, c):
            z1, z2, m, p = c
            z1 = z1 * w3
            z2 = z2 * w3
            for j in range(4):
                t = y4_scr[g, j]
                # NaN-skipping branch semantics (ops/ballistics.py)
                z1 = jnp.where(t > z1, z1 + w1 * (t - z1), z1)
                z2 = jnp.where(t > z2, z2 + w2 * (t - z2), z2)
                p = jnp.where(t > p, t, p)
            m = jnp.maximum(m, z1 + z2)
            return z1, z2, m, p

        return jax.lax.fori_loop(0, _FRM, group, carry)

    # frame 0 crosses into the carried halo; later frames are plain
    # x slices — peeled so the concat runs once per tile, not per frame
    carry = (s_scr[0], s_scr[1], s_scr[2], s_scr[3])
    conv_frame(
        jnp.concatenate([halo_scr[...], x_ref[: _FRM, 0]], axis=0)
    )
    carry = run_groups(carry)

    def frame_step(f, c):
        conv_frame(x_ref[pl.ds((f - 1) * _FRM, 2 * _FRM), 0])
        return run_groups(c)

    z1, z2, m, p = jax.lax.fori_loop(
        1, tchunk // _FRM, frame_step, carry
    )
    s_scr[0] = z1
    s_scr[1] = z2
    s_scr[2] = m
    s_scr[3] = p
    halo_scr[...] = x_ref[tchunk - _FRM:, 0]

    @pl.when(tj == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = s_scr[...]
        hout_ref[:, 0] = halo_scr[...]


def _pick_tchunk(T: int, cap: int = 1024) -> int:
    best = _FRM
    for c in range(_FRM, cap + 1, _FRM):
        if T % c == 0:
            best = c
    return best


@functools.partial(
    jax.jit, static_argnames=("w1", "w2", "w3", "interpret")
)
def truepeak_pallas(
    x: jax.Array,
    hist: jax.Array,
    z1: jax.Array,
    z2: jax.Array,
    m: jax.Array,
    p: jax.Array,
    *,
    w1: float,
    w2: float,
    w3: float,
    interpret: bool = False,
):
    """Fused oversample+ballistics over x [B, T] (T % 64 == 0).

    hist is the [B, 47] resampler history; states z1/z2/m/p are [B]
    (entry clamps / m0/p0 zeroing already applied by the caller, exactly
    as for ops/ballistics._run_ballistics).  Returns
    (z1, z2, m, p, hist') with hist' the last 47 input samples."""
    B, T = x.shape
    assert T % _FRM == 0, T
    Bp = ((B + LANES - 1) // LANES) * LANES
    nb = Bp // LANES
    tchunk = _pick_tchunk(T)
    nt = T // tchunk

    xt = jnp.pad(x, ((0, Bp - B), (0, 0)))
    xt = xt.T.reshape(T, nb, _SL, _LN)  # time-major batch tiles
    # halo rows [64]: first 17 zero (frame-matrix pad), last 47 = history
    h = jnp.pad(hist, ((0, Bp - B), (_FRM - _NH, 0)))
    h0 = h.T.reshape(_FRM, nb, _SL, _LN)

    def pad(v):
        return jnp.pad(v, ((0, Bp - B),))

    s0 = jnp.stack([pad(z1), pad(z2), pad(m), pad(p)]).reshape(
        4, nb, _SL, _LN
    ).transpose(1, 0, 2, 3)

    mh, ml = (jnp.asarray(a) for a in _frame_mats_tmajor())

    kernel = functools.partial(
        _kernel, float(w1), float(w2), float(w3), tchunk
    )
    vm = pltpu.VMEM
    out, hout = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((256, _LN), lambda b, t: (0, 0), memory_space=vm),
            pl.BlockSpec((256, _LN), lambda b, t: (0, 0), memory_space=vm),
            pl.BlockSpec((tchunk, 1, _SL, _LN), lambda b, t: (t, b, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 4, _SL, _LN), lambda b, t: (b, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((_FRM, 1, _SL, _LN), lambda b, t: (0, b, 0, 0),
                         memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((1, 4, _SL, _LN), lambda b, t: (b, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((_FRM, 1, _SL, _LN), lambda b, t: (0, b, 0, 0),
                         memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 4, _SL, _LN), _F32),
            jax.ShapeDtypeStruct((_FRM, nb, _SL, _LN), _F32),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, _SL, _LN), _F32),
            pltpu.VMEM((_FRM, _SL, _LN), _F32),
            pltpu.VMEM((_FRM, 4, _SL, _LN), _F32),
        ],
        interpret=interpret,
    )(mh, ml, xt, s0, h0)

    out = out.transpose(1, 0, 2, 3).reshape(4, Bp)[:, :B]
    histf = hout.reshape(_FRM, Bp).T[:B, _FRM - _NH:]
    return out[0], out[1], out[2], out[3], histf


def available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
