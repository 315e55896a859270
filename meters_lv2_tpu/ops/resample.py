"""4x polyphase oversampling for true-peak detection, as a batched MXU conv.

Replaces the sequential two-sided MAC of zita-resampler
(resampler.cc:189-262) with a single causal convolution: the oversampled
stream is

    up[4*t + ph] = sum_{k=-hl}^{hl-1} x[t - hl - k] * h(k + ph/4)

(see ops/design.upsample4_kernel).  Phase 0 is a pure hl-sample delay, so
the reference's alignment — including its 8192-zero prefeed at init
(truepeakdsp.cc:159-168) — is reproduced by zero history at stream start.
The 47-sample input history is carried across blocks for streaming use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .design import upsample4_kernel, upsample_poly_kernel

_HL = 24
_HIST = 2 * _HL - 1  # 47 samples of history


def upsample_taps(factor: int, hl: int, dtype=jnp.float32) -> jax.Array:
    """[factor, 2*hl] polyphase filters for integer-factor oversampling."""
    return jnp.asarray(upsample_poly_kernel(factor, hl), dtype)


_BLOCK_MATS: dict[tuple, np.ndarray] = {}


def _block_matrix(taps: np.ndarray, tb: int) -> np.ndarray:
    """Dense block operator M [tb + K - 1, factor*tb] with
    M[j+i, factor*j + ph] = taps[ph, i] — one MXU GEMM produces factor*tb
    outputs from tb inputs + (K-1)-sample halo.

    XLA lowers the equivalent 1-channel conv off the MXU (~100x slower on
    TPU); this keeps the FIR on the systolic array.
    """
    factor, K = taps.shape
    key = (taps.tobytes(), tb)
    if key not in _BLOCK_MATS:
        M = np.zeros((tb + K - 1, factor * tb), np.float32)
        for j in range(tb):
            for ph in range(factor):
                M[j : j + K, factor * j + ph] = taps[ph]
        _BLOCK_MATS[key] = M
    return _BLOCK_MATS[key]


def _upsample_blocked(
    x: jax.Array, hist: jax.Array, taps_np: np.ndarray, tb: int = 128
) -> tuple[jax.Array, jax.Array]:
    """Core polyphase upsampler as overlapping-block GEMMs.

    x [..., T], hist [..., K-1] -> (up [..., factor*T], new_hist).
    Overlapping frames are assembled from plain reshapes/slices (no
    gather): frame n = [block_n, head of block_{n+1}].
    """
    factor, K = taps_np.shape
    nh = K - 1
    *batch, T = x.shape
    main = (T // tb) * tb
    xp = jnp.concatenate([hist, x], axis=-1)  # [..., nh + T]
    outs = []
    segments = []
    if main:
        segments.append((0, main, tb))
    if T - main:
        segments.append((main, T, T - main))
    for start, end, step in segments:
        seg = xp[..., start : end + nh]  # [..., L + nh]
        L = end - start
        nblk = L // step
        blocks = seg[..., :L].reshape(*batch, nblk, step)
        heads_mid = blocks[..., 1:, :nh] if step >= nh else None
        tail = seg[..., L:][..., None, :]  # [..., 1, nh]
        if step >= nh:
            heads = jnp.concatenate([heads_mid, tail], axis=-2)
        else:
            # step < nh: heads overlap multiple blocks; fall back to stack
            heads = jnp.stack(
                [seg[..., (n + 1) * step : (n + 1) * step + nh]
                 for n in range(nblk)],
                axis=-2,
            )
        frames = jnp.concatenate([blocks, heads], axis=-1)  # [..., nblk, step+nh]
        M = jnp.asarray(_block_matrix(taps_np, step))
        from .lti import _HIGH

        y = jnp.matmul(frames, M, precision=_HIGH)
        outs.append(y.reshape(*batch, factor * L))
    up = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    return up, xp[..., -nh:]


def upsample_init(batch_shape=(), hl: int = _HL, dtype=jnp.float32) -> jax.Array:
    return jnp.zeros((*batch_shape, 2 * hl - 1), dtype)


def upsample(
    x: jax.Array, hist: jax.Array, taps: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Integer-factor polyphase upsampling (generalises upsample4).

    x [..., T], hist [..., 2*hl-1], taps [factor, 2*hl] →
    (up [..., factor*T], new_hist).  Used by the goniometer's optional
    2x/4x/8x oversampling (gui/goniometer.c:155-189, hlen=12).
    """
    return _upsample_blocked(x, hist, np.asarray(taps, np.float32))


def upsample4_taps(dtype=jnp.float32) -> jax.Array:
    """[4, 48] phase filters (float64 design, float32 constants)."""
    return jnp.asarray(upsample4_kernel(_HL), dtype)


def upsample4_init(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    """History buffer of 2*hl-1 zeros (equivalent to the zero prefeed)."""
    return jnp.zeros((*batch_shape, _HIST), dtype)


def upsample4_absmax(
    x: jax.Array, hist: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """max |4x-oversampled stream| over the block, without materializing it.

    The reduce happens directly on each block-GEMM output (the layout ops
    of assembling the full 4T stream would force an HBM round trip of 16
    bytes/sample).  Exactly TruePeakdsp::process_max (truepeakdsp.cc:109-131)
    over one block.  Returns (absmax [...], new_hist).
    """
    taps_np = upsample4_kernel(_HL).astype(np.float32)
    factor, K = taps_np.shape
    nh = K - 1
    *batch, T = x.shape
    tb = 128
    main = (T // tb) * tb
    xp = jnp.concatenate([hist, x], axis=-1)
    from .lti import _HIGH

    best = jnp.zeros((*batch,), x.dtype)
    segments = []
    if main:
        segments.append((0, main, tb))
    if T - main:
        segments.append((main, T, T - main))
    for start, end, step in segments:
        seg = xp[..., start : end + nh]
        L = end - start
        nblk = L // step
        blocks = seg[..., :L].reshape(*batch, nblk, step)
        tail = seg[..., L:][..., None, :]
        if step >= nh:
            heads = jnp.concatenate([blocks[..., 1:, :nh], tail], axis=-2)
        else:
            heads = jnp.stack(
                [seg[..., (n + 1) * step : (n + 1) * step + nh]
                 for n in range(nblk)], axis=-2,
            )
        frames = jnp.concatenate([blocks, heads], axis=-1)
        M = jnp.asarray(_block_matrix(taps_np, step))
        y = jnp.matmul(frames, M, precision=_HIGH)
        best = jnp.maximum(best, jnp.max(jnp.abs(y), axis=(-2, -1)))
    return best, xp[..., -nh:]


def upsample4(x: jax.Array, hist: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Upsample a block 4x.

    Args:
      x: [..., T] input block.
      hist: [..., 47] carried history (upsample4_init at stream start).

    Returns:
      (up, new_hist): up [..., 4*T] oversampled stream aligned like the
      reference (up[4t+ph] uses inputs ... x[t]); new_hist [..., 47].
    """
    return _upsample_blocked(x, hist, upsample4_kernel(_HL).astype(np.float32))
