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
    factor, k2 = taps.shape
    nh = k2 - 1
    *batch, T = x.shape
    xp = jnp.concatenate([hist, x], axis=-1)
    n = int(np.prod(batch)) if batch else 1
    out = jax.lax.conv_general_dilated(
        xp.reshape(n, 1, T + nh),
        taps.reshape(factor, 1, k2),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    up = jnp.moveaxis(out, 1, 2).reshape(*batch, factor * T)
    return up, xp[..., -nh:]


def upsample4_taps(dtype=jnp.float32) -> jax.Array:
    """[4, 48] phase filters (float64 design, float32 constants)."""
    return jnp.asarray(upsample4_kernel(_HL), dtype)


def upsample4_init(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    """History buffer of 2*hl-1 zeros (equivalent to the zero prefeed)."""
    return jnp.zeros((*batch_shape, _HIST), dtype)


def upsample4(
    x: jax.Array, hist: jax.Array, taps: jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """Upsample a block 4x.

    Args:
      x: [..., T] input block.
      hist: [..., 47] carried history (upsample4_init at stream start).

    Returns:
      (up, new_hist): up [..., 4*T] oversampled stream aligned like the
      reference (up[4t+ph] uses inputs ... x[t]); new_hist [..., 47].
    """
    if taps is None:
        taps = upsample4_taps(x.dtype)
    *batch, T = x.shape
    xp = jnp.concatenate([hist, x], axis=-1)  # [..., T + 47]
    n = int(np.prod(batch)) if batch else 1
    lhs = xp.reshape(n, 1, T + _HIST)
    rhs = taps.reshape(4, 1, 2 * _HL)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # [n, 4, T]
    up = jnp.moveaxis(out, 1, 2).reshape(*batch, 4 * T)
    new_hist = xp[..., -_HIST:]
    return up, new_hist
