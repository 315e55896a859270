"""Shared bf16 split helpers for the Pallas kernels.

Mosaic lowers a plain f32 ``jnp.dot`` to a SINGLE bf16 MXU pass (~2e-3
relative error — fails the ±0.01 dB parity budget), so every kernel GEMM
runs as multiple bf16 passes over hi/lo splits of both operands:

- 2-way split + 3 passes (drop the lo*lo term) == Precision.HIGH, fine
  for feed-forward conv/injection operands;
- 3-way split + 6 passes (drop the <=2^-24-relative cross terms) is
  f32-exact, required for state-PROPAGATION operators and display-bin
  math (the state-chain precision law, see CLAUDE.md and
  docs/BENCHMARKS.md "precision anatomy").

One home for the split/pass algebra so a precision fix lands once, not
in each of pallas_r128 / pallas_spectrum / pallas_stft.  The *_host
variants are pure numpy (ml_dtypes): they run on host even inside a jit
trace, so operator splits embed as constants, never tracers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _np_bf16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def split2_host(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """2-way bf16 hi/lo split (residual ~2^-16 rel)."""
    bf16 = _np_bf16()
    a = np.asarray(a, np.float32)
    hi = a.astype(bf16)
    lo = (a - hi.astype(np.float32)).astype(bf16)
    return hi, lo


def split3_host(a: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact 3-way bf16 split (hi+mid+lo == a for f32 inputs)."""
    bf16 = _np_bf16()
    a = np.asarray(a, np.float32)
    hi = a.astype(bf16)
    r = a - hi.astype(np.float32)
    mid = r.astype(bf16)
    lo = (r - mid.astype(np.float32)).astype(bf16)
    return hi, mid, lo


def split2(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    hi = a.astype(_BF16)
    return hi, (a - hi.astype(_F32)).astype(_BF16)


def split3(a: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    hi = a.astype(_BF16)
    r = a - hi.astype(_F32)
    mid = r.astype(_BF16)
    lo = (r - mid.astype(_F32)).astype(_BF16)
    return hi, mid, lo


def dot3(a: jax.Array, b2) -> jax.Array:
    """Precision.HIGH-equivalent a @ b as 3 bf16 MXU passes (2-way hi/lo
    splits, drop the lo*lo term)."""
    ah, al = split2(a)
    bh, bl = b2
    d = functools.partial(jnp.dot, preferred_element_type=_F32)
    return (d(ah, bl) + d(al, bh)) + d(ah, bh)


def dot6(a: jax.Array, b3) -> jax.Array:
    """f32-exact a @ b as 6 bf16 MXU passes (3-way splits, drop the
    <=2^-24-relative cross terms), summed smallest-first."""
    ah, am, al = split3(a)
    bh, bm, bl = b3
    d = functools.partial(jnp.dot, preferred_element_type=_F32)
    return (
        (d(ah, bl) + d(al, bh) + d(am, bm))
        + (d(ah, bm) + d(am, bh))
        + d(ah, bh)
    )
