"""Shifted segment reduction — the fragment/window assembly primitive.

Streaming meters accumulate fixed-length windows (R128's fs/20 fragments,
DR-14's 3 s windows) that are NOT aligned to the caller's block boundaries:
the block must be placed at a traced per-stream sample offset before an
aligned reshape-reduce.

Measured lowerings for the shift on TPU v5e (B=128, T=96k):
  * vmapped dynamic_slice on a doubled buffer — XLA emits a while loop over
    the batch, but each iteration is one contiguous copy: fastest overall.
  * modular take_along_axis gather — catastrophic (20x slower; minor-dim
    gather at ~100k elements).
  * two-level masked subchunk reduce — pure VPU but the g=60-lane layout
    pads to 128 lanes and loses to the copy loop.
So: vmapped dynamic_slice it is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roll_right(a: jax.Array, off: jax.Array) -> jax.Array:
    """Roll last axis right by traced per-batch-element off samples
    (dynamic_slice on a doubled buffer, vmapped over the batch)."""
    L = a.shape[-1]

    def roll1(v, o):
        return jax.lax.dynamic_slice(jnp.concatenate([v, v]), (L - o,), (L,))

    if a.ndim == 1:
        return roll1(a, off)
    batch = a.shape[:-1]
    out = jax.vmap(roll1)(a.reshape(-1, L), off.reshape(-1))
    return out.reshape(*batch, L)


def shifted_segments(
    p: jax.Array,
    off: jax.Array,
    seg_len: int,
    n_slots: int,
    reduce: str = "sum",
) -> jax.Array:
    """Segment-reduce p placed at sample offset `off` on a seg_len grid.

    Args:
      p: [..., T] values (T <= n_slots*seg_len - off guaranteed by caller
         choosing n_slots = T // seg_len + 2).
      off: [...] int32 offset in [0, seg_len).
      reduce: 'sum' or 'max' (max uses identity 0 — callers floor at 0,
         matching the reference peak trackers).

    Returns [..., n_slots] per-segment reductions of the shifted stream
    (positions [0, off) and beyond off+T contribute the identity).
    """
    *batch, T = p.shape
    L = n_slots * seg_len
    pad = jnp.zeros((*batch, L - T), p.dtype)
    ps = roll_right(jnp.concatenate([p, pad], -1), off)
    seg = ps.reshape(*batch, n_slots, seg_len)
    if reduce == "sum":
        return jnp.sum(seg, -1)
    return jnp.maximum(jnp.max(seg, -1), 0.0)
