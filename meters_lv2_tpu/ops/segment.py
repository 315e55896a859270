"""Shifted segment reduction — the fragment/window assembly primitive.

Streaming meters accumulate fixed-length windows (R128's fs/20 fragments,
DR-14's 3 s windows) that are NOT aligned to the caller's block boundaries:
the block must be placed at a traced per-stream sample offset before an
aligned reshape-reduce.

Measured lowerings for the shift on TPU v5e (B=128, T=96k), slowest first:
  * modular take_along_axis gather: catastrophic (minor-dim gather, ~20x).
  * two-level masked subchunk reduce at g=60: non-128 lane rows pad badly.
  * vmapped dynamic_slice on a doubled buffer: while-of-copies, ~3.2 ms.
  * (kept) masked head/tail reductions at g = seg_len: the shift becomes a
    STATIC one-row offset — no data movement, well-shaped 2400-lane rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def shifted_segments(
    p: jax.Array,
    off: jax.Array,
    seg_len: int,
    n_slots: int,
    reduce: str = "sum",
) -> jax.Array:
    """Segment-reduce p placed at sample offset `off` on a seg_len grid.

    No data movement at all: shifted segment f spans the tail (`off`
    samples) of unshifted row f-1 plus the head of row f, so two masked
    reductions over the [n_slots, seg_len] view plus a static one-row shift
    give the result.  (Dynamic shifting was 0.5-20x slower in every
    lowering tried — see the module docstring.)

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
    # n_slots == 1 cannot represent a boundary crossing: with off > 0 the
    # post-boundary reduction lands in slot 1, and .at[..., 1] would be
    # silently dropped as out-of-bounds (callers use T // seg_len + 2 >= 2)
    assert n_slots >= 2, n_slots
    if seg_len >= T:
        # long-window fast path (e.g. DR-14's 3 s windows fed 1 s blocks):
        # at most one boundary falls inside the block, so two masked
        # reductions over the unpadded [..., T] suffice — the general path
        # below pads to n_slots*seg_len (a >= 2x data blowup here)
        t = jnp.arange(T, dtype=jnp.int32)
        in0 = t < (seg_len - off[..., None])  # [..., T]
        if reduce == "sum":
            r0 = jnp.sum(jnp.where(in0, p, 0.0), -1)
            r1 = jnp.sum(jnp.where(in0, 0.0, p), -1)
        else:
            r0 = jnp.max(jnp.where(in0, p, 0.0), -1)
            r1 = jnp.max(jnp.where(in0, 0.0, p), -1)
        out = jnp.zeros((*batch, n_slots), p.dtype)
        return out.at[..., 0].set(r0).at[..., 1].set(r1)
    L = n_slots * seg_len
    pad = jnp.zeros((*batch, L - T), p.dtype)
    rows = jnp.concatenate([p, pad], -1).reshape(*batch, n_slots, seg_len)
    w = jnp.arange(seg_len, dtype=jnp.int32)
    head = w < (seg_len - off[..., None, None])  # [..., 1, seg_len]
    if reduce == "sum":
        a = jnp.sum(jnp.where(head, rows, 0.0), -1)
        b = jnp.sum(jnp.where(head, 0.0, rows), -1)
        return a + jnp.concatenate([jnp.zeros_like(b[..., :1]), b[..., :-1]], -1)
    a = jnp.max(jnp.where(head, rows, 0.0), -1)
    b = jnp.max(jnp.where(head, 0.0, rows), -1)
    return jnp.maximum(
        a, jnp.concatenate([jnp.zeros_like(b[..., :1]), b[..., :-1]], -1)
    )
