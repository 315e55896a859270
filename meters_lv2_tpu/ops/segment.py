"""Shifted segment reduction — the fragment/window assembly primitive.

Streaming meters accumulate fixed-length windows (R128's fs/20 fragments,
DR-14's 3 s windows) that are NOT aligned to the caller's block boundaries:
the block must be placed at a traced per-stream offset before an aligned
reduce.  Shifting per sample is poison on TPU (vmapped dynamic_slice lowers
to a while loop over the batch; a modular gather over ~100k elements is
20x worse).  Instead:

  1. reduce p into subchunk sums/maxes at granularity g | seg_len, split at
     the intra-subchunk offset r = off % g via two masked reductions
     (pure VPU, no data movement);
  2. shift the ~T/g-element subchunk array by q = off // g (a tiny gather);
  3. aligned reshape-reduce to segments.

Exact in exact arithmetic; float32 summation order is a balanced tree
(better conditioned than the reference's sequential adds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pick_g(seg_len: int, cap: int = 64) -> int:
    g = 1
    for c in range(1, cap + 1):
        if seg_len % c == 0:
            g = c
    return g


def _small_roll(a: jax.Array, q: jax.Array) -> jax.Array:
    """Roll last axis right by traced q (zeros wrap from the padded tail);
    array is small (~T/g) so a modular gather is cheap."""
    n = a.shape[-1]
    idx = (jnp.arange(n, dtype=jnp.int32) - q[..., None]) % n
    return jnp.take_along_axis(a, jnp.broadcast_to(idx, a.shape), axis=-1)


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
    g = _pick_g(seg_len)
    nsub = L // g
    op = jnp.sum if reduce == "sum" else jnp.max

    pad = jnp.zeros((*batch, L - T), p.dtype)
    pp = jnp.concatenate([p, pad], -1).reshape(*batch, nsub, g)

    r = (off % g)[..., None, None]  # [..., 1, 1]
    q = off // g
    w = jnp.arange(g, dtype=jnp.int32)
    head_mask = w < (g - r)  # first (g - r) samples of each subchunk
    if reduce == "sum":
        a = jnp.sum(jnp.where(head_mask, pp, 0.0), -1)
        b = jnp.sum(jnp.where(head_mask, 0.0, pp), -1)
    else:
        a = jnp.max(jnp.where(head_mask, pp, 0.0), -1)
        b = jnp.max(jnp.where(head_mask, 0.0, pp), -1)

    # shifted subchunk k = b[k - q - 1] (+|max) a[k - q]
    a_s = _small_roll(a, q)
    b_s = _small_roll(b, q + 1)
    sub = a_s + b_s if reduce == "sum" else jnp.maximum(a_s, b_s)

    # wrap hygiene: _small_roll wraps modularly, but every wrapped-in
    # element comes from the zero padding (L - T >= seg_len > off), so the
    # identity is preserved without extra masking.
    return op(sub.reshape(*batch, n_slots, seg_len // g), -1)
