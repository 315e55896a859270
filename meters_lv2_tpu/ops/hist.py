"""TPU-friendly histogramming and streaming statistics.

XLA lowers scatter-with-duplicate-indices sequentially on TPU, so
per-sample histograms (sigdist's 361-bin sample-value histogram,
bitmeter's exponent stats, DR-14's 8000-bin RMS histogram) use the
one-hot-matmul trick instead: chunk the sample stream, build a
[chunk, nbins] one-hot in VMEM and accumulate counts as a matmul — the MXU
does the binning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bincount(
    ids: jax.Array,
    nbins: int,
    weights: jax.Array | None = None,
    valid: jax.Array | None = None,
    chunk: int = 8192,
    dtype=jnp.float32,
) -> jax.Array:
    """Histogram of integer ids along the last axis.

    Args:
      ids: [..., T] int32 bin indices; out-of-range ids are dropped.
      nbins: static bin count.
      weights: optional [..., T] per-sample weights (default 1).
      valid: optional [..., T] bool mask.
      chunk: samples per one-hot block (VMEM-sized).

    Returns counts [..., nbins] in `dtype`.
    """
    *batch, T = ids.shape
    ok = (ids >= 0) & (ids < nbins)
    if valid is not None:
        ok = ok & valid
    w = jnp.where(ok, 1.0 if weights is None else weights, 0.0).astype(dtype)
    idc = jnp.clip(ids, 0, nbins - 1)

    pad = (-T) % chunk
    if pad:
        idc = jnp.concatenate(
            [idc, jnp.zeros((*batch, pad), idc.dtype)], axis=-1
        )
        w = jnp.concatenate([w, jnp.zeros((*batch, pad), w.dtype)], axis=-1)
    n_chunks = idc.shape[-1] // chunk
    idc = jnp.moveaxis(idc.reshape(*batch, n_chunks, chunk), -2, 0)
    w = jnp.moveaxis(w.reshape(*batch, n_chunks, chunk), -2, 0)

    def step(acc, args):
        ic, wc = args  # [..., chunk]
        onehot = (
            ic[..., None] == jnp.arange(nbins, dtype=ic.dtype)
        ).astype(dtype)  # [..., chunk, nbins]
        return acc + jnp.einsum(
            "...c,...cb->...b", wc, onehot,
            precision=jax.lax.Precision.HIGHEST,
        ), None

    acc0 = jnp.zeros((*batch, nbins), dtype)
    acc, _ = jax.lax.scan(step, acc0, (idc, w))
    return acc


def welford_block(x: jax.Array, valid: jax.Array | None = None):
    """Per-block (count, mean, M2) along the last axis for variance merging."""
    if valid is None:
        n = jnp.full(x.shape[:-1], x.shape[-1], x.dtype)
        mean = jnp.mean(x, axis=-1)
        m2 = jnp.sum(jnp.square(x - mean[..., None]), axis=-1)
    else:
        n = valid.sum(-1).astype(x.dtype)
        nsafe = jnp.maximum(n, 1.0)
        xm = jnp.where(valid, x, 0.0)
        mean = xm.sum(-1) / nsafe
        m2 = jnp.where(valid, jnp.square(x - mean[..., None]), 0.0).sum(-1)
    return n, mean, m2


def welford_merge(a, b):
    """Chan et al. parallel variance merge of (n, mean, M2) pytrees."""
    na, ma, m2a = a
    nb, mb, m2b = b
    n = na + nb
    nsafe = jnp.maximum(n, 1.0)
    d = mb - ma
    mean = ma + d * (nb / nsafe)
    m2 = m2a + m2b + jnp.square(d) * na * nb / nsafe
    return n, mean, m2
