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
      dtype: accumulator dtype.  Integer dtypes are exact: the per-chunk
        one-hot matmul runs in f32 on the MXU (exact for counts < 2^24,
        guaranteed by chunk <= 2^24) and is cast before accumulation — the
        reference uses integer counters (src/bitmeter.c:75-105,
        src/dr14.c:89) and overflows only at 2^31.

    Returns counts [..., nbins] in `dtype`.
    """
    *batch, T = ids.shape
    integer = jnp.issubdtype(jnp.dtype(dtype), jnp.integer)
    mm_dtype = jnp.float32 if integer else dtype
    ok = (ids >= 0) & (ids < nbins)
    if valid is not None:
        ok = ok & valid
    w = jnp.where(ok, 1.0 if weights is None else weights, 0.0).astype(mm_dtype)
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
        ).astype(mm_dtype)  # [..., chunk, nbins]
        counts = jnp.einsum(
            "...c,...cb->...b", wc, onehot,
            precision=jax.lax.Precision.HIGHEST,
        )
        return acc + counts.astype(dtype), None

    acc0 = jnp.zeros((*batch, nbins), dtype)
    acc, _ = jax.lax.scan(step, acc0, (idc, w))
    return acc


def welford_block(x: jax.Array, valid: jax.Array | None = None):
    """Per-block (count, mean, M2) along the last axis for variance merging.

    The count is int32 (exact past 2^24, where a float count would silently
    stop incrementing); mean/M2 stay in x.dtype.
    """
    if valid is None:
        n = jnp.full(x.shape[:-1], x.shape[-1], jnp.int32)
        mean = jnp.mean(x, axis=-1)
        m2 = jnp.sum(jnp.square(x - mean[..., None]), axis=-1)
    else:
        n = valid.sum(-1, dtype=jnp.int32)
        nsafe = jnp.maximum(n.astype(x.dtype), 1.0)
        xm = jnp.where(valid, x, 0.0)
        mean = xm.sum(-1) / nsafe
        m2 = jnp.where(valid, jnp.square(x - mean[..., None]), 0.0).sum(-1)
    return n, mean, m2


def welford_merge(a, b):
    """Chan et al. parallel variance merge of (n, mean, M2) pytrees."""
    na, ma, m2a = a
    nb, mb, m2b = b
    n = na + nb  # int32, exact
    naf = na.astype(ma.dtype)
    nbf = nb.astype(ma.dtype)
    nsafe = jnp.maximum(naf + nbf, 1.0)
    d = mb - ma
    mean = ma + d * (nbf / nsafe)
    m2 = m2a + m2b + jnp.square(d) * naf * nbf / nsafe
    return n, mean, m2
