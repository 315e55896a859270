"""Streaming ingest: feed long files / live captures through a meter with
bounded memory and host/device overlap.

JAX dispatch is asynchronous: update(n+1) is enqueued while the device
still runs update(n), so a simple loop already overlaps host decode with
device compute; this utility adds the chunking/padding discipline and a
readout cadence, mirroring the reference's block-streaming run() loop.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import numpy as np


def chunk_array(x: np.ndarray, chunk: int) -> Iterator[np.ndarray]:
    """Split [..., T] into chunk-sized pieces; final piece zero-padded to a
    multiple of 4 (the meters' minimum block granularity)."""
    T = x.shape[-1]
    for i in range(0, T, chunk):
        piece = x[..., i : i + chunk]
        rem = (-piece.shape[-1]) % 4
        if rem:
            piece = np.pad(piece, [(0, 0)] * (piece.ndim - 1) + [(0, rem)])
        yield piece


def stream(
    meter,
    state,
    blocks: Iterable[np.ndarray],
    read_every: int = 0,
    on_read: Callable | None = None,
):
    """Run a block iterator through meter.update with optional periodic
    readouts (read_every blocks; 0 = never).  Returns the final state."""
    import jax
    import jax.numpy as jnp

    update = jax.jit(meter.update)
    for i, blk in enumerate(blocks):
        state = update(state, jnp.asarray(blk))
        if read_every and (i + 1) % read_every == 0:
            out, state = meter.read(state)
            if on_read is not None:
                on_read(i, jax.device_get(out))
    return state


def stream_wav(meter, path: str, chunk_seconds: float = 2.0, **kw):
    """Decode a WAV (native codec) and stream it through a fresh meter
    state; returns (final readout, final state)."""
    import jax

    from .wav import read_wav

    x, rate = read_wav(path)
    assert abs(rate - meter.fs) < 1, (rate, meter.fs)
    state = meter.init(())
    chunk = int(rate * chunk_seconds)
    state = stream(meter, state, chunk_array(x, chunk), **kw)
    out, state = meter.read(state)
    return jax.device_get(out), state
