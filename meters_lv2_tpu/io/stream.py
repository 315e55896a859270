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


def chunk_array(x: np.ndarray, chunk: int, pad: bool = True) -> Iterator[np.ndarray]:
    """Split [..., T] into chunk-sized pieces.

    `chunk` is rounded DOWN to a multiple of 4 (the meters' minimum
    block granularity) so that no zeros are ever injected mid-stream —
    e.g. a naive 0.5 s chunk at 44.1 kHz (22050) would otherwise need 2
    pad samples after EVERY piece.  With pad=True only the final piece
    is zero-padded up to the 4-grain; pad=False yields exact lengths for
    callers that enforce the padding-never-measured invariant themselves
    (e.g. the live shell, which measures only the 4-aligned prefix of
    each block)."""
    chunk = max(4, chunk // 4 * 4)
    T = x.shape[-1]
    for i in range(0, T, chunk):
        piece = x[..., i : i + chunk]
        rem = (-piece.shape[-1]) % 4
        if pad and rem:
            piece = np.pad(piece, [(0, 0)] * (piece.ndim - 1) + [(0, rem)])
        yield piece


def _jitted_update(meter):
    """Per-meter cached jax.jit(meter.update): a fresh wrapper per call
    would retrace the update (seconds for Pallas-bearing meters) on
    every file of a batch job."""
    import jax

    fn = meter.__dict__.get("_stream_jit_update")
    if fn is None:
        fn = meter.__dict__["_stream_jit_update"] = jax.jit(meter.update)
    return fn


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

    update = _jitted_update(meter)
    for i, blk in enumerate(blocks):
        state = update(state, jnp.asarray(blk))
        if read_every and (i + 1) % read_every == 0:
            out, state = meter.read(state)
            if on_read is not None:
                on_read(i, jax.device_get(out))
    return state


def stream_pipelined(
    meter,
    state,
    blocks: Iterable[np.ndarray],
    depth: int = 2,
    read_every: int = 0,
    on_read: Callable | None = None,
):
    """Double-buffered host→device ingest.

    `jax.device_put` is asynchronous: it enqueues the DMA and returns
    immediately, so keeping `depth` blocks in flight overlaps host decode
    + PCIe/DMA transfer with device compute instead of serializing them
    (the reference has no such concern — its blocks arrive in the JACK
    callback — but a batch TPU job ingesting ~100 MB/s per 256-stream
    second does; see docs/BENCHMARKS.md "Host→device ingest").

    Semantically identical to stream(): same updates in the same order.

    Measured (2026-08-16, B=32x1s chunks): through the axon development
    tunnel both paths run ~150x rt — the tunnel serializes host→device
    copies (~60 MB/s), so prefetch depth cannot help there; the overlap
    targets locally-attached chips (PCIe/DMA ≳10 GB/s), where transfer
    per 1 s chunk is ~1 ms against ~2 ms compute.
    """
    import jax
    import jax.numpy as jnp

    from collections import deque

    assert depth >= 1
    update = _jitted_update(meter)
    it = iter(blocks)
    q: deque = deque()

    def prefetch():
        blk = next(it, None)
        if blk is not None:
            # committed async copy; compute on previous blocks proceeds
            q.append(jax.device_put(jnp.asarray(blk)))

    for _ in range(depth):
        prefetch()
    i = 0
    while q:
        xb = q.popleft()
        state = update(state, xb)
        prefetch()
        if read_every and (i + 1) % read_every == 0:
            out, state = meter.read(state)
            if on_read is not None:
                on_read(i, jax.device_get(out))
        i += 1
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
