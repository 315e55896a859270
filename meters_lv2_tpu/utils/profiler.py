"""Profiling / tracing utilities (SURVEY.md §5: the reference has none —
only disabled printf counters, src/ebulv2.cc:232-237; a production batch
framework needs real tooling).

Two layers:

- time_op: fetch-synchronized wall timing.  On the axon TPU backend
  `jax.block_until_ready` can return before execution (it only guarantees
  enqueue for small programs — measured in docs/BENCHMARKS.md round 2), so
  the ONLY reliable completion barrier is a device->host copy; every
  timing here ends with one.
- trace: context manager around jax.profiler for XLA-level traces
  (TensorBoard / xprof viewable), when supported by the backend.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def _fetch_barrier(tree) -> None:
    """Force completion: host-copy ONE ELEMENT of the first array leaf.

    On the axon backend block_until_ready can return at enqueue time
    (docs/BENCHMARKS.md round 2) — a device->host fetch is the only
    reliable barrier.  The fetch is a single element, not the whole
    leaf: the element's producing slice is enqueued after the timed
    dispatches, so its arrival still proves they completed, without
    billing the timed region for a multi-MB state transfer through the
    tunnel (a [B,2,8192] STFT tail fetched whole costs more than the
    analyzer program it barriers — measured round 4)."""
    leaves = jax.tree_util.tree_leaves(tree)
    for leaf in leaves:
        # barrier on the first DEVICE array with at least one element;
        # host scalars/empty arrays prove nothing about device work
        if isinstance(leaf, jax.Array) and getattr(leaf, "size", 0):
            el = leaf[(0,) * leaf.ndim]
            arr = np.asarray(el)
            del arr
            return
    if leaves:  # no device leaf: materialize whatever is first (total)
        np.asarray(leaves[0])


def time_op(fn, *args, iters: int = 10, warmup: int = 2, best_of: int = 3,
            **kwargs):
    """Fetch-synchronized timing of fn(*args, **kwargs).

    Returns a dict {ms_per_call, calls_per_s, iters}.  fn is called in a
    pipelined loop of `iters` dispatches ended by one host fetch (matching
    production dispatch patterns); best of `best_of` loops.
    """
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    _fetch_barrier(out)
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kwargs)
        _fetch_barrier(out)
        best = min(best, time.perf_counter() - t0)
    return {
        "ms_per_call": best / iters * 1e3,
        "calls_per_s": iters / best,
        "iters": iters,
    }


def meter_throughput(meter, batch_shape, chunk_samples: int, fs: float,
                     nchan: int | None = None, iters: int = 10):
    """x-realtime throughput of meter.update at a given operating point,
    with the fetch-barrier methodology (see bench.py)."""
    import jax.numpy as jnp

    shape = (*batch_shape, *( (nchan,) if nchan else () ), chunk_samples)
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    st = meter.init(batch_shape)
    if hasattr(meter, "update"):
        upd = jax.jit(meter.update)
        r = time_op(lambda s: upd(s, x), st, iters=iters)
    else:  # display processors (goniometer/phasewheel/stereoscope)
        proc = jax.jit(lambda s, v: meter.process(s, v)[1])
        r = time_op(lambda s: proc(s, x), st, iters=iters)
    streams = int(np.prod(batch_shape)) if batch_shape else 1
    stream_seconds = streams * chunk_samples / fs
    r["x_realtime"] = stream_seconds / (r["ms_per_call"] / 1e3)
    return r


@contextlib.contextmanager
def trace(logdir: str):
    """XLA profiler trace around a block (view with TensorBoard/xprof).

    Falls back to a no-op if the backend/plugin does not support tracing
    (the remote axon tunnel may not)."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
