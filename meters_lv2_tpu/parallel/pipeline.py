"""Fused multi-meter pipeline: one jitted graph running any set of meters
over a block stream (SURVEY.md §7 L2).

The reference runs one plugin instance per track; a session (e.g. a
mastering QA pass) wants several meters on the same audio.  MeterPipeline
shares the input stream across meters inside a single XLA program, so
common subexpressions fuse and the audio is read from HBM once.

    pipe = MeterPipeline({"r128": EbuR128Meter(fs), "k20": KMeter(fs)})
    state = pipe.init(batch_shape)            # audio is [..., C, T]
    state = pipe.update(state, x)
    outs, state = pipe.read(state)            # {"r128": {...}, "k20": {...}}

`run_stream` lax.scans update over time chunks for bounded-memory long
files under a single jit.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

# how each meter family consumes the [..., C, T] pipeline input
_MODES = {
    # per-channel scalar meters: channel axis becomes a state batch axis
    "VUMeter": "per_channel",
    "DINMeter": "per_channel",
    "NordicMeter": "per_channel",
    "BBCMeter": "per_channel",
    "EBUMeter": "per_channel",
    "KMeter": "per_channel",
    "K12Meter": "per_channel",
    "K14Meter": "per_channel",
    "K20Meter": "per_channel",
    "TruePeakMeter": "per_channel",
    # whole-signal multichannel meters
    "EbuR128Meter": "multi",
    "BBCMidSideMeter": "multi",
    "CorrelationMeter": "multi",
    "DR14Meter": "multi",
    "TPnRMSMeter": "multi",
    "Goniometer": "multi",
    "PhaseWheel": "multi",
    "Stereoscope": "multi",
    # mono meters: fed channel 0 (reference plugins are mono taps)
    "SigDistMeter": "mono",
    "BitMeter": "mono",
    # spectrum averages stereo inputs
    "SpectrumAnalyzer": "stereo_mix",
}


def _mode(meter) -> str:
    name = type(meter).__name__
    if name in _MODES:
        return _MODES[name]
    for klass in type(meter).__mro__[1:]:
        if klass.__name__ in _MODES:
            return _MODES[klass.__name__]
    return "multi"


class MeterPipeline:
    def __init__(self, meters: Mapping[str, Any], nchan: int = 2):
        self.meters = dict(meters)
        self.nchan = nchan

    def init(self, batch_shape=()):
        out = {}
        for name, m in self.meters.items():
            mode = _mode(m)
            if mode == "per_channel":
                out[name] = m.init((*batch_shape, self.nchan))
            else:
                out[name] = m.init(batch_shape)
        return out

    def update(self, state, x):
        """x: [..., C, T]."""
        new = {}
        for name, m in self.meters.items():
            mode = _mode(m)
            if mode == "per_channel":
                new[name] = m.update(state[name], x)
            elif mode == "mono":
                new[name] = m.update(state[name], x[..., 0, :])
            elif mode == "stereo_mix":
                new[name] = m.update(state[name], x, stereo=x.shape[-2] == 2)
            else:
                if hasattr(m, "update"):
                    new[name] = m.update(state[name], x)
                else:  # display processors expose process()
                    _, new[name] = m.process(state[name], x)
        return new

    def read(self, state):
        outs = {}
        new = {}
        for name, m in self.meters.items():
            if hasattr(m, "read"):
                o, s = m.read(state[name])
            else:
                o, s = {}, state[name]
            outs[name] = o
            new[name] = s
        return outs, new

    def run_stream(self, state, x, chunk: int):
        """Stream x [..., C, T] through update under one lax.scan."""
        *batch, C, T = x.shape
        assert T % chunk == 0
        xs = jnp.moveaxis(
            x.reshape(*batch, C, T // chunk, chunk), -2, 0
        )  # [n, ..., C, chunk]

        def step(st, xc):
            return self.update(st, xc), ()

        state, _ = jax.lax.scan(step, state, xs)
        return state

    def _freeze(self, old, new, alive):
        """Per-stream select: keep `new` where alive else `old` (alive: [B])."""

        def sel(a, b):
            if a.ndim < alive.ndim:
                # stream-shared config leaf (e.g. spectrum omega): not
                # per-stream state, nothing to freeze
                return b
            m = alive.reshape(alive.shape + (1,) * (a.ndim - alive.ndim))
            return jnp.where(m, b, a)

        return jax.tree_util.tree_map(sel, old, new)

    def run_stream_ragged(self, state, x, lengths, chunk: int):
        """Length-exact streaming over a right-padded ragged batch.

        Each stream i is measured over exactly lengths[i] samples — padding
        past a file's end is never processed, so per-file readouts equal a
        serial per-file run (the reference's one-run()-stream-per-track
        semantics, src/meters.cc:298-331).  Two phases:

          1. one lax.scan over `chunk`-sized steps; a stream's state is
             frozen once its remaining full chunks are consumed;
          2. the sub-chunk tails, grouped by (4-aligned) tail length: one
             batched update per distinct tail length, merged per-stream.

        lengths must be multiples of 4 (the framework's 4-sample grain);
        x: [B, C, T] with T % chunk == 0 and T >= max(lengths).
        Not jittable as a whole (phase 2 shapes depend on `lengths`), but
        each phase is jit-compiled; distinct tail lengths each compile one
        small update (cached across batches).
        """
        lengths = np.asarray(lengths)
        B, C, T = x.shape
        assert T % chunk == 0 and (lengths % 4 == 0).all() and lengths.max() <= T
        n_steps = T // chunk
        full_chunks = jnp.asarray(lengths // chunk, jnp.int32)

        xs = jnp.moveaxis(x.reshape(B, C, n_steps, chunk), -2, 0)

        @jax.jit
        def phase1(state, xs):
            def step(st, inp):
                xc, j = inp
                new = self.update(st, xc)
                return self._freeze(st, new, j < full_chunks), ()

            st, _ = jax.lax.scan(
                step, state, (xs, jnp.arange(n_steps, dtype=jnp.int32))
            )
            return st

        state = phase1(state, xs)

        tails = lengths % chunk
        starts = (lengths // chunk) * chunk
        xh = np.asarray(x)

        @jax.jit
        def tail_update(state, xt, in_group):
            return self._freeze(state, self.update(state, xt), in_group)

        for t in sorted(set(int(v) for v in tails if v > 0)):
            group = tails == t
            xt = np.zeros((B, C, t), np.float32)
            for i in np.nonzero(group)[0]:
                xt[i] = xh[i, :, starts[i] : starts[i] + t]
            state = tail_update(state, jnp.asarray(xt), jnp.asarray(group))
        return state
