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

    def update(self, state, x, controls=None):
        """x: [..., C, T].

        `controls` optionally maps meter name -> extra update() keyword
        ports whose values may be TRACED arrays (e.g. the BBC M-6 s20
        toggle) — the control-port analog: the reference re-reads such
        ports every run() (src/meters.cc:562-563), so flipping one
        mid-stream must not recompile.  Pass the same pytree structure
        each call with new leaf values."""
        new = {}
        for name, m in self.meters.items():
            mode = _mode(m)
            kw = dict((controls or {}).get(name, {}))
            if mode == "per_channel":
                new[name] = m.update(state[name], x, **kw)
            elif mode == "mono":
                new[name] = m.update(state[name], x[..., 0, :], **kw)
            elif mode == "stereo_mix":
                C = x.shape[-2]
                if C == 2:
                    new[name] = m.update(state[name], x, stereo=True, **kw)
                elif C == 1:
                    new[name] = m.update(state[name], x[..., 0, :], **kw)
                else:  # >2 channels: equal-weight downmix (generalizes the
                    # reference's stereo (l+r)/2, spectrumlv2.c:195-201)
                    new[name] = m.update(
                        state[name], jnp.mean(x, axis=-2), **kw
                    )
            else:
                if hasattr(m, "update"):
                    new[name] = m.update(state[name], x, **kw)
                else:  # display processors expose process()
                    _, new[name] = m.process(state[name], x)
        return new

    def read(self, state, ref_level_db=None):
        """Read every meter; ref_level_db (the needle meters' reference
        level port, lv2ttl default -22) is forwarded to readers that
        take it — None keeps each meter's own default.  A dict maps
        meter name -> per-instance level (the live shell's runtime
        ports, one ref-level dial per plugin as in src/meters.cc:
        303-306); absent names keep their default."""
        import inspect

        outs = {}
        new = {}
        for name, m in self.meters.items():
            if hasattr(m, "read"):
                kw = {}
                rl = (ref_level_db.get(name)
                      if isinstance(ref_level_db, dict) else ref_level_db)
                if rl is not None and (
                    "ref_level_db" in inspect.signature(m.read).parameters
                ):
                    kw["ref_level_db"] = rl
                o, s = m.read(state[name], **kw)
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
        semantics, src/meters.cc:298-331).  Exactly TWO compiled programs
        regardless of how heterogeneous the lengths are:

          1. one lax.scan over `chunk`-sized steps; a stream's state is
             frozen once its remaining full chunks are consumed;
          2. one traced tail program: the (4-aligned) sub-chunk tails are
             consumed via their binary decomposition — one update per
             power-of-4..chunk/2 size LEVEL, largest first, each stream
             frozen through levels its tail lacks.  Per-stream placement
             is a vmapped dynamic_slice at a traced cursor (the fastest
             traced-offset lowering measured on TPU, see ops/segment.py).

        lengths must be multiples of 4 (the framework's 4-sample grain);
        x: [B, C, T] with T % chunk == 0 and T >= max(lengths).
        Runtime cost of phase 2 is ~2*chunk samples per stream (the sum of
        all level sizes) independent of the actual tails; compile cost is
        log2(chunk/4) update graphs in one program.  The compiled phases
        are kept on ``self._ragged_fns`` for introspection.
        """
        lengths = np.asarray(lengths)
        B, C, T = x.shape
        assert T % chunk == 0 and (lengths % 4 == 0).all() and lengths.max() <= T
        n_steps = T // chunk
        full_chunks = jnp.asarray(lengths // chunk, jnp.int32)

        xs = jnp.moveaxis(x.reshape(B, C, n_steps, chunk), -2, 0)

        # the jitted phases are cached on self keyed by the static
        # geometry — repeated ragged ingests (any length mix) reuse the
        # same two wrappers, so the two-compiled-programs guarantee holds
        # ACROSS calls, not just within one (jit caches per wrapper).
        # LRU-bounded: each entry pins compiled executables for the
        # pipeline's lifetime, so a long-lived service ingesting many
        # distinct padded geometries must not grow without bound.
        key = (chunk, C, n_steps)
        cache = getattr(self, "_ragged_cache", None)
        if cache is None:
            cache = self._ragged_cache = {}
        if key in cache:
            cache[key] = cache.pop(key)  # refresh recency (dict = ordered)
        else:
            while len(cache) >= 8:
                cache.pop(next(iter(cache)))  # evict least-recent geometry
            n_levels = max(chunk // 4 - 1, 1).bit_length()

            @jax.jit
            def phase1(state, xs, full_chunks):
                def step(st, inp):
                    xc, j = inp
                    new = self.update(st, xc)
                    return self._freeze(st, new, j < full_chunks), ()

                st, _ = jax.lax.scan(
                    step, state, (xs, jnp.arange(n_steps, dtype=jnp.int32))
                )
                return st

            @jax.jit
            def phase2(state, x, tails, starts):
                q = tails // 4
                pos = starts
                for k in reversed(range(n_levels)):
                    s = 4 << k
                    take = ((q >> k) & 1) == 1
                    xt = jax.vmap(
                        lambda xi, p, s=s: jax.lax.dynamic_slice(
                            xi, (0, p), (C, s)
                        )
                    )(x, pos)
                    state = self._freeze(state, self.update(state, xt), take)
                    pos = pos + jnp.where(take, s, 0)
                return state

            cache[key] = (phase1, phase2)
        phase1, phase2 = self._ragged_fns = cache[key]
        state = phase1(state, xs, full_chunks)

        tails = lengths % chunk
        if (tails > 0).any():
            starts = (lengths // chunk) * chunk
            # clamp so every level's slice stays in bounds even for the
            # largest cursor (dynamic_slice would clamp silently; frozen
            # streams never read meaningful data there anyway)
            starts = np.minimum(starts, T - chunk)
            state = phase2(
                state, x,
                jnp.asarray(tails, jnp.int32), jnp.asarray(starts, jnp.int32),
            )
        return state
