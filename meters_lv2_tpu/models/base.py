"""Meter protocol and registry.

Each meter is a pure-functional triple mirroring the reference plugin
lifecycle (src/meters.cc:192-331):

    meter = SomeMeter(fs=48000, ...)        # instantiate(): bake constants
    state = meter.init(batch_shape)         # per-stream state pytree
    state = meter.update(state, block)      # run(): block [..., T] / [..., C, T]
    out, state = meter.read(state)          # control-port readout

``update``/``read`` are jit/vmap/scan-compatible: state is a pytree of
arrays with arbitrary leading batch dims, config lives on the (static)
meter object.  Throughput comes from vmapping/sharding the batch axis, not
from intra-stream parallelism — matching the reference's "one plugin
instance per track" concurrency model (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[str, Callable[..., Any]] = {}


def register(name: str):
    """Register a meter class under its reference URI suffix (e.g. 'VUmono')."""

    def deco(cls):
        _REGISTRY[name] = cls
        cls.uri_suffix = name
        return cls

    return deco


def create(name: str, fs: float, **kwargs):
    """Instantiate a meter by reference URI suffix, e.g. create('EBUr128', 48000)."""
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown meter {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](fs=fs, **kwargs)


def available() -> list[str]:
    return sorted(_REGISTRY)


def ref_level_gain(ref_level_db: float):
    """Needle-meter reference-level gain: 10^(0.05*(refl+18))
    (src/meters.cc:303-306)."""
    import jax.numpy as jnp

    return jnp.power(jnp.float32(10.0), 0.05 * (jnp.float32(ref_level_db) + 18.0))
