"""meters.lv2-tpu — a TPU-native batch audio-metering framework.

A from-scratch reimplementation of the capabilities of x42/meters.lv2
(EBU R128 loudness, true peak, VU/DIN/Nordic/BBC/EBU needle meters,
K-meters, DR-14, 1/3-octave spectrum, goniometer, phase wheel, stereoscope,
phase correlation, signal-distribution histogram, bit meter, surround
meters) designed TPU-first: linear recurrences as blocked MXU matmuls,
nonlinear ballistics as batched scans / Pallas kernels, thousands of
streams in parallel via vmap/shard_map over a chip mesh.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("METERS_TPU_NO_CACHE", "0") != "1":
    # Persistent XLA compilation cache: metering graphs are large fused
    # programs; caching makes repeated CLI/test invocations cheap.
    import jax as _jax

    _cache = _os.environ.get(
        "METERS_TPU_CACHE_DIR",
        _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax
        pass

from . import models, ops  # noqa: F401
from .models import available, create  # noqa: F401
