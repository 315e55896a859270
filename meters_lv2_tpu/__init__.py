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

from . import models, ops  # noqa: F401
from .models import available, create  # noqa: F401
