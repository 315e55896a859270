"""On-chip measurement: fused STFT analyzers after operator fusion.

Usage: python tools/r4_stft_meas.py [B ...]  (default 256 16)
Prints ms/update and x-realtime for phasewheel + stereoscope at each B.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

from meters_lv2_tpu.models.phasewheel import PhaseWheel, Stereoscope
from meters_lv2_tpu.utils import profiler

fs = 48000
Bs = [int(a) for a in sys.argv[1:]] or [256, 16]
print("device:", jax.devices()[0], flush=True)
for B in Bs:
    for label, meter in (
        ("phasewheel", PhaseWheel(fs)),
        ("stereoscope", Stereoscope(fs)),
    ):
        r = profiler.meter_throughput(meter, (B,), fs, fs, nchan=2, iters=20)
        print(
            f"B={B:4d} {label:12s} {r['ms_per_call']:8.3f} ms "
            f"{r['x_realtime']:10,.0f}x rt",
            flush=True,
        )
