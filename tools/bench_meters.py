"""Per-meter throughput sweep with the fetch-barrier methodology.

Round-1's microbench table used block_until_ready, which on the axon
backend can return at enqueue time (docs/BENCHMARKS.md round 2) — its
20-40M x numbers for scan/conv meters were dispatch artifacts.  This
sweep times every meter family the honest way (utils/profiler.time_op:
pipelined dispatch loop ended by a device->host fetch).

    python tools/bench_meters.py [streams] [seconds]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(B: int = 1024, seconds: float = 1.0):
    import jax
    import jax.numpy as jnp

    from meters_lv2_tpu.utils.profiler import meter_throughput
    from meters_lv2_tpu.models.needle import (
        VUMeter, DINMeter, BBCMeter, BBCMidSideMeter,
    )
    from meters_lv2_tpu.models.kmeter import K20Meter
    from meters_lv2_tpu.models.truepeak import TruePeakMeter
    from meters_lv2_tpu.models.cor import CorrelationMeter
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.models.dr14 import DR14Meter
    from meters_lv2_tpu.models.sigdist import SigDistMeter
    from meters_lv2_tpu.models.bitmeter import BitMeter
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer
    from meters_lv2_tpu.models.surround import Surround5Meter

    fs = 48000
    T = int(fs * seconds)
    cases = [
        # (label, meter, batch_shape, nchan-dim in x)
        ("VU", VUMeter(fs), (B,), None),
        ("DIN PPM", DINMeter(fs), (B,), None),
        ("BBC PPM", BBCMeter(fs), (B,), None),
        ("BBC M-6", BBCMidSideMeter(fs), (B // 2,), 2),
        ("K20", K20Meter(fs), (B,), None),
        ("TruePeak (dBTP)", TruePeakMeter(fs), (B,), None),
        ("Correlation", CorrelationMeter(fs), (B // 2,), 2),
        ("EBU R128 (fused)", EbuR128Meter(fs, nchan=2), (B // 2,), 2),
        ("DR-14", DR14Meter(fs, nchan=2), (B // 2,), 2),
        ("SigDist", SigDistMeter(fs), (B,), None),
        ("BitMeter", BitMeter(fs), (B,), None),
        ("Spectrum 30-band", SpectrumAnalyzer(fs), (B // 16,), None),
        ("Surround 5.0", Surround5Meter(fs), (B // 5,), 5),
    ]
    from meters_lv2_tpu.models.goniometer import Goniometer
    from meters_lv2_tpu.models.phasewheel import PhaseWheel, Stereoscope

    cases += [
        # GUI-thread analyzers (process() interface)
        ("Goniometer (4x)", Goniometer(fs), (B // 8,), 2),
        ("PhaseWheel 8k-FFT", PhaseWheel(fs), (B // 16,), 2),
        ("Stereoscope", Stereoscope(fs), (B // 16,), 2),
    ]
    print(f"device: {jax.devices()[0]}  B={B}  chunk={seconds}s")
    rows = {}
    for label, meter, bshape, nchan in cases:
        r = meter_throughput(meter, bshape, T, fs, nchan=nchan, iters=20)
        # stream-seconds use channel count where the meter consumes C
        streams = 1
        for s in bshape:
            streams *= s
        rows[label] = {
            "streams": streams,
            "ms_per_update": round(r["ms_per_call"], 3),
            "x_realtime": round(r["x_realtime"], 0),
        }
        print(f"{label:18s} {r['ms_per_call']:8.3f} ms/update  "
              f"{r['x_realtime']:12,.0f}x rt aggregate", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    args = [float(a) for a in sys.argv[1:]]
    main(int(args[0]) if args else 1024,
         args[1] if len(args) > 1 else 1.0)
