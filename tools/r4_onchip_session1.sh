#!/bin/sh
# Round-4 on-chip session 1: new spectrum kernel + GEMM STFT measurements.
cd /root/repo
python - <<'EOF'
import time, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from meters_lv2_tpu.utils.profiler import meter_throughput
from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer
from meters_lv2_tpu.models.phasewheel import PhaseWheel, Stereoscope
fs = 48000
print("device:", jax.devices()[0], flush=True)
t0 = time.time()
r = meter_throughput(SpectrumAnalyzer(fs), (256,), fs, fs, iters=20)
print("SPECTRUM scan B=256x1s:", r, "elapsed", round(time.time()-t0,1), flush=True)
t0 = time.time()
r = meter_throughput(PhaseWheel(fs), (64,), fs, fs, nchan=2, iters=20)
print("PHASEWHEEL gemm-fft B=64x1s:", r, "elapsed", round(time.time()-t0,1), flush=True)
t0 = time.time()
r = meter_throughput(Stereoscope(fs), (64,), fs, fs, nchan=2, iters=20)
print("STEREOSCOPE gemm-fft B=64x1s:", r, "elapsed", round(time.time()-t0,1), flush=True)
EOF
echo "=== gemm smoother A/B ==="
METERS_TPU_SPECTRUM_SMOOTH=gemm python - <<'EOF'
import time, sys
sys.path.insert(0, "/root/repo")
import jax
from meters_lv2_tpu.utils.profiler import meter_throughput
from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer
fs = 48000
t0 = time.time()
r = meter_throughput(SpectrumAnalyzer(fs), (256,), fs, fs, iters=20)
print("SPECTRUM gemm-smoother B=256x1s:", r, "elapsed", round(time.time()-t0,1), flush=True)
EOF
echo "=== on-chip parity: spectrum stft ==="
python tools/tpu_parity_check.py spectrum stft
echo "=== session 1 done ==="
