#!/bin/sh
# Round-4 on-chip session 2: fused Pallas STFT analyzer kernel.
cd /root/repo
python - <<'EOF'
import time, sys, os
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
print("device:", jax.devices()[0], flush=True)

from meters_lv2_tpu.models.phasewheel import PhaseWheel, Stereoscope

# ---- numeric parity probe: fused vs XLA path on-chip ----
fs = 48000
rng = np.random.default_rng(3)
t = np.arange(fs) / fs
base = np.sin(2*np.pi*440*t) + 0.4*np.sin(2*np.pi*2930*t)
x = np.stack([base + 0.01*rng.standard_normal(fs),
              np.roll(base, 11) + 0.01*rng.standard_normal(fs)]).astype(np.float32)

def run(mode, cls):
    os.environ["METERS_TPU_STFT_FUSED"] = mode
    m = cls(fs)
    st = m.init(())
    t0 = time.time()
    out, st = jax.jit(lambda s, v: m.process(s, v))(st, jnp.asarray(x))
    out = jax.tree.map(np.asarray, out)
    print(f"  {cls.__name__} mode={mode} first-call {time.time()-t0:.1f}s", flush=True)
    return out

try:
    got = run("1", PhaseWheel)
    ref = run("0", PhaseWheel)
    mr, mg = ref["level"] > -99, got["level"] > -99
    both = mr & mg
    lv_rel = np.max(np.abs(got["level"][both]/ref["level"][both] - 1))
    d = got["phase"][both] - ref["phase"][both]
    d = (d + np.pi) % (2*np.pi) - np.pi
    print(f"PHASEWHEEL parity: mask agree {np.mean(mr==mg):.6f} level rel {lv_rel:.2e} dphi atol {np.max(np.abs(d)):.2e}", flush=True)
    gs = run("1", Stereoscope)
    rs = run("0", Stereoscope)
    big = rs["level"] > 1e-12
    print(f"STEREOSCOPE parity: level rel {np.max(np.abs(gs['level'][big]/rs['level'][big]-1)):.2e} lr atol {np.max(np.abs(gs['lr'][big]-rs['lr'][big])):.2e}", flush=True)
except Exception as e:
    print("FUSED COMPILE/RUN FAILED:", repr(e)[:2000], flush=True)
    sys.exit(1)

# ---- throughput ----
from meters_lv2_tpu.utils.profiler import meter_throughput
os.environ["METERS_TPU_STFT_FUSED"] = "1"
for B in (64, 256):
    t0 = time.time()
    r = meter_throughput(PhaseWheel(fs), (B,), fs, fs, nchan=2, iters=20)
    print(f"PHASEWHEEL fused B={B}x1s:", r, "elapsed", round(time.time()-t0,1), flush=True)
for B in (64, 256):
    t0 = time.time()
    r = meter_throughput(Stereoscope(fs), (B,), fs, fs, nchan=2, iters=20)
    print(f"STEREOSCOPE fused B={B}x1s:", r, "elapsed", round(time.time()-t0,1), flush=True)
EOF
echo "=== session 2 done rc=$? ==="
