"""Round-4 on-chip session: operator-fused STFT kernel numerics + the
in-kernel phasewheel-analysis A/B (METERS_TPU_PW_KERNEL_ANALYSIS)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)
from meters_lv2_tpu.models.phasewheel import PhaseWheel, Stereoscope
from meters_lv2_tpu.utils.profiler import meter_throughput

fs = 48000
rng = np.random.default_rng(3)
t = np.arange(fs) / fs
base = np.sin(2 * np.pi * 440 * t) + 0.4 * np.sin(2 * np.pi * 2930 * t)
x = np.stack(
    [base + 0.01 * rng.standard_normal(fs),
     np.roll(base, 11) + 0.01 * rng.standard_normal(fs)]
).astype(np.float32)


def run(mode, cls, inkernel="0"):
    os.environ["METERS_TPU_STFT_FUSED"] = mode
    os.environ["METERS_TPU_PW_KERNEL_ANALYSIS"] = inkernel
    m = cls(fs)
    st = m.init(())
    t0 = time.time()
    out, st = jax.jit(lambda s, v: m.process(s, v))(st, jnp.asarray(x))
    out = jax.tree.map(np.asarray, out)
    print(f"  {cls.__name__} fused={mode} inkernel={inkernel} "
          f"first-call {time.time()-t0:.1f}s", flush=True)
    return out


ref = run("0", PhaseWheel)
for ik in ("0", "1"):
    got = run("1", PhaseWheel, ik)
    mr, mg = ref["level"] > -99, got["level"] > -99
    both = mr & mg
    lv = np.max(np.abs(got["level"][both] / ref["level"][both] - 1))
    d = got["phase"][both] - ref["phase"][both]
    d = (d + np.pi) % (2 * np.pi) - np.pi
    print(f"PW parity inkernel={ik}: mask {np.mean(mr==mg):.6f} "
          f"level rel {lv:.2e} dphi atol {np.max(np.abs(d)):.2e}", flush=True)

gs = run("1", Stereoscope)
rs = run("0", Stereoscope)
big = rs["level"] > 1e-12
print(f"SS parity: level rel "
      f"{np.max(np.abs(gs['level'][big]/rs['level'][big]-1)):.2e} lr atol "
      f"{np.max(np.abs(gs['lr'][big]-rs['lr'][big])):.2e}", flush=True)

os.environ["METERS_TPU_STFT_FUSED"] = "1"
for ik in ("0", "1"):
    os.environ["METERS_TPU_PW_KERNEL_ANALYSIS"] = ik
    for B in (64, 256):
        r = meter_throughput(PhaseWheel(fs), (B,), fs, fs, nchan=2, iters=20)
        print(f"PW inkernel={ik} B={B}: {r['ms_per_call']:.3f} ms "
              f"{r['x_realtime']:,.0f}x", flush=True)
os.environ["METERS_TPU_PW_KERNEL_ANALYSIS"] = "0"
for B in (64, 256):
    r = meter_throughput(Stereoscope(fs), (B,), fs, fs, nchan=2, iters=20)
    print(f"SS B={B}: {r['ms_per_call']:.3f} ms {r['x_realtime']:,.0f}x",
          flush=True)
