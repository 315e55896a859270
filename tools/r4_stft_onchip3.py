"""Round-4 on-chip session 3 (lean): operator-fused STFT kernel parity
and the in-kernel phasewheel analysis A/B, B=256 only, on-device diffs."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

t00 = time.time()


def log(msg):
    print(f"[{time.time()-t00:7.1f}s] {msg}", flush=True)


log(f"device: {jax.devices()[0]}")
from meters_lv2_tpu.models.phasewheel import PhaseWheel, Stereoscope
from meters_lv2_tpu.utils.profiler import meter_throughput

fs = 48000
B = 256
rng = np.random.default_rng(3)
t = np.arange(fs) / fs
base = np.sin(2 * np.pi * 440 * t) + 0.4 * np.sin(2 * np.pi * 2930 * t)
x1 = np.stack(
    [base + 0.01 * rng.standard_normal(fs),
     np.roll(base, 11) + 0.01 * rng.standard_normal(fs)]
).astype(np.float32)
xB = jnp.asarray(
    np.broadcast_to(x1, (B, 2, fs))
    + 0.001 * rng.standard_normal((B, 2, fs)).astype(np.float32)
)


def outs(mode, inkernel="0"):
    os.environ["METERS_TPU_STFT_FUSED"] = mode
    os.environ["METERS_TPU_PW_KERNEL_ANALYSIS"] = inkernel
    m = PhaseWheel(fs)
    st = m.init((B,))
    t0 = time.time()
    out, _ = jax.jit(lambda s, v: m.process(s, v))(st, xB)
    # on-device summary scalars only (no 400 MB fetches through the tunnel)
    lvl, ph = out["level"], out["phase"]
    res = {
        "mask": np.asarray((lvl > -99).sum()),
        "lvl_lo": np.asarray(jnp.where(lvl > -99, lvl, jnp.inf).min()),
        "lvl_sum": np.asarray(jnp.where(lvl > -99, lvl, 0.0).sum()),
        "ph_sum": np.asarray(jnp.abs(jnp.where(lvl > -99, ph, 0.0)).sum()),
        "peak0": np.asarray(out["peak"][0]),
    }
    log(f"PW fused={mode} inkernel={inkernel} first-call {time.time()-t0:.1f}s "
        + " ".join(f"{k}={float(v):.6g}" for k, v in res.items()))
    return out


ref = outs("0")
raw = outs("1", "0")
d_lvl = float(np.asarray(jnp.max(jnp.abs(
    jnp.where((ref["level"] > -99) & (raw["level"] > -99),
              raw["level"] - ref["level"], 0.0)))))
d_ph = float(np.asarray(jnp.max(jnp.abs(
    jnp.where((ref["level"] > -99) & (raw["level"] > -99),
              raw["phase"] - ref["phase"], 0.0)))))
mask_mismatch = int(np.asarray(((ref["level"] > -99) != (raw["level"] > -99)).sum()))
log(f"RAW parity vs XLA: level atol {d_lvl:.3e} dphi atol {d_ph:.3e} "
    f"mask mismatches {mask_mismatch}")

ik = outs("1", "1")
d_lvl2 = float(np.asarray(jnp.max(jnp.abs(
    jnp.where((raw["level"] > -99) & (ik["level"] > -99),
              ik["level"] - raw["level"], 0.0)))))
d_ph2 = float(np.asarray(jnp.max(jnp.abs(
    jnp.where((raw["level"] > -99) & (ik["level"] > -99),
              ik["phase"] - raw["phase"], 0.0)))))
log(f"INKERNEL parity vs raw: level atol {d_lvl2:.3e} dphi atol {d_ph2:.3e}")

for ikm in ("0", "1"):
    os.environ["METERS_TPU_STFT_FUSED"] = "1"
    os.environ["METERS_TPU_PW_KERNEL_ANALYSIS"] = ikm
    r = meter_throughput(PhaseWheel(fs), (B,), fs, fs, nchan=2, iters=20)
    log(f"PW inkernel={ikm} B={B}: {r['ms_per_call']:.3f} ms "
        f"{r['x_realtime']:,.0f}x")
os.environ["METERS_TPU_PW_KERNEL_ANALYSIS"] = "0"

ss = Stereoscope(fs)
st = ss.init((B,))
os.environ["METERS_TPU_STFT_FUSED"] = "0"
sref, _ = jax.jit(lambda s, v: ss.process(s, v))(st, xB)
os.environ["METERS_TPU_STFT_FUSED"] = "1"
sgot, _ = jax.jit(lambda s, v: ss.process(s, v))(st, xB)
big = sref["level"] > 1e-12
d_ss = float(np.asarray(jnp.max(jnp.where(
    big, jnp.abs(sgot["level"] / jnp.maximum(sref["level"], 1e-30) - 1.0),
    0.0))))
d_lr = float(np.asarray(jnp.max(jnp.where(
    big, jnp.abs(sgot["lr"] - sref["lr"]), 0.0))))
log(f"SS parity: level rel {d_ss:.3e} lr atol {d_lr:.3e}")
r = meter_throughput(Stereoscope(fs), (B,), fs, fs, nchan=2, iters=20)
log(f"SS B={B}: {r['ms_per_call']:.3f} ms {r['x_realtime']:,.0f}x")
log("DONE")
