"""On-chip A/B: envelope-composition vs serial ballistics (VERDICT #4).

Measures the full dBTP meter (ops 4x oversample + ballistics kernel) at
the bench row's operating point, both kernel variants, plus numeric
agreement of the two on-chip results.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from meters_lv2_tpu.utils import profiler

fs = 48000
B = 1024
print("device:", jax.devices()[0], flush=True)

outs = {}
for env in ("0", "1"):
    os.environ["METERS_TPU_BALLISTICS_ENV"] = env
    from meters_lv2_tpu.models.truepeak import TruePeakMeter

    meter = TruePeakMeter(fs)
    r = profiler.meter_throughput(meter, (B,), fs, fs, nchan=None, iters=20)
    print(
        f"env={env} dBTP B={B} {r['ms_per_call']:8.3f} ms "
        f"{r['x_realtime']:10,.0f}x rt",
        flush=True,
    )
    # numeric check: same state after one update on a fixed signal
    x = jnp.asarray(
        0.5 * np.abs(np.random.default_rng(0).standard_normal((4, fs))),
        jnp.float32,
    )
    st = meter.init((4,))
    st = jax.jit(meter.update)(st, x)
    outs[env] = (np.asarray(st.bal.z1), np.asarray(st.bal.m), np.asarray(st.bal.p))

for a, b in zip(outs["0"], outs["1"]):
    print("max rel diff:", float(np.max(np.abs(a - b) / np.maximum(np.abs(a), 1e-9))))
