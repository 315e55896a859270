"""On-chip A/B: goniometer composed-FIR trace vs the unfused
(polyphase GEMM -> blocked one-pole) path.

    python tools/r5_gonio_ab.py [B] [seconds]

Methodology: utils/profiler.meter_throughput (fetch-barrier).  Variants
toggle METERS_GONIO_COMPOSED before constructing the meter; each is its
own compiled program.  Also cross-checks the two variants' gain/minmax
outputs on the same input.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(B: int = 128, seconds: float = 1.0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from meters_lv2_tpu.utils.profiler import meter_throughput
    from meters_lv2_tpu.models.goniometer import Goniometer

    fs = 48000
    T = int(fs * seconds)
    print(f"device: {jax.devices()[0]}  B={B}  T={T}", flush=True)
    rows = {}
    outs = {}
    for name, flag in (("composed", "1"), ("unfused", "0")):
        os.environ["METERS_GONIO_COMPOSED"] = flag
        m = Goniometer(fs)
        r = meter_throughput(m, (B,), T, fs, nchan=2, iters=20)
        rows[name] = {
            "ms_per_update": round(r["ms_per_call"], 3),
            "x_realtime": round(r["x_realtime"], 0),
        }
        print(f"{name:9s} {r['ms_per_call']:8.3f} ms  "
              f"{r['x_realtime']:12,.0f}x rt", flush=True)
        x = 0.1 * jax.random.normal(
            jax.random.PRNGKey(7), (B, 2, T), jnp.float32)
        out, _ = jax.jit(m.process)(m.init((B,)), x)
        outs[name] = {k: np.asarray(v) for k, v in out.items()}
    for k in ("gain", "x", "y"):
        a, b = outs["composed"][k], outs["unfused"][k]
        scale = max(np.abs(b).max(), 1e-12)
        print(f"cross-check {k}: max rel diff "
              f"{np.abs(a - b).max() / scale:.3e}", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 128, float(a[1]) if len(a) > 1 else 1.0)
