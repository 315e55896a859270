"""On-TPU parity spot-check against committed golden fixtures.

The CPU test suite validates numerics of the XLA graph, but TPU matmul
precision (bf16-pass composition) differs from CPU float32.  This script
streams a golden fixture through the R128 meter ON THE TPU and asserts the
same bounds the CPU parity tests use — run it after changing precision
settings (METERS_TPU_PRECISION) or GEMM formulations.

    python tools/tpu_parity_check.py [fixture_name]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def check_truepeak(name="truepeak_mix"):
    import jax
    import jax.numpy as jnp

    from signals import make_signal
    from meters_lv2_tpu.models.truepeak import TruePeakMeter

    fx = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "tests",
                          "fixtures", f"{name}.json"))
    )
    x = make_signal(fx["signal"], fx["seconds"], fs=fx["fs"])
    m = TruePeakMeter(fx["fs"])
    st = m.init((2,))
    upd = jax.jit(m.update)
    block, re = fx["block"], fx["read_every"]
    reads = iter(fx["reads"])
    worst = 0.0
    for b in range(x.shape[1] // block):
        st = upd(st, jnp.asarray(x[:, b * block : (b + 1) * block]))
        if (b + 1) % re == 0:
            vals, st = m.read(st)
            rec = next(reads)
            for c in range(2):
                for got, want in [
                    (float(np.asarray(vals["level"])[c]), rec["values"][2 * c]),
                    (float(np.asarray(vals["peak"])[c]), rec["values"][2 * c + 1]),
                ]:
                    if want > 1e-6:
                        worst = max(
                            worst,
                            abs(20 * np.log10(got) - 20 * np.log10(want)),
                        )
    print(f"truepeak worst err: {worst:.5f} dB (budget 0.01)")
    return worst <= 0.01


def main(name="ebur128_mix"):
    import jax
    import jax.numpy as jnp

    from signals import make_signal, make_surround
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter

    if name.startswith("truepeak"):
        ok = check_truepeak(name)
        print("PASS" if ok else "FAIL")
        return 0 if ok else 1

    print("device:", jax.devices()[0], "precision:",
          os.environ.get("METERS_TPU_PRECISION", "high"))
    fx = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "tests",
                          "fixtures", f"{name}.json"))
    )
    if fx["nchan"] == 5:
        x = make_surround(fx["signal"], fx["seconds"], fs=fx["fs"])
    else:
        x = make_signal(fx["signal"], fx["seconds"], fs=fx["fs"])
        if fx["nchan"] == 1:
            x = x[:1]
    m = EbuR128Meter(fx["fs"], nchan=fx["nchan"])
    st = m.init(())
    upd = jax.jit(m.update)
    block, re = fx["block"], fx["read_every"]
    mid = [r for r in fx["reads"] if "final" not in r]
    final = [r for r in fx["reads"] if r.get("final")][0]
    it = iter(mid)
    worst = 0.0
    for b in range(x.shape[1] // block):
        st = upd(st, jnp.asarray(x[:, b * block : (b + 1) * block]))
        if (b + 1) % re == 0:
            out, _ = m.read(st)
            rec = next(it)
            for key, mine in [("M", "loudness_M"), ("S", "loudness_S"),
                              ("maxM", "max_M"), ("maxS", "max_S")]:
                g, o = rec[key], float(out[mine])
                if g > -199.0:
                    worst = max(worst, abs(o - g))
    hm = np.asarray(st.hist_m)
    hs = np.asarray(st.hist_s)
    dm = int(np.abs(hm - np.array(final["histM"])).sum())
    ds = int(np.abs(hs - np.array(final["histS"])).sum())
    print(f"worst M/S/max err: {worst:.5f} dB (budget 0.01)")
    print(f"hist deltas: M={dm} S={ds} (budget 0)")
    ok = worst <= 0.01 and dm == 0 and ds == 0
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
