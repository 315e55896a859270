"""Dump every S-point loudness value (f32 bits) for ebur128_96k_mix.

Usage: python tools/r4_96k_edge_dump.py cpu|tpu out.json
Streams the fixture exactly as the golden test does (block=1024) and
records loudness_S whenever count_s increments — the exact f32 value
added to the gating histogram.  Comparing the cpu and tpu dumps
pinpoints the documented -14.55 LUFS adjacent-bin edge flip.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

mode, outpath = sys.argv[1], sys.argv[2]
import jax

if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from meters_lv2_tpu.models.ebur128 import EbuR128Meter
from signals import make_signal

FIX = json.load(open("/root/repo/tests/fixtures/ebur128_96k_mix.json"))
fs, block = FIX["fs"], FIX["block"]
x = make_signal(FIX["signal"], FIX["seconds"], fs=fs)
m = EbuR128Meter(fs, nchan=2)
st = m.init(())
upd = jax.jit(m.update)
read = jax.jit(m.read)
print("device:", jax.devices()[0], flush=True)

vals = []
prev_cs = 0
for b in range(x.shape[1] // block):
    st = upd(st, jnp.asarray(x[:, b * block : (b + 1) * block]))
    cs = int(st.count_s)
    if cs != prev_cs:
        v = np.float32(st.loud_s)
        k = int(np.floor(10.0 * v + np.float32(700.5)))
        vals.append(
            {"s_point": cs, "block": b, "v": float(v),
             "hex": hex(np.float32(v).view(np.uint32)), "bin": k}
        )
        prev_cs = cs
json.dump({"device": mode, "points": vals}, open(outpath, "w"))
print(f"wrote {outpath} ({len(vals)} S points)", flush=True)
