"""Device trace of the seg-mode R128 update at the bench operating point."""
import sys, glob, gzip, json, collections

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from meters_lv2_tpu.models.ebur128 import EbuR128Meter

fs = 48000
B = 256
meter = EbuR128Meter(fs, nchan=2)
upd = jax.jit(lambda st, xc: meter.update(st, xc, flat=True))
x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (B, 2 * fs), jnp.float32)
st = meter.init((B,))
st = upd(st, x)
np.asarray(st.loud_m)
logdir = "/tmp/r128_trace_r4"
jax.profiler.start_trace(logdir)
o = st
for _ in range(8):
    o = upd(o, x)
np.asarray(o.loud_m)
jax.profiler.stop_trace()

paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
d = json.load(gzip.open(paths[-1]))
ev = [e for e in d["traceEvents"] if e.get("ph") == "X" and e.get("pid") == 3]
agg = collections.Counter()
for e in ev:
    agg[e["name"]] += e.get("dur", 0)
tot = sum(agg.values())
print(f"device total {tot/8/1000:.3f} ms/iter (8 iters)")
for n, v in agg.most_common(18):
    print(f"{v/8:9.1f}us/iter {100*v/tot:5.1f}% {n[:80]}")
