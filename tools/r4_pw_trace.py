"""Trace the fused phasewheel (raw mode) at B=256; print device-op split."""
import sys, glob, gzip, json, collections

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from meters_lv2_tpu.models.phasewheel import PhaseWheel

fs = 48000
B = 256
m = PhaseWheel(fs)
x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (B, 2, fs), jnp.float32)
st = m.init((B,))
proc = jax.jit(lambda s, v: m.process(s, v))
out, st2 = proc(st, x)
np.asarray(out["peak"])  # warm
logdir = "/tmp/pw_trace_r4b"
jax.profiler.start_trace(logdir)
o = st
for _ in range(6):
    out, o = proc(o, x)
np.asarray(out["peak"])
jax.profiler.stop_trace()

paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
d = json.load(gzip.open(paths[-1]))
ev = [e for e in d["traceEvents"] if e.get("ph") == "X" and e.get("pid") == 3]
agg = collections.Counter()
for e in ev:
    agg[e["name"]] += e.get("dur", 0)
tot = sum(agg.values())
print(f"device total {tot/6/1000:.2f} ms/iter (6 iters)")
for n, v in agg.most_common(20):
    print(f"{v/6:9.0f}us/iter {100*v/tot:5.1f}% {n[:80]}")
