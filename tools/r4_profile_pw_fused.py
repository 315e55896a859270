"""Profile the fused phasewheel at B=256: kernel vs XLA-tail split."""
import sys, os, glob
sys.path.insert(0, "/root/repo")
os.environ["METERS_TPU_STFT_FUSED"] = "1"
import numpy as np, jax, jax.numpy as jnp
from meters_lv2_tpu.models.phasewheel import PhaseWheel

fs = 48000
m = PhaseWheel(fs)
B = 256
x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (B, 2, fs), jnp.float32)
st = m.init((B,))
proc = jax.jit(lambda s, v: m.process(s, v))
out, st2 = proc(st, x)
np.asarray(out["peak"])  # warm
logdir = "/tmp/pw_fused_trace"
with jax.profiler.trace(logdir):
    o = st
    for _ in range(6):
        out, o = proc(o, x)
    np.asarray(out["peak"])

paths = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
print("xplanes:", paths)
from tensorboard_plugin_profile.convert import raw_to_tool_data
data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
fn = logdir + "/hlo_stats.out"
with open(fn, "wb") as f:
    f.write(data if isinstance(data, (bytes, bytearray)) else str(data).encode())
print("wrote", fn)
