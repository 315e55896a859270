"""Profile PhaseWheel update on-chip; dump per-op time table from the xplane."""
import sys, os, glob, json
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def run(mode):
    os.environ["METERS_TPU_STFT_GEMM"] = mode
    from meters_lv2_tpu.models.phasewheel import PhaseWheel
    fs = 48000
    m = PhaseWheel(fs)
    B = 64
    x = 0.1*jax.random.normal(jax.random.PRNGKey(0), (B,2,fs), jnp.float32)
    st = m.init((B,))
    proc = jax.jit(lambda s,v: m.process(s,v)[1])
    st2 = proc(st, x)
    np.asarray(st2.peak)  # warm
    logdir = f"/tmp/pw_trace_{mode}"
    with jax.profiler.trace(logdir):
        out = st
        for _ in range(6):
            out = proc(out, x)
        np.asarray(out.peak)
    return logdir

def summarize(logdir, label):
    paths = glob.glob(logdir+"/**/*.xplane.pb", recursive=True)
    print(label, "xplane files:", paths)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:
        print("no parser:", e); return
    for tool in ("framework_op_stats", "hlo_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(paths, tool, {})
            fn = f"{logdir}/{tool}.out"
            with open(fn, "wb") as f:
                f.write(data if isinstance(data,(bytes,bytearray)) else str(data).encode())
            print(label, tool, "->", fn, len(data))
        except Exception as e:
            print(label, tool, "FAILED:", repr(e)[:200])

for mode in ("0","1"):
    ld = run(mode)
    summarize(ld, "gemm="+mode)
print("done")
