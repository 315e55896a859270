"""Example: batch loudness QA over a directory of WAV files.

    python examples/batch_loudness.py /path/to/wavs/*.wav

Decodes with the native codec, pads into one [B, C, T] batch, runs the
fused R128 + true-peak + DR-14 pipeline in a single jitted program, and
prints an EBU R128 compliance report per file.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(paths):
    import jax

    if "--cpu" in sys.argv:  # sitecustomize pins the axon TPU
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from meters_lv2_tpu.io.batch import load_files
    from meters_lv2_tpu.models.dr14 import DR14Meter
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.parallel.pipeline import MeterPipeline

    batch = load_files(paths)
    B, C, T = batch.data.shape
    fs = batch.rate
    pipe = MeterPipeline(
        {"r128": EbuR128Meter(fs, nchan=C), "dr14": DR14Meter(fs, nchan=C)},
        nchan=C,
    )

    chunk = fs * 2
    Tp = ((T + chunk - 1) // chunk) * chunk
    x = np.zeros((B, C, Tp), np.float32)
    x[:, :, :T] = batch.data

    @jax.jit
    def analyze(x):
        st = pipe.init((B,))
        st = pipe.run_stream(st, x, chunk)
        return pipe.read(st)

    outs, _ = analyze(jnp.asarray(x))
    r128 = outs["r128"]
    dr = outs["dr14"]
    print(f"{'file':40s} {'I LUFS':>8s} {'LRA':>6s} {'dBTP':>7s} {'DR':>4s} EBU-R128")
    for i, p in enumerate(paths):
        I = float(np.asarray(r128["integrated"])[i])
        lra = float(np.asarray(r128["lra"])[i])
        tp = 20 * np.log10(max(float(np.asarray(r128["dbtp"])[i]), 1e-12))
        drv = float(np.asarray(dr["dr_total"])[i])
        ok = (-23.5 <= I <= -22.5) and tp <= -1.0
        print(f"{p[:40]:40s} {I:8.2f} {lra:6.2f} {tp:7.2f} {drv:4.1f} "
              f"{'PASS' if ok else 'ADJUST'}")


if __name__ == "__main__":
    paths = [a for a in sys.argv[1:] if a != "--cpu"]
    if not paths:
        print(__doc__)
        sys.exit(2)
    main(paths)
