"""Example: streaming monitoring session with runtime controls.

    python examples/streaming_monitor.py

Simulates a live monitoring session over a synthetic program feed:
- EBU R128 with 500 ms-cadence I/LRA readouts (the reference GUI's view)
  and a mid-session radar-speed change (CTL_RADARTIME analog),
- 30-band spectrum whose display speed is changed on the fly,
- periodic snapshot reads at ~4 Hz of stream time.

Everything runs in ONE compiled update program per meter — the runtime
controls are traced state, so no recompilation happens at the changes.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    if "--cpu" in sys.argv:  # sitecustomize pins the axon TPU
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer

    fs = 48000
    ebu = EbuR128Meter(fs, nchan=2, runtime_radar_speed=True,
                       track_cadence=True)
    spec = SpectrumAnalyzer(fs, speed=1.0)

    upd_e = jax.jit(ebu.update)
    upd_s = jax.jit(lambda s, x: spec.update(s, x, stereo=True))
    read_e = jax.jit(lambda s: ebu.read(s, cadence_500ms=True)[0])
    se = ebu.init(())
    ss = spec.init(())

    rng = np.random.default_rng(0)
    chunk = fs // 4  # 250 ms blocks
    t_global = 0.0
    for i in range(80):  # 20 s of program
        t = (np.arange(chunk) + i * chunk) / fs
        level = 0.15 + 0.1 * np.sin(2 * np.pi * 0.1 * t)
        x = np.stack([
            level * np.sin(2 * np.pi * 440 * t)
            + 0.03 * rng.standard_normal(chunk),
            level * np.sin(2 * np.pi * 660 * t)
            + 0.03 * rng.standard_normal(chunk),
        ]).astype(np.float32)
        se = upd_e(se, jnp.asarray(x))
        ss = upd_s(ss, jnp.asarray(x))
        t_global += chunk / fs

        if i == 40:
            # live config changes — same compiled programs keep running
            se = ebu.set_radar_speed(se, 240.0)
            ss = spec.set_speed(ss, 8.0)
            print(f"[{t_global:5.2f}s] radar -> 240 s/rev, display speed -> 8")

        if (i + 1) % 16 == 0:
            out = read_e(se)
            sp, _ = spec.read(ss)
            bands = np.asarray(sp["bands"])
            print(
                f"[{t_global:5.2f}s] M {float(out['loudness_M']):6.1f} "
                f"S {float(out['loudness_S']):6.1f} "
                f"I {float(out['integrated']):6.1f} LUFS  "
                f"LRA {float(out['lra']):4.1f} LU  "
                f"spectrum peak band {int(bands.argmax())}"
            )

    out = read_e(se)
    print(
        f"final: I = {float(out['integrated']):.2f} LUFS, "
        f"LRA = {float(out['lra']):.2f} LU, "
        f"dBTP = {20 * np.log10(max(float(out['dbtp']), 1e-9)):.2f}, "
        f"radar interval = {int(out['radar_spd'])} samples"
    )


if __name__ == "__main__":
    main()
