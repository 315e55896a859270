"""Example: multi-chip sharded loudness analysis with checkpointing.

    python examples/sharded_analysis.py

Shards a batch of long streams over a ('dp', 'sp') device mesh — streams
across 'dp', TIME across 'sp' (the IIR state crosses shards as a 4-float
affine handoff; fragment windows ride 59-float halos; histograms psum) —
runs the R128 analysis in one jitted program, and checkpoints the result
shard-by-shard with orbax.

On a real TPU pod slice the same code runs unchanged (jax.devices()
supplies the chips, and each shard's local pass runs the fused Pallas
kernel).  Here it self-provisions a virtual 8-device CPU mesh when fewer
devices are present, like __graft_entry__.dryrun_multichip.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _ensure_devices(n: int) -> None:
    import jax

    if jax.device_count() >= n:
        return
    # restart with a virtual CPU mesh (must happen before backend init,
    # so re-exec; see __graft_entry__.dryrun_multichip)
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["_METERS_EXAMPLE_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    import jax

    # --cpu must pin the platform BEFORE _ensure_devices touches the
    # backend (jax.device_count() initializes it; sitecustomize registers
    # the axon TPU plugin, so without this the "CPU subprocess" would
    # probe — or run on — the chip).
    if "--cpu" in sys.argv or os.environ.get("_METERS_EXAMPLE_REEXEC"):
        jax.config.update("jax_platforms", "cpu")
    _ensure_devices(8)

    import jax.numpy as jnp
    import numpy as np

    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.parallel import make_mesh
    from meters_lv2_tpu.parallel.r128_sharded import analyze_r128

    fs = 48000
    n = jax.device_count()
    sp = 2 if n % 2 == 0 else 1
    dp = n // sp
    mesh = make_mesh(dp=dp, sp=sp, devices=jax.devices()[:n])
    print(f"mesh: dp={dp} x sp={sp} on {jax.devices()[0].platform}")

    # a batch of 2*dp synthetic 10-second programmes (sp shards must be
    # >= 3 s, the 59-fragment short-term window minimum; and the gated
    # integrated loudness needs >= 50 non-silent M-points)
    B, T = 2 * dp, fs * 10
    rng = np.random.default_rng(0)
    t = np.arange(T) / fs
    x = np.stack([
        (0.1 + 0.05 * k) * np.sin(2 * np.pi * (220 + 60 * k) * t)
        * (np.sin(2 * np.pi * 0.25 * t) > -0.3)
        for k in range(B)
    ]).astype(np.float32)
    xs = np.stack([x, 0.8 * x], axis=1)  # [B, 2, T] stereo

    meter = EbuR128Meter(fs, nchan=2)
    out = analyze_r128(meter, jnp.asarray(xs), mesh)

    print("per-stream results (sharded, one jitted program):")
    for b in range(B):
        print(
            f"  stream {b}: I = {float(out['integrated'][b]):7.2f} LUFS  "
            f"LRA = {float(out['lra'][b]):5.2f} LU  "
            f"dBTP = {20 * np.log10(max(float(out['dbtp'][b]), 1e-10)):7.2f}"
        )

    # the 30-band spectrum shards the same way (banked LTI state handoff)
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer
    from meters_lv2_tpu.parallel.spectrum_sharded import analyze_spectrum

    sout, _ = analyze_spectrum(SpectrumAnalyzer(fs), jnp.asarray(xs), mesh)
    b0 = np.asarray(sout["bands"])[0]
    print(f"stream 0 spectrum: peak band {int(b0.argmax())} "
          f"at {b0.max():.1f} dB (time-sharded over 'sp')")

    # every meter family shards the same way (round 5): dBTP via the
    # cross-shard ballistics handoff, needles via exact entry states
    from meters_lv2_tpu.models.needle import DINMeter
    from meters_lv2_tpu.models.truepeak import TruePeakMeter
    from meters_lv2_tpu.parallel.meters_sharded import (
        analyze_needle, analyze_truepeak,
    )

    mono = jnp.asarray(xs[:, 0, :])  # [B, T]
    tp = analyze_truepeak(TruePeakMeter(fs), mono, mesh)
    din = analyze_needle(DINMeter(fs), mono, mesh, ref_level_db=-22.0)
    print(f"stream 0 dBTP {20 * np.log10(max(float(tp['peak'][0]), 1e-10)):6.2f}"
          f"  DIN needle {float(np.asarray(din)[0]):.3f}"
          "  (same mesh, whole-file sharded)")

    # checkpoint the sharded outputs without a host gather
    import tempfile

    from meters_lv2_tpu.utils.state import (
        load_state_sharded, save_state_sharded,
    )

    ckpt = tempfile.mkdtemp() + "/r128_out"
    save_state_sharded(out, ckpt)
    back = load_state_sharded(out, ckpt)
    assert float(jnp.max(jnp.abs(back["integrated"] - out["integrated"]))) == 0
    print(f"checkpointed + restored shard-by-shard at {ckpt}")


if __name__ == "__main__":
    main()
