"""On-TPU parity sweep against committed golden fixtures — EVERY family.

The CPU test suite validates numerics of the XLA graph, but TPU matmul
precision (bf16-pass composition), Pallas kernels (ops/pallas_r128,
ops/pallas_ballistics) and transcendental lowering differ from CPU
float32.  This tool streams the golden fixtures through the meters ON THE
ACTIVE PLATFORM (the axon TPU by default) and reports a per-family
worst-case error table; exact-integer families assert equality.

It reuses the committed golden-parity test functions (tests/
test_golden_parity.py, tests/test_fft_golden_parity.py) — outside pytest
the conftest CPU-forcing does not apply, so the identical comparisons run
on the chip, with `assert_level` instrumented to record worst deviations.

    python tools/tpu_parity_check.py [family ...]
    families: ebur128 truepeak ballistics spectrum dr14 sigdist bitmeter
              stft stcorr surround goniometer resample    (default: all)

Legacy single-fixture mode (used by older notes): a fixture name like
`ebur128_mix` or `truepeak_mix` runs just that fixture.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

# on-chip tolerance scale for the CPU-tight fft/goniometer/resampler
# asserts — must be set BEFORE tests/test_fft_golden_parity imports
# (it reads _RT at import time)
os.environ.setdefault("METERS_GOLDEN_RTOL_SCALE", "10")


def _fx(name):
    with open(os.path.join(FIXDIR, f"{name}.json")) as f:
        return json.load(f)


# --------------------------------------------------------------------------
# custom worst-error sweeps (families where the dB deviation is the result)
# --------------------------------------------------------------------------


def check_truepeak(name="truepeak_mix"):
    import jax
    import jax.numpy as jnp

    from signals import make_signal
    from meters_lv2_tpu.models.truepeak import TruePeakMeter

    fx = _fx(name)
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
    return worst


def check_ebur128(name="ebur128_mix"):
    import jax
    import jax.numpy as jnp

    from signals import make_signal, make_surround
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter

    fx = _fx(name)
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
    def check_hist(got, want, tag):
        """Bin-exact, except gating points EXACTLY on a bin edge may move
        to the adjacent bin under the TPU's HIGH-precision rounding
        (~4.5e-6 relative): total count must match and no point may move
        further than one bin (cumsum bound), at most 2 moved points.
        Measured case: ebur128_96k_mix, one S point at the -14.55 LUFS
        edge (bins 554<->555); I differed 0.00012 dB, LRA 2e-8."""
        got = np.asarray(got)
        want = np.asarray(want)
        if np.array_equal(got, want):
            return 0
        assert got.sum() == want.sum(), f"{name}/{tag}: count mismatch"
        c = np.cumsum(got - want)
        assert np.abs(c).max() <= 1, f"{name}/{tag}: >1-bin move"
        moved = int(np.abs(got - want).sum() // 2)
        assert moved <= 2, f"{name}/{tag}: {moved} edge flips"
        return moved

    fm = check_hist(st.hist_m, final["histM"], "histM")
    fs_ = check_hist(st.hist_s, final["histS"], "histS")
    if fm or fs_:
        print(f"  {name}: {fm + fs_} adjacent-bin edge flip(s) (allowed)")
    return worst


def check_spectrum(name):
    """All 30 bands incl. the 25 Hz high-Q band (pole radius 1-1e-5,
    src/spectr.c:89-206) — exactly where f32 GEMM precision bites."""
    import jax
    import jax.numpy as jnp

    from signals import make_signal
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer

    fx = _fx(name)
    x = make_signal(fx["signal"], fx["seconds"], fs=fx["fs"])
    m = SpectrumAnalyzer(fx["fs"])
    st = m.init(())
    upd = jax.jit(lambda s, xb: m.update(s, xb, stereo=True))
    reads = iter(fx["reads"])
    worst = 0.0
    worst_sig = 0.0  # bins the golden run puts above -60 dBFS (signal, not
    # stopband leakage: the strict worst lands on transient leakage bins at
    # -85..-90 dB, where filter rounding is relatively largest — see
    # docs/PARITY.md spectrum note)
    for b in range(x.shape[1] // fx["block"]):
        st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
        if (b + 1) % fx["read_every"] == 0:
            out, _ = m.read(st)
            rec = next(reads)
            bands = np.asarray(out["bands"])
            peaks = np.asarray(out["peaks"])
            for i in range(30):
                for got, want in [(bands[i], rec["bands"][i]),
                                  (peaks[i], rec["peaks"][i])]:
                    if want <= -99.9:
                        assert got <= -99.0, (name, i, got, want)
                    else:
                        err = abs(float(got) - want)
                        worst = max(worst, err)
                        if want > -60.0:
                            worst_sig = max(worst_sig, err)
    print(f"  {name}: worst {worst:.5f} dB, in-band(>-60dBFS) "
          f"{worst_sig:.5f} dB")
    return worst


# --------------------------------------------------------------------------
# family registry: reuse the golden-parity test functions on-chip,
# with assert_level instrumented to report the worst deviation
# --------------------------------------------------------------------------


def _run_tests(fns):
    import test_golden_parity as tgp

    orig = tgp.assert_level
    worst = [0.0]

    def tracking(got, want, tol=tgp.TOL_DB, floor=1e-6, msg=""):
        g, w = float(got), float(want)
        if not (abs(w) < floor and abs(g) < floor):
            worst[0] = max(worst[0], abs(tgp._db(g) - tgp._db(w)))
        orig(got, want, tol, floor, msg)

    tgp.assert_level = tracking
    try:
        for fn in fns:
            fn()
    finally:
        tgp.assert_level = orig
    return worst[0]


def _families():
    import test_fft_golden_parity as tfp
    import test_golden_parity as tgp

    return {
        # worst is a dB deviation unless noted
        "ebur128": lambda: max(
            check_ebur128(n) for n in
            ("ebur128_mix", "ebur128_bursts", "ebur128_5ch_mix",
             "ebur128_44k_mix", "ebur128_96k_mix")
        ),
        "truepeak": lambda: max(
            check_truepeak(n) for n in
            ("truepeak_mix", "truepeak_intersample_peak",
             "truepeak_44k_intersample_peak", "truepeak_96k_intersample_peak")
        ),
        # PPM/VU/K ballistics through the TPU path (Pallas kernel when
        # METERS_TPU_PALLAS=auto resolves to on)
        "ballistics": lambda: _run_tests([
            lambda: tgp.test_needle_parity("vu"),
            lambda: tgp.test_needle_parity("iec1"),
            lambda: tgp.test_needle_parity("iec2"),
            tgp.test_msppm_parity,
            tgp.test_msppm_s20_toggle_parity,
            tgp.test_kmeter_parity,
        ]),
        "spectrum": lambda: max(
            check_spectrum(n) for n in
            ("spectrum_mix", "spectrum_sine997", "spectrum_44k_mix",
             "spectrum_96k_mix")
        ),
        # exact histogram + <=0.01 dB readouts (asserts inside)
        "dr14": lambda: _run_tests([
            lambda: tgp.test_dr14_parity("dr14"),
            lambda: tgp.test_dr14_parity("dr14mono"),
            lambda: tgp.test_dr14_parity("dr14_44k"),
            lambda: tgp.test_dr14_parity("dr14_96k"),
            tgp.test_tpnrms_parity,
        ]),
        # exact integer counters (asserts inside; 0.0 on success)
        "sigdist": lambda: _run_tests([tgp.test_sigdist_parity]),
        "bitmeter": lambda: _run_tests([tgp.test_bitmeter_parity]),
        # one STFT meter (power/phase per frame vs fftw-free golden)
        "stft": lambda: _run_tests([tfp.test_stft_parity]),
        "stcorr": lambda: _run_tests([tgp.test_stcorr_parity]),
        "surround": lambda: _run_tests([
            lambda p=p: tgp.test_surround_parity(p)
            for p in ("surround3", "surround5", "surround7", "surround8")
        ]),
        # fused Pallas STFT analyzers on-chip (44.1k prefixes exercise the
        # XLA fallback gate)
        "phasewheel": lambda: _run_tests([
            lambda: tfp.test_phasewheel_parity("phasewheel"),
            lambda: tfp.test_phasewheel_parity("phasewheel_44k"),
        ]),
        "stereoscope": lambda: _run_tests([
            lambda: tfp.test_stereoscope_parity("stereoscope"),
            lambda: tfp.test_stereoscope_parity("stereoscope_44k"),
        ]),
        # GUI-thread analyzers + the zita resampler (MXU polyphase convs)
        "goniometer": lambda: _run_tests([
            lambda: tfp.test_goniometer_parity("goniometer"),
            lambda: tfp.test_goniometer_parity("goniometer_os1"),
        ]),
        "resample": lambda: _run_tests([tfp.test_rational_resampler_parity]),
    }


def main(argv):
    import jax

    print("device:", jax.devices()[0], "| precision:",
          os.environ.get("METERS_TPU_PRECISION", "high"), "| pallas:",
          os.environ.get("METERS_TPU_PALLAS", "auto"), "| fused:",
          os.environ.get("METERS_TPU_R128_FUSED", "auto"))

    # legacy single-fixture mode
    if len(argv) == 1 and os.path.exists(
        os.path.join(FIXDIR, f"{argv[0]}.json")
    ):
        name = argv[0]
        worst = (check_truepeak(name) if name.startswith("truepeak")
                 else check_ebur128(name))
        print(f"{name} worst err: {worst:.5f} dB (budget 0.01)")
        print("PASS" if worst <= 0.01 else "FAIL")
        return 0 if worst <= 0.01 else 1

    fams = _families()
    names = argv or list(fams)
    results, failed = {}, []
    for n in names:
        t0 = time.time()
        try:
            w = fams[n]()
            results[n] = w
            print(f"[{n:10s}] worst {w:.5f} dB  ({time.time()-t0:.0f}s)  OK")
        except Exception as e:  # incl. harness errors — keep sweeping
            failed.append(n)
            print(f"[{n:10s}] FAIL ({time.time()-t0:.0f}s): {e!r}")
    print()
    print("family      worst-dB   (exactness families assert ==)")
    for n, w in results.items():
        print(f"{n:10s}  {w:.5f}")
    if failed:
        print("FAILED:", ", ".join(failed))
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
