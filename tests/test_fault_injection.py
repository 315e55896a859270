"""Numerical fault injection: NaN/Inf blocks must not poison meter state.

The reference's de-facto sanitizer is isfinite/NaN state flushing after
every block (ebu_r128_proc.cc:331-334, kmeterdsp.cc:101-107,
stcorrdsp.cc:65-69, vumeterdsp.cc:70-73, spectrumlv2.c:231-236).  Each
meter here must recover to sane readouts after a corrupted block.
"""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

FS = 48000


def _corrupt_then_clean():
    rng = np.random.default_rng(0)
    bad = (0.3 * rng.standard_normal(4800)).astype(np.float32)
    bad[100] = np.nan
    bad[200] = np.inf
    bad[300] = -np.inf
    clean = (0.25 * np.sin(2 * np.pi * 997 * np.arange(FS * 2) / FS)).astype(
        np.float32
    )
    return bad, clean


@pytest.mark.slow
def test_linear_meters_recover():
    from meters_lv2_tpu.models import cor, kmeter, needle

    bad, clean = _corrupt_then_clean()

    vu = needle.VUMeter(FS)
    st = vu.update(vu.init(()), jnp.asarray(bad))
    v, st = vu.read(st)  # inf flagged like the reference
    for i in range(0, len(clean), 4800):
        st = vu.update(st, jnp.asarray(clean[i : i + 4800]))
    v, _ = vu.read(st)
    assert np.isfinite(float(v)) and 0 < float(v) < 10

    km = kmeter.KMeter(FS)
    st = km.update(km.init(()), jnp.asarray(bad))
    for i in range(0, len(clean), 4800):
        st = km.update(st, jnp.asarray(clean[i : i + 4800]))
    out, _ = km.read(st)
    assert np.isfinite(float(out["rms"])) and float(out["rms"]) > 0.1

    cm = cor.CorrelationMeter(FS)
    lr = jnp.stack([jnp.asarray(bad), jnp.asarray(bad)])
    st = cm.update(cm.init(()), lr)
    lrc = jnp.stack([jnp.asarray(clean), jnp.asarray(clean)])
    st = cm.update(st, lrc)
    c, _ = cm.read(st)
    assert np.isfinite(float(c)) and float(c) > 0.9


def test_ppm_and_truepeak_recover():
    from meters_lv2_tpu.models import needle, truepeak

    bad, clean = _corrupt_then_clean()
    ppm = needle.BBCMeter(FS)
    st = ppm.update(ppm.init(()), jnp.asarray(bad))
    _, st = ppm.read(st)  # the inf reading is reported once, as in the
    # reference (read resets the max; the entry clamp bounds the state)
    for i in range(0, len(clean), 4800):
        st = ppm.update(st, jnp.asarray(clean[i : i + 4800]))
    v, _ = ppm.read(st, ref_level_db=-18.0)
    assert np.isfinite(float(v)) and 0 < float(v) < 30

    tp = truepeak.TruePeakMeter(FS)
    st = tp.update(tp.init(()), jnp.asarray(bad))
    _, st = tp.read(st)  # corrupted reading reported once (inf), then reset
    # first clean read still sees the bad block's 47-sample resampler tail
    # and the slowly-decaying ballistic state — finite but elevated, exactly
    # like the reference recovering through its entry clamp
    st = tp.update(st, jnp.asarray(clean[:4800]))
    out, st = tp.read(st)
    assert np.isfinite(float(out["peak"]))
    # after a full read cycle on clean audio the readings are pristine
    for i in range(4800, len(clean), 4800):
        st = tp.update(st, jnp.asarray(clean[i : i + 4800]))
    out, st = tp.read(st)
    np.testing.assert_allclose(float(out["peak"]), 0.25, rtol=5e-3)
    # one more clean stretch: the max-since-read no longer sees the decay
    for i in range(0, len(clean), 4800):
        st = tp.update(st, jnp.asarray(clean[i : i + 4800]))
    out, _ = tp.read(st)
    assert float(out["level"]) < 0.7  # ballistics decaying back toward the signal


@pytest.mark.slow
def test_r128_and_spectrum_recover():
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer

    bad, clean = _corrupt_then_clean()
    m = EbuR128Meter(FS, nchan=2)
    st = m.init(())
    st = jax.jit(m.update)(st, jnp.stack([jnp.asarray(bad)] * 2))
    xc = jnp.stack([jnp.asarray(clean)] * 2)
    st = jax.jit(m.update)(st, xc)
    st = jax.jit(m.update)(st, xc)
    out, _ = m.read(st)
    # K-weighting state flushes (ebu_r128_proc.cc:331-334); the corrupted
    # fragments' loudness is NaN-clamped to -200 and later windows recover
    assert np.isfinite(float(out["loudness_M"]))
    assert -30 < float(out["loudness_M"]) < -10

    sp = SpectrumAnalyzer(FS)
    st = sp.update(sp.init(()), jnp.asarray(bad))
    st = sp.update(st, jnp.asarray(clean))
    out, _ = sp.read(st)
    bands = np.asarray(out["bands"])
    assert np.all(np.isfinite(bands))
    assert bands.argmax() == 16  # 997 Hz lands in the 1 kHz band


def test_r128_dbtp_skips_nan():
    """TruePeakdsp::process_max compares `if (v > m)` — NaN oversamples
    are skipped, never poisoning dBTP (truepeakdsp.cc:111-122).  Both the
    XLA path and the fused Pallas core must match."""
    import os

    from meters_lv2_tpu.models.ebur128 import EbuR128Meter

    bad, clean = _corrupt_then_clean()
    # NaN-only corruption: Inf must still register in the max (the
    # reference keeps fabsf(inf)), NaN must be skipped
    bad = np.where(np.isinf(bad), np.float32(0.1), bad)
    m = EbuR128Meter(FS, nchan=2)

    def run():
        st = m.init(())
        st = jax.jit(m.update)(st, jnp.stack([jnp.asarray(bad)] * 2))
        st = jax.jit(m.update)(st, jnp.stack([jnp.asarray(clean)] * 2))
        out, _ = m.read(st)
        return float(out["dbtp"])

    ref_clean = None
    old = os.environ.get("METERS_TPU_R128_FUSED")
    try:
        os.environ["METERS_TPU_R128_FUSED"] = "0"
        v_xla = run()
        os.environ["METERS_TPU_R128_FUSED"] = "interpret"
        v_fused = run()
    finally:
        if old is None:
            os.environ.pop("METERS_TPU_R128_FUSED", None)
        else:
            os.environ["METERS_TPU_R128_FUSED"] = old
    assert np.isfinite(v_xla) and v_xla > 0.0
    np.testing.assert_allclose(v_fused, v_xla, rtol=1e-4)
