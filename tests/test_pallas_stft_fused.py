"""Fused Pallas STFT analyzer kernel vs the XLA rfft path.

Runs the kernel in interpreter mode on CPU; on-chip numbers/parity live
in docs/BENCHMARKS.md and tools/tpu_parity_check.py.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FS = 48000


def _signal(seed=5, T=FS):
    rng = np.random.default_rng(seed)
    t = np.arange(T) / FS
    base = np.sin(2 * np.pi * 440 * t) + 0.4 * np.sin(2 * np.pi * 2930 * t)
    return np.stack(
        [base + 0.01 * rng.standard_normal(T),
         np.roll(base, 11) + 0.01 * rng.standard_normal(T)]
    ).astype(np.float32)


@pytest.fixture
def _modes():
    old = os.environ.get("METERS_TPU_STFT_FUSED")
    yield
    if old is None:
        os.environ.pop("METERS_TPU_STFT_FUSED", None)
    else:
        os.environ["METERS_TPU_STFT_FUSED"] = old


def _run_phasewheel(mode, x):
    from meters_lv2_tpu.models.phasewheel import PhaseWheel

    os.environ["METERS_TPU_STFT_FUSED"] = mode
    m = PhaseWheel(FS)
    st = m.init(())
    out1, st = m.process(st, jnp.asarray(x))
    out2, st = m.process(st, jnp.asarray(x))  # carried tail exercised
    return jax.tree.map(np.asarray, (out1, out2))


def test_phasewheel_fused_matches_xla(_modes):
    x = _signal()
    ref1, ref2 = _run_phasewheel("0", x)
    got1, got2 = _run_phasewheel("interpret", x)
    for ref, got in ((ref1, got1), (ref2, got2)):
        # level: -100-marked mask must agree except bins straddling the
        # threshold; values agree to f32 rounding
        mr, mg = ref["level"] > -99, got["level"] > -99
        assert np.mean(mr == mg) > 0.999
        both = mr & mg
        np.testing.assert_allclose(
            got["level"][both], ref["level"][both], rtol=2e-5
        )
        # phase difference compared circularly (f32 rounding can flip
        # atan2 branch right at +-pi)
        d = got["phase"][both] - ref["phase"][both]
        d = (d + np.pi) % (2 * np.pi) - np.pi
        np.testing.assert_allclose(d, 0.0, atol=1e-4)
        np.testing.assert_allclose(got["peak"], ref["peak"], rtol=1e-5)


def test_stereoscope_fused_matches_xla(_modes):
    from meters_lv2_tpu.models.phasewheel import Stereoscope

    x = _signal(seed=9)

    def run(mode):
        os.environ["METERS_TPU_STFT_FUSED"] = mode
        m = Stereoscope(FS)
        st = m.init(())
        out, st = m.process(st, jnp.asarray(x))
        out, st = m.process(st, jnp.asarray(x))
        return jax.tree.map(np.asarray, out)

    ref = run("0")
    got = run("interpret")
    big = ref["level"] > 1e-12
    np.testing.assert_allclose(
        got["level"][big], ref["level"][big], rtol=1e-4
    )
    np.testing.assert_allclose(got["lr"][big], ref["lr"][big], atol=1e-4)


def test_fused_gate_rejects_441k(_modes):
    """44.1 kHz hop (1764) is not 128-aligned -> XLA path used."""
    from meters_lv2_tpu.models.phasewheel import _fused_mode
    from meters_lv2_tpu.ops import fft as fft_ops

    os.environ["METERS_TPU_STFT_FUSED"] = "interpret"
    stft = fft_ops.STFT(44100)
    use, _ = _fused_mode(stft, 44100)
    assert not use
    stft48 = fft_ops.STFT(48000)
    use, interp = _fused_mode(stft48, 48000)
    assert use and interp


@pytest.mark.slow
def test_fused_gate_rejects_long_blocks(_modes):
    """Multi-second blocks exceed the kernel's per-frame VMEM budget
    (~200 KB/frame against the 16 MB scoped limit) -> XLA path used;
    the analyzer still processes them correctly."""
    from meters_lv2_tpu.models.phasewheel import PhaseWheel, _fused_mode
    from meters_lv2_tpu.ops import fft as fft_ops

    os.environ["METERS_TPU_STFT_FUSED"] = "interpret"
    stft48 = fft_ops.STFT(48000)
    T10 = stft48.hop * (10 * 48000 // stft48.hop)  # ~10 s, hop-aligned
    use, _ = _fused_mode(stft48, T10)
    assert not use  # F = T/hop way past the VMEM-bounded 32
    m = PhaseWheel(48000)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, T10)).astype(np.float32) * 0.1
    out, _ = m.process(m.init(()), jnp.asarray(x))
    assert np.isfinite(np.asarray(out["level"])).all()


def test_phasewheel_inkernel_analysis_matches_raw(_modes):
    """'phasewheel' kernel mode (power/atan2/thresholds in VMEM) vs the
    default raw+XLA analysis: same masks, phase to Cephes-poly rounding."""
    x = _signal(seed=9)
    os.environ["METERS_TPU_PW_KERNEL_ANALYSIS"] = "0"
    try:
        ref1, ref2 = _run_phasewheel("interpret", x)
        os.environ["METERS_TPU_PW_KERNEL_ANALYSIS"] = "1"
        got1, got2 = _run_phasewheel("interpret", x)
    finally:
        os.environ.pop("METERS_TPU_PW_KERNEL_ANALYSIS", None)
    for ref, got in ((ref1, got1), (ref2, got2)):
        mr, mg = ref["level"] > -99, got["level"] > -99
        np.testing.assert_array_equal(mr, mg)  # identical power path
        both = mr & mg
        np.testing.assert_allclose(
            got["level"][both], ref["level"][both], rtol=1e-6)
        # kernel atan2 is the Cephes minimax polynomial (~1e-7 abs)
        np.testing.assert_allclose(
            got["phase"][both], ref["phase"][both], atol=5e-7)
        np.testing.assert_allclose(got["peak"], ref["peak"], rtol=1e-5)
