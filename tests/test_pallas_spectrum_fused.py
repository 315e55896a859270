"""Fused Pallas spectrum core (ops/pallas_spectrum) vs the XLA path.

Runs the kernel in interpret mode on CPU — same dataflow and precision
structure (manual bf16 splits) as the compiled TPU kernel; on-chip
numbers come from tools/tpu_parity_check.py's spectrum family.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from signals import make_signal

FS = 48000


def _fused(mode):
    class _Ctx:
        def __enter__(self):
            self.old = os.environ.get("METERS_TPU_SPECTRUM_FUSED")
            os.environ["METERS_TPU_SPECTRUM_FUSED"] = mode

        def __exit__(self, *a):
            if self.old is None:
                del os.environ["METERS_TPU_SPECTRUM_FUSED"]
            else:
                os.environ["METERS_TPU_SPECTRUM_FUSED"] = self.old

    return _Ctx()


def _run(m, x, mode, chunks=1):
    with _fused(mode):
        st = m.init(x.shape[:-2])
        upd = jax.jit(lambda s, xb: m.update(s, xb, stereo=True))
        T = x.shape[-1]
        step = T // chunks
        for i in range(chunks):
            st = upd(st, jnp.asarray(x[..., i * step : (i + 1) * step]))
        out, _ = m.read(st)
    return out, st


def test_fused_spectrum_matches_xla():
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer

    m = SpectrumAnalyzer(FS)
    x = make_signal("mix", 2.0)
    ref, rst = _run(m, x, "0")
    out, ost = _run(m, x, "interpret")
    np.testing.assert_allclose(
        np.asarray(out["bands"]), np.asarray(ref["bands"]), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["peaks"]), np.asarray(ref["peaks"]), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(ost.zf), np.asarray(rst.zf), atol=1e-4,
        rtol=1e-3,
    )


def _smooth(mode):
    class _Ctx:
        def __enter__(self):
            self.old = os.environ.get("METERS_TPU_SPECTRUM_SMOOTH")
            os.environ["METERS_TPU_SPECTRUM_SMOOTH"] = mode

        def __exit__(self, *a):
            if self.old is None:
                del os.environ["METERS_TPU_SPECTRUM_SMOOTH"]
            else:
                os.environ["METERS_TPU_SPECTRUM_SMOOTH"] = self.old

    return _Ctx()


@pytest.mark.parametrize("smooth", ["gemm6", "scan"])
def test_fused_smoother_precision_modes_match_xla(smooth):
    """The f32-exact smoother modes (6-pass dots / VPU prefix scan)
    track the XLA f32 path.  They exist because the 3-pass smoother
    measured 0.009 dB on deep stopband display bins ON CHIP (round-5
    attribution; the round-4 pallas_stft display-bin law) — interpret
    mode cannot SHOW that difference (all modes sit at the ~0.0015 dB
    conv op-order noise here), so this is a correctness gate and the
    precision claim lives in docs/PARITY_ONCHIP_r05 + PARITY.md."""
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer

    m = SpectrumAnalyzer(FS)
    x = make_signal("sine997", 2.0)
    ref, rst = _run(m, x, "0")
    with _smooth(smooth):
        out, ost = _run(m, x, "interpret")
    np.testing.assert_allclose(
        np.asarray(out["bands"]), np.asarray(ref["bands"]), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["peaks"]), np.asarray(ref["peaks"]), atol=2e-3
    )


def test_fused_spectrum_nonaligned_tail_and_batch():
    """T % 128 != 0: kernel bulk + chained XLA tail; batched streams."""
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer

    m = SpectrumAnalyzer(FS)
    base = make_signal("bursts", 1.0)[:, :46000]  # 46000 % 128 != 0
    x = np.stack([base, 0.5 * base, 0.25 * base])  # [3, 2, T]
    ref, _ = _run(m, x, "0")
    out, _ = _run(m, x, "interpret")
    np.testing.assert_allclose(
        np.asarray(out["bands"]), np.asarray(ref["bands"]), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["peaks"]), np.asarray(ref["peaks"]), atol=2e-3
    )


def test_fused_spectrum_streaming_chunks_match_one_shot():
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer

    m = SpectrumAnalyzer(FS)
    x = make_signal("sine997", 2.0)
    one, _ = _run(m, x, "interpret", chunks=1)
    many, _ = _run(m, x, "interpret", chunks=4)
    # chunked runs apply the reference's per-process() 1e-20 denormal
    # offset once per chunk — sub-0.002 dB wiggle on near-floor bands
    np.testing.assert_allclose(
        np.asarray(many["bands"]), np.asarray(one["bands"]), atol=2e-3
    )


def test_fused_spectrum_runtime_speed_no_recompile():
    """set_speed flows into the kernel as a traced operator — toggling the
    display speed mid-stream must not recompile (spectrumlv2.c:161-177)."""
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer

    m = SpectrumAnalyzer(FS)
    x = make_signal("mix", 1.0)[:, : 128 * 128]
    with _fused("interpret"):
        st = m.init(())
        upd = jax.jit(lambda s, xb: m.update(s, xb, stereo=True))
        st = upd(st, jnp.asarray(x))
        st = m.set_speed(st, 8.0)
        st = upd(st, jnp.asarray(x))
        assert upd._cache_size() == 1
        fast, _ = m.read(st)

        # reference: XLA path with the same speed schedule
    with _fused("0"):
        st2 = m.init(())
        upd2 = jax.jit(lambda s, xb: m.update(s, xb, stereo=True))
        st2 = upd2(st2, jnp.asarray(x))
        st2 = m.set_speed(st2, 8.0)
        st2 = upd2(st2, jnp.asarray(x))
        ref, _ = m.read(st2)
    np.testing.assert_allclose(
        np.asarray(fast["bands"]), np.asarray(ref["bands"]), atol=2e-3
    )
