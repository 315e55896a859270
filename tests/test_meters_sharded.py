"""Sequence-parallel whole-file analysis (parallel.meters_sharded) ==
serial single-update for dBTP, DR-14/TPnRMS, sigdist (both variance
modes), bitmeter, the needle family (VU/PPM/BBC M-6), K-meter, COR and
surround, on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meters_lv2_tpu.parallel import make_mesh
from meters_lv2_tpu.parallel.meters_sharded import (
    analyze_bitmeter, analyze_dr14, analyze_kmeter, analyze_needle,
    analyze_sigdist, analyze_stcorr, analyze_surround, analyze_tpnrms,
    analyze_truepeak,
)

FS = 48000


def _signal(B, T, seed=0, chans=None):
    rng = np.random.default_rng(seed)
    shape = (B, T) if chans is None else (B, chans, T)
    x = 0.25 * rng.standard_normal(shape).astype(np.float32)
    # a couple of loud bursts so peaks/ballistics have structure
    x[..., T // 3 : T // 3 + 64] *= 4.0
    return jnp.asarray(x)


def test_truepeak_sp8_equals_serial():
    from meters_lv2_tpu.models.truepeak import TruePeakMeter

    B, T = 8, FS * 2
    x = _signal(B, T, seed=1)
    m = TruePeakMeter(FS)
    out = analyze_truepeak(m, x, make_mesh(dp=1, sp=8))

    ref, _ = m.read(m.update(m.init((B,)), x))
    # conv windows and ballistics order are identical per sample — exact
    np.testing.assert_array_equal(out["peak"], ref["peak"])
    np.testing.assert_array_equal(out["level"], ref["level"])


@pytest.mark.slow
def test_dr14_sp_equals_serial():
    from meters_lv2_tpu.models.dr14 import DR14Meter

    # 13 s: 4 complete 3 s windows + a 1 s open remainder; shard
    # boundaries (13/4 s) land mid-window, exercising the psum assembly
    B, C, T = 4, 2, FS * 13
    x = _signal(B, T, seed=2, chans=C)
    m = DR14Meter(FS, nchan=C)
    out = analyze_dr14(m, x, make_mesh(dp=2, sp=4))

    ref, _ = m.read(m.update(m.init((B,)), x))
    # integer window count exact; peak chain exact; dB outputs within
    # f32 boundary-sum reorder noise (well under a 0.01 dB hist bin)
    np.testing.assert_array_equal(out["block_count"], ref["block_count"])
    np.testing.assert_array_equal(out["m_peak"], ref["m_peak"])
    np.testing.assert_array_equal(out["v_peak"], ref["v_peak"])
    for k in ("dr", "dr_total", "m_rms", "v_rms"):
        np.testing.assert_allclose(out[k], ref[k], atol=2e-3, err_msg=k)


@pytest.mark.slow
def test_tpnrms_sp_equals_serial():
    from meters_lv2_tpu.models.dr14 import TPnRMSMeter

    B, C, T = 2, 2, FS * 4
    x = _signal(B, T, seed=3, chans=C)
    m = TPnRMSMeter(FS, nchan=C)
    out = analyze_tpnrms(m, x, make_mesh(dp=1, sp=8))
    ref, _ = m.read(m.update(m.init((B,)), x))
    np.testing.assert_array_equal(out["v_peak"], ref["v_peak"])
    np.testing.assert_array_equal(out["m_peak"], ref["m_peak"])
    for k in ("v_rms", "m_rms"):
        np.testing.assert_allclose(out[k], ref[k], rtol=2e-5, err_msg=k)


@pytest.mark.parametrize("quirk", [False, True])
@pytest.mark.slow
def test_sigdist_sp_equals_serial(quirk):
    from meters_lv2_tpu.models.sigdist import SigDistMeter

    B, T = 4, FS * 2
    x = _signal(B, T, seed=4)
    # clip some samples out of histogram range to exercise the OOR path
    x = jnp.where(jnp.abs(x) > 1.1, jnp.sign(x) * 1.35, x)
    m = SigDistMeter(FS, reference_oor_count=quirk)
    out = analyze_sigdist(m, x, make_mesh(dp=2, sp=4))

    ref, _ = m.read(m.update(m.init((B,)), x))
    np.testing.assert_array_equal(out["hist"], ref["hist"])
    np.testing.assert_array_equal(out["hist_max"], ref["hist_max"])
    np.testing.assert_array_equal(
        out["integration_time"], ref["integration_time"]
    )
    np.testing.assert_allclose(out["hist_avg"], ref["hist_avg"], rtol=2e-5,
                               atol=1e-4)
    np.testing.assert_allclose(out["mean"], ref["mean"], rtol=2e-4,
                               atol=1e-7)
    np.testing.assert_allclose(out["variance"], ref["variance"], rtol=2e-4)


def test_bitmeter_sp_equals_serial_bitexact():
    from meters_lv2_tpu.models.bitmeter import BitMeter

    B, T = 2, FS
    rng = np.random.default_rng(5)
    x = 0.3 * rng.standard_normal((B, T)).astype(np.float32)
    # denormals, zeros, infs, nans in known spots
    x[0, 10] = np.float32(1e-41)
    x[0, 20] = 0.0
    x[1, 30] = np.inf
    x[1, 40] = np.nan
    x = jnp.asarray(x)
    m = BitMeter(FS)
    out = analyze_bitmeter(m, x, make_mesh(dp=2, sp=4))
    ref, _ = m.read(m.update(m.init((B,)), x))
    for k in ref:
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)


# ---------------------------------------------------------------------------
# Needle family / K-meter / COR / surround (round-5 sp extension)
# ---------------------------------------------------------------------------


def test_vu_sp8_equals_serial():
    from meters_lv2_tpu.models.needle import VUMeter

    B, T = 4, FS
    x = _signal(B, T, seed=6)
    m = VUMeter(FS)
    out = analyze_needle(m, x, make_mesh(dp=1, sp=8))
    ref, _ = m.read(m.update(m.init((B,)), x))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("kind", ["DIN", "BBC"])
def test_ppm_sp_equals_serial_exact(kind):
    from meters_lv2_tpu.models.needle import BBCMeter, DINMeter

    B, T = 4, FS
    x = _signal(B, T, seed=7)
    m = (DINMeter if kind == "DIN" else BBCMeter)(FS)
    out = analyze_needle(m, x, make_mesh(dp=2, sp=4), ref_level_db=-18.0)
    ref, _ = m.read(m.update(m.init((B,)), x), ref_level_db=-18.0)
    # identical per-sample recurrence from exact entry states — exact
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("s20", [False, True])
def test_bbcm6_sp_equals_serial_exact(s20):
    from meters_lv2_tpu.models.needle import BBCMidSideMeter

    B, T = 2, FS
    x = _signal(B, T, seed=8, chans=2)
    m = BBCMidSideMeter(FS)
    out = analyze_needle(m, x, make_mesh(dp=1, sp=8), s20=s20)
    ref, _ = m.read(m.update(m.init((B,)), x, s20=s20))
    np.testing.assert_array_equal(out["mid"], ref["mid"])
    np.testing.assert_array_equal(out["side"], ref["side"])


def test_kmeter_sp_equals_serial():
    from meters_lv2_tpu.models.kmeter import K20Meter

    B, T = 4, FS * 2
    x = _signal(B, T, seed=9)
    m = K20Meter(FS)
    out = analyze_kmeter(m, x, make_mesh(dp=2, sp=4))
    ref, _ = m.read(m.update(m.init((B,)), x))
    # digital peak: NaN-masked max + sqrt, identical ops — exact
    np.testing.assert_array_equal(out["peak"], ref["peak"])
    np.testing.assert_allclose(out["rms"], ref["rms"], rtol=2e-5, atol=1e-7)


def test_stcorr_sp_equals_serial():
    from meters_lv2_tpu.models.cor import CorrelationMeter

    B, T = 4, FS
    rng = np.random.default_rng(10)
    mono = 0.3 * rng.standard_normal((B, 1, T)).astype(np.float32)
    x = jnp.asarray(
        np.concatenate([mono, 0.7 * mono + 0.1 * rng.standard_normal(
            (B, 1, T)).astype(np.float32)], axis=1)
    )
    m = CorrelationMeter(FS)
    out = analyze_stcorr(m, x, make_mesh(dp=1, sp=8))
    ref, _ = m.read(m.update(m.init((B,)), x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_surround_sp_equals_serial():
    from meters_lv2_tpu.models.surround import Surround5Meter

    B, C, T = 4, 5, FS
    x = _signal(B, T, seed=11, chans=C)
    m = Surround5Meter(FS)
    out = analyze_surround(m, x, make_mesh(dp=2, sp=4))
    ref, _ = m.read(m.update(m.init((B,)), x))
    np.testing.assert_array_equal(out["peak"], ref["peak"])
    np.testing.assert_allclose(out["level"], ref["level"], rtol=2e-5,
                               atol=1e-7)
    np.testing.assert_allclose(
        out["correlation"], ref["correlation"], rtol=1e-4, atol=1e-5
    )
