"""Native runtime: WAV round-trips and the CPU engine vs JAX meters."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meters_lv2_tpu.io import wav as wavio
from meters_lv2_tpu.runtime import native

FS = 48000


def _have_native():
    return native.load() is not None


def test_wav_roundtrip(tmp_path):
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(FS) / FS)).astype(np.float32)
    data = np.stack([x, -x])
    p = str(tmp_path / "t.wav")
    wavio.write_wav(p, data, FS, format=32)
    y, r = wavio.read_wav(p)
    assert r == FS and y.shape == (2, FS)
    np.testing.assert_allclose(y, data, atol=1e-7)
    # PCM16 path
    p2 = str(tmp_path / "t16.wav")
    wavio.write_wav(p2, data, FS, format=16)
    y2, _ = wavio.read_wav(p2)
    np.testing.assert_allclose(y2, data, atol=1.5 / 32768)
    # python fallback agrees with native reader
    if _have_native():
        yp, rp = wavio._read_wav_py(p)
        np.testing.assert_allclose(yp, y, atol=0)


@pytest.mark.skipif(not _have_native(), reason="no native toolchain")
@pytest.mark.parametrize("kind", ["vu", "iec1", "iec2", "kmeter", "truepeak"])
def test_native_engine_matches_jax(kind):
    from meters_lv2_tpu.models import kmeter, needle, truepeak

    rng = np.random.default_rng(7)
    x = (0.4 * rng.standard_normal((2, 1024 * 20))).astype(np.float32)
    eng = native.NativeEngine(kind, FS, 2)
    cls = {
        "vu": needle.VUMeter,
        "iec1": needle.DINMeter,
        "iec2": needle.BBCMeter,
        "kmeter": kmeter.KMeter,
        "truepeak": truepeak.TruePeakMeter,
    }[kind]
    m = cls(FS)
    st = m.init((2,))
    upd = jax.jit(m.update)
    for b in range(20):
        blk = x[:, b * 1024 : (b + 1) * 1024]
        eng.process(blk)
        st = upd(st, jnp.asarray(blk))
    nv = eng.read()
    if kind in ("vu", "iec1", "iec2"):
        jv, _ = m.read(st, ref_level_db=-18.0)
        np.testing.assert_allclose(np.asarray(jv), nv, rtol=2e-4)
    elif kind == "kmeter":
        jv, _ = m.read(st)
        got = np.stack([np.asarray(jv["rms"]), np.asarray(jv["peak"])], -1).ravel()
        np.testing.assert_allclose(got, nv, rtol=2e-4)
    else:
        jv, _ = m.read(st)
        got = np.stack([np.asarray(jv["level"]), np.asarray(jv["peak"])], -1).ravel()
        np.testing.assert_allclose(got, nv, rtol=3e-4)


@pytest.mark.skipif(not _have_native(), reason="no native toolchain")
def test_native_r128_close_to_jax():
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from signals import make_signal

    x = make_signal("mix", 12.0)
    eng = native.NativeEngine("r128", FS, 2)
    eng.process(x)
    nv = eng.read()  # M, S, maxM, maxS, I, LRAmin, LRAmax, dbtp
    m = EbuR128Meter(FS, nchan=2)
    st = m.init(())
    st = jax.jit(m.update)(st, jnp.asarray(x))
    out, _ = jax.jit(m.read)(st)
    for i, key in enumerate(
        ["loudness_M", "loudness_S", "max_M", "max_S", "integrated",
         "range_min", "range_max"]
    ):
        assert abs(float(out[key]) - nv[i]) < 0.01, (key, float(out[key]), nv[i])
    assert abs(float(out["dbtp"]) - nv[7]) < 1e-4


@pytest.mark.skipif(not _have_native(), reason="no native toolchain")
def test_native_spectrum_matches_jax():
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer

    rng = np.random.default_rng(2)
    x = (0.3 * rng.standard_normal((2, FS))).astype(np.float32)
    eng = native.NativeEngine("spectrum", FS, 2)
    eng.process(x)
    nv = eng.read()
    m = SpectrumAnalyzer(FS)
    st = m.init(())
    st = jax.jit(lambda s, xb: m.update(s, xb, stereo=True))(st, jnp.asarray(x))
    out, _ = m.read(st)
    np.testing.assert_allclose(np.asarray(out["bands"]), nv[:30], atol=0.01)
    np.testing.assert_allclose(np.asarray(out["peaks"]), nv[30:], atol=0.01)


@pytest.mark.skipif(not _have_native(), reason="no native toolchain")
def test_native_msppm_sigdist_bitmeter():
    from meters_lv2_tpu.models import needle, sigdist

    rng = np.random.default_rng(4)
    x = (0.4 * rng.standard_normal((2, 1024 * 10))).astype(np.float32)

    eng = native.NativeEngine("msppm", FS, 2)
    m = needle.BBCMidSideMeter(FS)
    st = m.init(())
    for b in range(10):
        blk = x[:, b * 1024 : (b + 1) * 1024]
        eng.process(blk)
        st = m.update(st, jnp.asarray(blk))
    nv = eng.read()
    jv, _ = m.read(st, ref_level_db=-18.0)
    np.testing.assert_allclose(float(jv["mid"]), nv[0], rtol=3e-4)
    np.testing.assert_allclose(float(jv["side"]), nv[1], rtol=3e-4)

    eng = native.NativeEngine("sigdist", FS, 1)
    ms = sigdist.SigDistMeter(FS)
    ss = ms.init(())
    eng.process(x[:1])
    ss = jax.jit(ms.update)(ss, jnp.asarray(x[0]))
    nv = eng.read()
    o, _ = ms.read(ss)
    # peak-bin tie-breaking differs (first-max vs first-to-reach); compare
    # the peak count and check the bins hold equal counts
    assert int(o["hist_max"]) == int(nv[1])
    hist = np.asarray(o["hist"])
    assert hist[int(nv[0])] == int(nv[1])
    np.testing.assert_allclose(float(o["hist_avg"]), nv[2], rtol=1e-3)
    np.testing.assert_allclose(float(o["hist_var"]), nv[3], rtol=1e-3)

    vals = np.array([0.0, 1.5, -0.25, np.nan, np.inf, 1e-42] * 50, np.float32)
    eng = native.NativeEngine("bitmeter", FS, 1)
    eng.process(vals[None])
    nv = eng.read()
    assert nv[0] == 50 and nv[2] == 50 and nv[3] == 50 and nv[4] == 50
    assert nv[5] == 0.25 and nv[6] == 1.5


def test_native_batch_decode(tmp_path):
    """Thread-pool batch decode == per-file decode, incl. an error slot."""
    import pytest

    from meters_lv2_tpu.io import write_wav
    from meters_lv2_tpu.runtime import native

    if native.load() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(6)
    paths = []
    refs = []
    for i in range(7):
        x = (0.3 * rng.standard_normal((2, 1000 + 100 * i))).astype(np.float32)
        p = str(tmp_path / f"f{i}.wav")
        write_wav(p, x, 48000)
        paths.append(p)
        refs.append(x)
    out = native.wav_read_batch(paths, workers=4)
    assert len(out) == 7
    for (arr, rate), ref in zip(out, refs):
        assert rate == 48000
        np.testing.assert_allclose(arr, ref, atol=1e-7)
    with pytest.raises(IOError):
        native.wav_read_batch([paths[0], str(tmp_path / "missing.wav")])
