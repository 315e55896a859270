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
    from signals import make_signal

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

    # the native engine mirrors the reference's out-of-range Welford count
    # (sigdistlv2.c:316-318); 0.4σ noise exceeds the ±1.2 bin span at ~3σ,
    # so compare against the quirk-exact JAX mode
    eng = native.NativeEngine("sigdist", FS, 1)
    ms = sigdist.SigDistMeter(FS, reference_oor_count=True)
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

    # hot material (~9% of samples out of range): three-way quirk agreement
    hot = np.asarray(make_signal("hot", 2.0), np.float32)
    eng = native.NativeEngine("sigdist", FS, 1)
    ss = ms.init(())
    eng.process(hot[:1])
    ss = jax.jit(ms.update)(ss, jnp.asarray(hot[0]))
    nv = eng.read()
    o, _ = ms.read(ss)
    assert int(o["hist_max"]) == int(nv[1])
    assert int(o["integration_time"]) == hot.shape[1]
    assert int(np.asarray(ss.n)) == int(nv[4]) < hot.shape[1]
    np.testing.assert_allclose(float(o["hist_avg"]), nv[2], rtol=1e-3)
    np.testing.assert_allclose(float(o["hist_var"]), nv[3], rtol=1e-3)

    vals = np.array([0.0, 1.5, -0.25, np.nan, np.inf, 1e-42] * 50, np.float32)
    eng = native.NativeEngine("bitmeter", FS, 1)
    eng.process(vals[None])
    nv = eng.read()
    assert nv[0] == 50 and nv[2] == 50 and nv[3] == 50 and nv[4] == 50
    assert nv[5] == 0.25 and nv[6] == 1.5


@pytest.mark.skipif(not _have_native(), reason="no native toolchain")
@pytest.mark.parametrize("kind", ["dr14", "tpnrms"])
def test_native_dr14_matches_jax(kind):
    from meters_lv2_tpu.models.dr14 import DR14Meter, TPnRMSMeter

    rng = np.random.default_rng(11)
    T = FS * 10  # > 3 windows so nf > 2
    env = (0.15 + 0.25 * np.sin(2 * np.pi * np.arange(T) / FS / 2.5)) ** 2
    x = (env * rng.standard_normal((2, T))).astype(np.float32)
    eng = native.NativeEngine(kind, FS, 2)
    m = (DR14Meter if kind == "dr14" else TPnRMSMeter)(FS, nchan=2)
    st = m.init(())
    upd = jax.jit(m.update)
    for b in range(10):
        blk = x[:, b * FS : (b + 1) * FS]
        eng.process(blk)
        st = upd(st, jnp.asarray(blk))
    nv = eng.read()
    jv, _ = m.read(st)
    if kind == "tpnrms":
        got = np.stack(
            [np.asarray(jv[k]) for k in ("v_rms", "v_peak", "m_peak", "m_rms")],
            -1,
        ).ravel()
        np.testing.assert_allclose(got, nv, atol=2e-3)
    else:
        got = np.stack(
            [np.asarray(jv[k]) for k in ("v_rms", "v_peak", "m_peak", "m_rms", "dr")],
            -1,
        ).ravel()
        # m_rms/dr are 0.01 dB-histogram-quantized; f32-vs-f64 window sums
        # may flip one bin
        np.testing.assert_allclose(got, nv[:10], atol=0.03)
        np.testing.assert_allclose(float(jv["dr_total"]), nv[10], atol=0.03)
        assert float(jv["block_count"]) == nv[11]


@pytest.mark.skipif(not _have_native(), reason="no native toolchain")
@pytest.mark.parametrize("os_", [1, 4])
def test_native_goniometer_matches_jax(os_):
    from meters_lv2_tpu.models.goniometer import Goniometer

    rng = np.random.default_rng(13)
    x = (0.3 * rng.standard_normal((2, FS))).astype(np.float32)
    eng = native.NativeEngine("gonio", FS, os_)  # nchan arg = oversample
    m = Goniometer(FS, oversample=os_)
    st = m.init(())
    out, st = jax.jit(lambda s, v: m.process(s, v))(st, jnp.asarray(x))
    eng.process(x)
    nv = eng.read()  # gain, xmin, xmax, ymin, ymax, last_x, last_y
    ax, ay = np.asarray(out["x"]), np.asarray(out["y"])
    np.testing.assert_allclose(float(out["gain"]), nv[0], rtol=1e-4)
    np.testing.assert_allclose(
        [ax.min(), ax.max(), ay.min(), ay.max()], nv[1:5], rtol=2e-4, atol=1e-6
    )
    np.testing.assert_allclose([ax[-1], ay[-1]], nv[5:7], rtol=1e-3, atol=1e-6)


@pytest.mark.skipif(not _have_native(), reason="no native toolchain")
def test_native_phasewheel_matches_jax():
    from meters_lv2_tpu.models.phasewheel import PhaseWheel

    rng = np.random.default_rng(17)
    t = np.arange(FS) / FS
    base = np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 1870 * t)
    x = np.stack(
        [base + 0.02 * rng.standard_normal(FS),
         np.roll(base, 7) + 0.02 * rng.standard_normal(FS)]
    ).astype(np.float32)
    eng = native.NativeEngine("phasewheel", FS, 2)
    m = PhaseWheel(FS)
    st = m.init(())
    out, st = jax.jit(lambda s, v: m.process(s, v))(st, jnp.asarray(x))
    eng.process(x)
    nv = eng.read()
    np.testing.assert_allclose(float(out["peak"]), nv[0], rtol=1e-3)
    dphi = np.asarray(out["phase"])[-1]  # last analysis frame
    level = np.asarray(out["level"])[-1]
    n_dphi, n_level = nv[1:4097], nv[4097:]
    ok = (level > -99) & (n_level > -99)  # both above threshold
    assert np.mean((level > -99) == (n_level > -99)) > 0.95
    np.testing.assert_allclose(level[ok], n_level[ok], rtol=1e-4)
    np.testing.assert_allclose(dphi[ok], n_dphi[ok], atol=1e-3)


@pytest.mark.skipif(not _have_native(), reason="no native toolchain")
def test_native_stereoscope_matches_jax():
    from meters_lv2_tpu.models.phasewheel import Stereoscope

    rng = np.random.default_rng(19)
    t = np.arange(FS) / FS
    x = np.stack(
        [np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(FS),
         0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(FS)]
    ).astype(np.float32)
    eng = native.NativeEngine("stereoscope", FS, 2)
    m = Stereoscope(FS)
    st = m.init(())
    out, st = jax.jit(lambda s, v: m.process(s, v))(st, jnp.asarray(x))
    eng.process(x)
    nv = eng.read()
    lrp, level = np.asarray(out["lr"]), np.asarray(out["level"])
    n_lr, n_level = nv[:4096], nv[4096:]
    big = level > 1e-12  # compare where levels are resolvable in f32
    np.testing.assert_allclose(level[big], n_level[big], rtol=2e-3)
    np.testing.assert_allclose(lrp[big], n_lr[big], atol=2e-3)


@pytest.mark.skipif(not _have_native(), reason="no native toolchain")
def test_native_surround_matches_jax():
    from meters_lv2_tpu.models.surround import Surround5Meter

    rng = np.random.default_rng(23)
    C = 5
    x = (0.3 * rng.standard_normal((C, FS * 2))).astype(np.float32)
    eng = native.NativeEngine("surround", FS, C)
    m = Surround5Meter(FS)
    st = m.init(())
    upd = jax.jit(m.update)
    for b in range(2):
        blk = x[:, b * FS : (b + 1) * FS]
        eng.process(blk)
        st = upd(st, jnp.asarray(blk))
    nv = eng.read()
    jv, _ = m.read(st)
    got = np.stack(
        [np.asarray(jv["level"]), np.asarray(jv["peak"])], -1
    ).ravel()
    np.testing.assert_allclose(got, nv[: 2 * C], rtol=3e-4)
    np.testing.assert_allclose(
        np.asarray(jv["correlation"]), nv[2 * C :], atol=2e-3
    )


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


@pytest.mark.skipif(not _have_native(), reason="no native toolchain")
def test_native_boundary_validation():
    """The C boundary rejects rather than reading out of bounds:
    channel-count mismatches (the engine receives only nframes), the
    R128 gain-table limit (mono..5.0), and the 4-sample ballistics
    grain (silent drop would diverge from the JAX path)."""
    eng = native.NativeEngine("r128", FS, 2)
    with pytest.raises(ValueError):
        eng.process(np.zeros(1000, np.float32))  # mono into stereo engine
    with pytest.raises(ValueError):
        eng.process(np.zeros((3, 1000), np.float32))
    with pytest.raises(ValueError):
        native.NativeEngine("r128", FS, 6)  # gains table covers 5
    with pytest.raises(ValueError):
        native.NativeEngine("vu", FS, 0)
    vu = native.NativeEngine("vu", FS, 2)
    with pytest.raises(RuntimeError):
        vu.process(np.zeros((2, 1001), np.float32))  # n % 4 != 0
    vu.process(np.zeros((2, 1000), np.float32))  # aligned: fine
    r128 = native.NativeEngine("r128", FS, 2)
    r128.process(np.zeros((2, 1001), np.float32))  # sample-rate kinds: any n


@pytest.mark.skipif(not _have_native(), reason="no native toolchain")
def test_native_wav_rejects_malformed(tmp_path):
    """A WAV whose fmt chunk claims 0 bits/sample must error, not SIGFPE."""
    import struct

    p = str(tmp_path / "bad.wav")
    fmtc = struct.pack("<HHIIHH", 1, 2, 48000, 0, 0, 0)  # bits = 0
    data = b"\x00" * 64
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
            + b"data" + struct.pack("<I", len(data)) + data)
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(IOError):
        native.wav_read(p)


@pytest.mark.skipif(not _have_native(), reason="no native toolchain")
def test_native_stale_binary_rebuilds():
    """The .so is never committed and carries a source-hash stamp; a
    stamp that doesn't match the sources forces a rebuild on next load,
    so a stale binary can't silently diverge from engine.cc."""
    assert os.path.exists(native._STAMP_PATH)
    assert native._stamp() == native._src_hash()
    mtime0 = os.path.getmtime(native._LIB_PATH)
    with open(native._STAMP_PATH, "w") as f:
        f.write("tampered")
    native._lib = None  # drop the cached handle
    try:
        assert native.load() is not None
    finally:
        native._lib = None
    assert native._stamp() == native._src_hash()
    assert os.path.getmtime(native._LIB_PATH) >= mtime0
