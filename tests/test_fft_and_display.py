"""STFT engine, analysis meters, display deflection curves."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

FS = 48000


def test_stft_matches_numpy_reference():
    from meters_lv2_tpu.ops.fft import STFT, make_window

    W = 1024
    st = STFT(FS, window_size=W, fps=25.0)
    hop = st.hop
    rng = np.random.default_rng(0)
    x = (0.5 * rng.standard_normal(hop * 4)).astype(np.float32)

    power, phase, _ = st.update(st.init(()), jnp.asarray(x))
    power = np.asarray(power)
    phase = np.asarray(phase)

    win = make_window("hann", W)
    # frame f ends at sample (f+1)*hop; leading history is zeros
    xpad = np.concatenate([np.zeros(W, np.float32), x])
    for f in range(4):
        seg = xpad[(f + 1) * hop : (f + 1) * hop + W] * win
        X = np.fft.rfft(seg)
        pw = (X.real**2 + X.imag**2)[: W // 2]
        ph = np.arctan2(X.imag, X.real)[: W // 2]
        pw[0] = X.real[0] ** 2
        pw[-1] = 0.0
        ph[0] = 0.0
        ph[-1] = 0.0
        np.testing.assert_allclose(power[f], pw, rtol=2e-3, atol=1e-4)
        # compare phases where power is significant
        sig = pw > 1e-6
        dp = np.angle(np.exp(1j * (phase[f] - ph)))
        assert np.abs(dp[sig]).max() < 1e-2


def test_windows_normalised():
    from meters_lv2_tpu.ops.fft import WINDOW_TYPES, make_window

    for kind in WINDOW_TYPES:
        w = make_window(kind, 512)
        np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-12)


def test_goniometer_rotation_and_autogain():
    from meters_lv2_tpu.models.goniometer import Goniometer

    t = np.arange(FS) / FS
    l = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    lr = np.stack([l, l])  # identical channels → pure "mid": x ≈ 0
    g = Goniometer(FS, oversample=1)
    st = g.init(())
    out, st = jax.jit(g.process)(st, jnp.asarray(lr))
    x, y = np.asarray(out["x"]), np.asarray(out["y"])
    assert np.abs(x[FS // 2 :]).max() < 1e-4  # L-R ~ 0
    assert np.abs(y[FS // 2 :]).max() > 0.5  # L+R strong
    # autogain converges towards 2/(max*g_target)
    for _ in range(5):
        out, st = jax.jit(g.process)(st, jnp.asarray(lr))
    assert 0.5 < float(out["gain"]) < 3.0


def test_goniometer_oversampled_matches_width():
    from meters_lv2_tpu.models.goniometer import Goniometer

    lr = (0.1 * np.random.default_rng(0).standard_normal((2, 4800))).astype(
        np.float32
    )
    g = Goniometer(FS, oversample=4)
    out, _ = jax.jit(g.process)(g.init(()), jnp.asarray(lr))
    assert out["x"].shape == (4 * 4800,)


def test_phasewheel_detects_phase_shift():
    from meters_lv2_tpu.models.phasewheel import PhaseWheel

    pw = PhaseWheel(FS, bins=512, db_thresh_db=-80.0)
    hop = pw.stft.hop
    T = hop * 8
    t = np.arange(T) / FS
    f0 = 3000.0
    shift = np.pi / 3
    lr = np.stack(
        [np.sin(2 * np.pi * f0 * t), np.sin(2 * np.pi * f0 * t + shift)]
    ).astype(np.float32)
    out, _ = jax.jit(pw.process)(pw.init(()), jnp.asarray(lr))
    lvl = np.asarray(out["level"][-1])
    ph = np.asarray(out["phase"][-1])
    b = lvl.argmax()
    # measured inter-channel phase at the peak bin ≈ +pi/3
    assert abs(ph[b] - shift) < 0.05, (b, ph[b])


def test_stereoscope_position():
    from meters_lv2_tpu.models.phasewheel import Stereoscope

    sc = Stereoscope(FS, bins=512)
    hop = sc.stft.hop
    T = hop * 20
    t = np.arange(T) / FS
    # tone panned hard right
    lr = np.stack(
        [0.001 * np.sin(2 * np.pi * 2000 * t), 0.8 * np.sin(2 * np.pi * 2000 * t)]
    ).astype(np.float32)
    out, _ = jax.jit(sc.process)(sc.init(()), jnp.asarray(lr))
    lvl = np.asarray(out["level"])
    pos = np.asarray(out["lr"])
    b = lvl.argmax()
    assert pos[b] > 0.9, pos[b]  # hard right ≈ 1.0


def test_deflection_curves():
    from meters_lv2_tpu.utils import db

    # VU: 0 VU reference point — needle value v such that deflection ~ mid
    assert abs(float(db.meter_deflect(db.MT_VU, 0.0889)) - 0.5) < 0.01
    # IEC268 bar: -20 dB maps to 50/115
    np.testing.assert_allclose(
        float(db.iec268_deflect(-20.0)), 50.0 / 115.0, rtol=1e-6
    )
    assert float(db.iec268_deflect(-80.0)) == 0.0
    assert float(db.iec268_deflect(10.0)) == 1.0
    # K-meter: 0 dB at K-scale top region
    v = float(db.kmeter_deflect(-20.0 - 20.0, 20.0))  # -20 below 0K
    assert 0.0 < v < 0.5
    assert float(db.kmeter_deflect(0.0, 20.0)) == 1.0
    # correlation: ±1 → 0/1
    assert float(db.meter_deflect(db.MT_COR, -1.0)) == 0.0
    assert float(db.meter_deflect(db.MT_COR, 1.0)) == 1.0


def test_surround_pairs():
    from meters_lv2_tpu.models.surround import Surround5Meter

    rng = np.random.default_rng(5)
    base = rng.standard_normal(FS).astype(np.float32)
    x = np.stack(
        [base, base, rng.standard_normal(FS).astype(np.float32),
         0.5 * base, -base]
    )
    m = Surround5Meter(FS, pairs=((0, 1), (0, 2), (0, 3), (0, 4)))
    st = m.init(())
    st = jax.jit(m.update)(st, jnp.asarray(x))
    out, _ = m.read(st)
    c = np.asarray(out["correlation"])
    assert c[0] > 0.95  # identical
    assert abs(c[1]) < 0.2  # uncorrelated
    assert c[2] > 0.95  # scaled copy
    assert c[3] < -0.95  # inverted


def test_schema_registry():
    from meters_lv2_tpu.models import available, schema

    # every registered meter has a schema
    for name in available():
        s = schema.schema_for(name)
        assert s.outputs, name


def test_render_images():
    from meters_lv2_tpu.utils import db, render

    img = render.needle_image(0.0889, db.MT_VU)
    assert img.shape[2] == 4 and img[..., 3].min() == 255
    assert (img[..., 0] > 200).any()  # needle drawn
    bar = render.bargraph_image(-10.0, 20.0)
    assert (bar[..., 1] > 100).any()
    radar = render.radar_image(np.full(360, -23.0), 10)
    assert radar.shape == (200, 200, 4)
    # EBU histogram view: a -23 LUFS cluster lights bins near k=470
    hist = np.zeros(751, np.int32)
    hist[468:473] = 200
    h = render.ebu_histogram_image(hist)
    assert h.shape == (200, 200, 4) and (h[..., 0] > 0).any()
    assert (render.ebu_histogram_image(np.zeros(751, np.int32))[..., :3] == 0).all()
    h9 = render.ebu_histogram_image(hist, plus9=True)
    assert (h9[..., 1] > 0).any()


def test_analyze_impulse_transfer():
    """fa_analyze_dsp equivalent: measure the K-weighting transfer function
    and check the BS.1770 high-shelf (+4 dB at 10 kHz, ~0.6 dB at 1 kHz)."""
    from meters_lv2_tpu.ops import design, lti
    from meters_lv2_tpu.ops.fft import STFT

    sysk = lti.LTISystem(*design.k_weighting_state_space(FS))
    state = {"s": sysk.init(())}

    def run(block):
        y, state["s"] = sysk.apply(block, state["s"])
        return y

    st = STFT(FS, window_size=8192, fps=25.0)
    power, _ = st.analyze_impulse(run)
    power = np.asarray(power)
    freq = np.arange(st.data_size) * FS / 8192
    def level(f):
        b = int(round(f * 8192 / FS))
        return 10 * np.log10(power[b])
    ref1k = level(997)
    assert abs(ref1k - 0.65) < 0.4, ref1k        # shelf onset near 1 kHz
    assert abs(level(10000) - 4.0) < 0.6         # +4 dB high shelf
    assert abs(level(50) - (-3.6)) < 1.0         # RLB high-pass @50 Hz
    assert level(25) < -7.5                       # deeper rolloff below


def test_bitmeter_and_sigdist_render():
    from meters_lv2_tpu.models.bitmeter import BitMeter
    from meters_lv2_tpu.models.sigdist import SigDistMeter
    from meters_lv2_tpu.utils.render import bitmeter_image, sigdist_image

    rng = np.random.default_rng(4)
    x = jnp.asarray(
        np.clip(0.4 * rng.standard_normal(48000), -1, 1), jnp.float32)
    bm = BitMeter(48000)
    st = jax.jit(bm.update)(bm.init(()), x)
    out, _ = bm.read(st)
    img = bitmeter_image(np.asarray(out["hit"]), np.asarray(out["one"]))
    assert img.shape == (72, 120, 4)
    # audio strictly inside (-1,1): max bit position is exp 126 + implicit
    # bit = 149 = 2^-4 -> row k=4 (y=8) populated, 2^0 row (y=0) empty
    assert not (img[0, :, :3] != 51).any()
    assert (img[8, 20:100, :3] != 51).any()

    sd = SigDistMeter(48000)
    st = jax.jit(sd.update)(sd.init(()), x)
    out, _ = sd.read(st)
    img = sigdist_image(np.asarray(out["hist"]))
    assert img.shape == (120, 240, 4)
    # center column (zero bin) has the tallest bar region filled
    assert (img[:, 120, 1] > 100).sum() > 40


def test_spectrum_render_and_profiler():
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer
    from meters_lv2_tpu.utils.render import spectrum_image
    from meters_lv2_tpu.utils.profiler import time_op, meter_throughput

    t = np.arange(48000) / 48000
    x = (0.3 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    m = SpectrumAnalyzer(48000)
    st = jax.jit(m.update)(m.init(()), jnp.asarray(x))
    out, _ = m.read(st)
    img = spectrum_image(np.asarray(out["bands"]), np.asarray(out["peaks"]))
    assert img.shape == (120, 240, 4)
    # the 1 kHz band (index 16) bar is the tallest
    colheights = (img[:, :, 1] > 150).sum(0)
    band_px = np.argmax(colheights)
    assert 16 * 240 // 30 <= band_px < 17 * 240 // 30

    r = time_op(jax.jit(lambda s, xb: m.update(s, xb)), st, jnp.asarray(x),
                iters=3, warmup=1, best_of=1)
    assert r["ms_per_call"] > 0
    r2 = meter_throughput(m, (2,), 4800, 48000, iters=2)
    assert r2["x_realtime"] > 0


def test_scope_renders():
    from meters_lv2_tpu.models.goniometer import Goniometer
    from meters_lv2_tpu.models.phasewheel import PhaseWheel, Stereoscope
    from meters_lv2_tpu.utils.render import (
        goniometer_image, phasewheel_image, stereoscope_image,
    )

    fs = 48000
    t = np.arange(fs // 2) / fs
    l = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    xin = jnp.asarray(np.stack([l, l]))  # mono-correlated

    g = Goniometer(fs, oversample=1)
    out, _ = g.process(g.init(()), xin)
    img = goniometer_image(np.asarray(out["x"]), np.asarray(out["y"]),
                           gain=float(out["gain"]))
    assert img.shape == (200, 200, 4)
    # L==R: energy concentrates on the vertical (y) axis column
    col = img[:, 100, 1].astype(int).sum()
    row = img[100, :, 1].astype(int).sum()
    assert col > row

    pw = PhaseWheel(fs, bins=128)
    hop = pw.stft.hop
    o, _ = pw.process(pw.init(()), xin[:, :hop])
    img = phasewheel_image(np.asarray(o["phase"])[0], np.asarray(o["level"])[0],
                           pw.stft.freq_per_bin)
    assert img.shape == (200, 200, 4) and (img[..., 1] > 0).any()

    sc = Stereoscope(fs, bins=128)
    o, _ = sc.process(sc.init(()), xin[:, :hop])
    img = stereoscope_image(np.asarray(o["lr"]), np.asarray(o["level"]))
    assert img.shape == (200, 200, 4)
    # mono content sits at the center pan column
    on = np.nonzero(img[..., 1] > 100)
    assert on[1].size and (np.abs(on[1] - 100) <= 2).all()


@pytest.mark.slow
def test_api_doc_examples_execute():
    """The per-meter snippets in docs/API.md run verbatim."""
    import os
    import re

    path = os.path.join(os.path.dirname(__file__), "..", "docs", "API.md")
    blocks = re.findall(r"```python\n(.*?)```", open(path).read(), re.S)
    assert blocks
    exec(compile(blocks[-1], "API.md", "exec"), {})


def test_gen_docs_tool(tmp_path):
    """tools/gen_docs.py (the makedoc.sh analog) emits a page per schema."""
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "gen_docs",
        os.path.join(os.path.dirname(__file__), "..", "tools", "gen_docs.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    files = mod.generate(str(tmp_path))
    from meters_lv2_tpu.models.schema import SCHEMAS
    assert len(files) == len(SCHEMAS) + 1
    idx = (tmp_path / "index.html").read_text()
    for name in SCHEMAS:
        assert f'{name}.html' in idx
    assert "EBUr128" in idx


def test_stft_update_stereo_matches_update():
    """The packed-pair complex FFT path == two rffts (kept for backends
    with naive rfft lowering; measured slower on TPU v5e)."""
    from meters_lv2_tpu.ops.fft import STFT

    st = STFT(FS)
    rng = np.random.default_rng(5)
    x = jnp.asarray(0.3 * rng.standard_normal((3, 2, st.hop * 3)), jnp.float32)
    s0 = st.init((3, 2))
    p1, ph1, s1 = st.update(s0, x)
    p2, ph2, s2 = st.update_stereo(s0, x)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=1e-6)
    mask = np.asarray(p1) > 1e-8
    np.testing.assert_allclose(
        np.asarray(ph2)[mask], np.asarray(ph1)[mask], atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(s2.tail), np.asarray(s1.tail))


def test_gemm_rfft_matches_numpy():
    """ops.fft.GemmRFFT (the MXU-factored transform the TPU path uses)
    against numpy's rfft at several sizes."""
    from meters_lv2_tpu.ops.fft import GemmRFFT

    rng = np.random.RandomState(7)
    for n in (512, 2048, 8192):
        x = rng.randn(2, 3, n).astype(np.float32)
        re, im = jax.jit(GemmRFFT(n))(jnp.asarray(x))
        ref = np.fft.rfft(x.astype(np.float64), axis=-1)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(
            np.asarray(re), ref.real[..., : n // 2], atol=2e-6 * scale
        )
        np.testing.assert_allclose(
            np.asarray(im), ref.imag[..., : n // 2], atol=2e-6 * scale
        )


def test_stft_gemm_path_matches_fft_path():
    """STFT analysis through the forced-GEMM transform == the rfft path
    (power in relative terms, phase where power is non-negligible)."""
    import os

    from meters_lv2_tpu.ops import fft as fft_ops
    from signals import make_signal

    st = fft_ops.STFT(48000, 8192, 25.0, "hann")
    x = make_signal("mix", 1.0)[0][: st.hop * 20]
    s0 = st.init(())
    old = os.environ.get("METERS_TPU_STFT_GEMM")
    try:
        os.environ["METERS_TPU_STFT_GEMM"] = "0"
        p_ref, ph_ref, _ = jax.jit(st.update)(s0, jnp.asarray(x))
        st._gemm = None
        os.environ["METERS_TPU_STFT_GEMM"] = "1"
        p_g, ph_g, _ = jax.jit(st.update)(s0, jnp.asarray(x))
    finally:
        if old is None:
            del os.environ["METERS_TPU_STFT_GEMM"]
        else:
            os.environ["METERS_TPU_STFT_GEMM"] = old
    p_ref, p_g = np.asarray(p_ref), np.asarray(p_g)
    scale = p_ref.max()
    # both transforms are f32; near-zero bins differ at the f32 noise
    # floor of the frame energy
    np.testing.assert_allclose(p_g, p_ref, rtol=1e-3, atol=1e-8 * scale)
    sig = p_ref > 1e-7 * scale
    dph = np.abs(np.asarray(ph_g) - np.asarray(ph_ref))
    dph = np.minimum(dph, 2 * np.pi - dph)
    assert dph[sig].max() < 1e-3, dph[sig].max()
