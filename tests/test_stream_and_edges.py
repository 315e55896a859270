"""Streaming ingest utility + meter edge cases."""

import numpy as np

import jax
import jax.numpy as jnp

from signals import make_signal

FS = 48000


def test_stream_wav_end_to_end(tmp_path):
    from meters_lv2_tpu.io import write_wav
    from meters_lv2_tpu.io.stream import stream_wav
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter

    x = make_signal("mix", 6.0)
    p = str(tmp_path / "s.wav")
    write_wav(p, x, FS)
    m = EbuR128Meter(FS, nchan=2)
    out, _ = stream_wav(m, p, chunk_seconds=1.3)  # odd chunking
    # reference: single-shot
    st = m.init(())
    st = jax.jit(m.update)(st, jnp.asarray(x))
    ref, _ = m.read(st)
    assert abs(float(out["loudness_S"]) - float(ref["loudness_S"])) < 0.01
    assert abs(float(out["integrated"]) - float(ref["integrated"])) < 0.01
    np.testing.assert_allclose(float(out["dbtp"]), float(ref["dbtp"]), rtol=1e-5)


def test_stream_readout_cadence(tmp_path):
    from meters_lv2_tpu.io.stream import chunk_array, stream
    from meters_lv2_tpu.models.kmeter import KMeter

    x = make_signal("bursts", 3.0)[0]
    m = KMeter(FS)
    seen = []
    stream(
        m, m.init(()), chunk_array(x, 12000), read_every=2,
        on_read=lambda i, out: seen.append(float(out["rms"])),
    )
    assert len(seen) == 6  # 12 chunks, read every 2
    assert max(seen) > 0


def test_tiny_and_odd_blocks():
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter

    m = EbuR128Meter(FS, nchan=2)
    st = m.init(())
    rng = np.random.default_rng(0)
    upd = jax.jit(m.update)
    # tiny 4-sample blocks and odd sizes interleaved
    for n in (4, 4, 100, 8, 2400, 52, 4800):
        st = upd(st, jnp.asarray(0.1 * rng.standard_normal((2, n)), jnp.float32))
    assert (
        int(st.n_lo) + (int(st.n_hi) << 30)
        == 4 + 4 + 100 + 8 + 2400 + 52 + 4800
    )


def test_integr_pause_resume():
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter

    m = EbuR128Meter(FS, nchan=2)
    x = make_signal("mix", 3.0)
    st = m.init(())
    st = m.integr_pause(st)
    st = jax.jit(m.update)(st, jnp.asarray(x))
    assert int(st.count_m) == 0  # paused: no gating points
    lm_paused = float(st.loud_m)
    assert lm_paused > -200  # loudness still measured (ebu_r128_proc:219-228)
    st = m.integr_start(st)
    st = jax.jit(m.update)(st, jnp.asarray(x))
    assert int(st.count_m) > 0


def test_spectrum_set_speed():
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer

    t = np.arange(FS) / FS
    x = (0.3 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    # speed is a rate (omega = 1 - e^(-2*pi*speed/fs)): larger = faster
    fast = SpectrumAnalyzer(FS, speed=10.0)
    slow = SpectrumAnalyzer(FS, speed=0.1)
    of, _ = fast.read(fast.update(fast.init(()), jnp.asarray(x[: FS // 8])))
    os_, _ = slow.read(slow.update(slow.init(()), jnp.asarray(x[: FS // 8])))
    # after 125 ms the fast display has converged much further
    assert float(of["bands"][16]) > float(os_["bands"][16]) + 3.0
