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


def test_spectrum_runtime_speed_change_no_recompile():
    """Display speed rides in state (spectrumlv2.c:161-177 changes it via a
    control port at runtime): one compiled program serves any speed."""
    import dataclasses
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer

    m = SpectrumAnalyzer(FS, speed=1.0)
    t = np.arange(FS) / FS
    x = (0.3 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    x1, x2 = jnp.asarray(x[: FS // 4]), jnp.asarray(x[FS // 4 : FS // 2])

    @jax.jit
    def run(speed):
        st = m.init(())
        st = m.update(st, x1)
        st = m.set_speed(st, speed)
        st = m.update(st, x2)
        return m.read(st)[0]["bands"]

    fast = np.asarray(run(10.0))
    slow = np.asarray(run(0.1))
    assert run._cache_size() == 1  # traced speed: no recompilation
    assert fast[16] != slow[16]

    # traced-speed result == eager run with the same omega swap
    st = m.update(m.init(()), x1)
    st = dataclasses.replace(
        st, omega=jnp.float32(1.0 - np.exp(-2 * np.pi * 10.0 / FS))
    )
    st = m.update(st, x2)
    ref = np.asarray(m.read(st)[0]["bands"])
    # set_speed computes omega in f32 on device vs np.exp in f64: ~2e-4 dB
    np.testing.assert_allclose(fast, ref, atol=1e-3)


def test_radar_speed_runtime_change():
    """CTL_RADARTIME mid-stream: ring + interval counter carry over, new
    interval applies from the change on — in one compiled program."""
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter

    m = EbuR128Meter(FS, nchan=2, radar_seconds=36.0,
                     runtime_radar_speed=True)  # spd = 4800
    rng = np.random.default_rng(5)
    x = jnp.asarray(
        0.2 * rng.standard_normal((2, FS)).astype(np.float32))

    @jax.jit
    def run(seconds):
        st = m.init(())
        st = m.update(st, x)  # 48000 samples @ spd 4800 -> 9 events fired
        st = m.set_radar_speed(st, seconds)
        st = m.update(st, x)
        return st

    st_a = run(36.0)   # unchanged speed
    st_b = run(120.0)  # slower: spd = 16000
    assert run._cache_size() == 1  # traced seconds: no recompilation

    # unchanged speed == constructor-only meter over 2 s
    st_ref = m.init(())
    st_ref = jax.jit(m.update)(st_ref, jnp.concatenate([x, x], -1))
    np.testing.assert_allclose(
        np.asarray(st_a.radar_m), np.asarray(st_ref.radar_m), atol=1e-5)
    assert int(st_a.radar_pos) == int(st_ref.radar_pos)

    # slowed down: first 9 ring points intact, fewer new events after
    np.testing.assert_allclose(
        np.asarray(st_b.radar_m)[:9], np.asarray(st_ref.radar_m)[:9],
        atol=1e-5)
    assert int(st_b.radar_pos) < int(st_a.radar_pos)
    assert int(st_b.radar_spd) == 16000


def test_surround_pair_routing_runtime_change():
    """surc_a/surc_b routing is a per-call input (src/surmeter.c:119-128):
    rerouting mid-stream keeps correlator state and needs no recompile."""
    from meters_lv2_tpu.models.surround import SurroundMeter

    class Sur4(SurroundMeter):
        nchan = 4

    m = Sur4(FS)
    rng = np.random.default_rng(7)
    base = 0.3 * rng.standard_normal((FS // 2,)).astype(np.float32)
    # ch0 == ch1 (correlated +1), ch2 == -ch3 (correlated -1)
    x = jnp.asarray(np.stack([base, base, base, -base]))

    @jax.jit
    def run(pairs):
        st = m.init(())
        st = m.update(st, x, pairs=pairs)
        out, _ = m.read(st)
        return out["correlation"]

    c1 = np.asarray(run(jnp.array([[0, 1], [2, 3], [0, 2], [1, 3]])))
    c2 = np.asarray(run(jnp.array([[2, 3], [0, 1], [0, 3], [1, 2]])))
    assert run._cache_size() == 1  # traced routing: one compile
    assert c1[0] > 0.9 and c1[1] < -0.9
    assert c2[0] < -0.9 and c2[1] > 0.9


def test_stream_pipelined_matches_serial():
    """Double-buffered ingest (device_put prefetch) == plain stream()."""
    from meters_lv2_tpu.io.stream import chunk_array, stream, stream_pipelined
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter

    x = make_signal("mix", 4.0)
    m = EbuR128Meter(FS, nchan=2)
    s1 = stream(m, m.init(()), chunk_array(x, 9600))
    seen = []
    s2 = stream_pipelined(
        m, m.init(()), chunk_array(x, 9600), depth=3, read_every=10,
        on_read=lambda i, out: seen.append(float(out["loudness_M"])),
    )
    o1, _ = m.read(s1)
    o2, _ = m.read(s2)
    for k in ("loudness_M", "loudness_S", "integrated", "dbtp"):
        np.testing.assert_array_equal(o1[k], o2[k])
    assert bool(jnp.all(s1.hist_m == s2.hist_m))
    assert len(seen) == 2  # 20 chunks, read every 10


def test_chunk_array_never_pads_midstream():
    """A 44.1 kHz-style chunk (22050 % 4 == 2) must not inject zeros
    between real samples: chunk rounds down to the 4-grain and only the
    final piece is padded."""
    from meters_lv2_tpu.io.stream import chunk_array

    x = np.arange(1, 100001, dtype=np.float32)
    pieces = list(chunk_array(x, 22050))
    recon = np.concatenate(pieces)
    n = len(x)
    np.testing.assert_array_equal(recon[:n], x)  # real samples contiguous
    assert np.all(recon[n:] == 0) and len(recon) - n < 4  # only tail pad
    for p in pieces:
        assert len(p) % 4 == 0
    # pad=False: exact lengths
    recon2 = np.concatenate(list(chunk_array(x, 22050, pad=False)))
    np.testing.assert_array_equal(recon2, x)


def test_transport_autoreset_preserves_manual_measurement():
    """ebu_integrate guard (src/ebulv2.cc:63-73): AUTO_RESET fires only
    on an actual off->on integration transition — a manually started
    measurement survives the transport starting to roll."""
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.utils import transport

    m = EbuR128Meter(FS, nchan=2)
    x = jnp.asarray(make_signal("mix", 2.0))
    mode = transport.FOLLOW_START_STOP | transport.FOLLOW_AUTO_RESET
    st = m.init(())  # integration on by default (manual start analog)
    st = jax.jit(m.update)(st, x)
    n1 = int(np.asarray(st.n_lo))
    assert n1 > 0
    st = transport.follow(m, st, rolling=True, was_rolling=False, mode=mode)
    assert int(np.asarray(st.n_lo)) == n1  # NOT reset: already integrating
    # but a paused measurement IS reset on roll start
    st = m.integr_pause(st)
    st = transport.follow(m, st, rolling=True, was_rolling=False, mode=mode)
    assert int(np.asarray(st.n_lo)) == 0


def test_read_wav_decode_errors_propagate(tmp_path):
    """Native decode errors must not fall back to the python parser
    (which could silently return a partial decode)."""
    import pytest

    from meters_lv2_tpu.io.wav import read_wav
    from meters_lv2_tpu.runtime import native

    p = str(tmp_path / "corrupt.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF\x10\x00\x00\x00WAVEjunk")
    if native.load() is None:
        with pytest.raises(Exception):
            read_wav(p)
    else:
        with pytest.raises(IOError):
            read_wav(p)
