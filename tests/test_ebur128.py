"""EBU R128 pipeline vs the per-sample float32 oracle (±0.01 dB)."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle
from meters_lv2_tpu.models.ebur128 import EbuR128Meter

FS = 48000


def _stereo(seconds, seed=0):
    n = FS * seconds
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    # amplitude-modulated tones + noise — enough loudness dynamics for LRA
    env = 0.15 + 0.5 * (np.sin(2 * np.pi * 0.25 * t) > 0.2) + 0.2 * np.sin(
        2 * np.pi * 0.05 * t
    )
    l = env * (0.4 * np.sin(2 * np.pi * 997 * t) + 0.05 * rng.standard_normal(n))
    r = env * (0.3 * np.sin(2 * np.pi * 1499 * t) + 0.05 * rng.standard_normal(n))
    return np.stack([l, r]).astype(np.float32)


def test_r128_stereo_matches_oracle():
    import jax

    secs = 12
    x = _stereo(secs, 1)[:, : 562 * 1024]  # unaligned length
    orc = oracle.EbuR128Oracle(2, FS)
    orc.process(x)

    m = EbuR128Meter(FS, nchan=2)
    st = m.init(())
    # stream in 1024-sample blocks (not divisible by the 2400-sample
    # fragment) to exercise the partial-fragment carry
    upd = jax.jit(m.update)
    T = x.shape[1]
    for i in range(0, T, 1024):
        st = upd(st, jnp.asarray(x[:, i : i + 1024]))
    out, _ = jax.jit(m.read)(st)

    assert abs(float(out["loudness_M"]) - orc.loudness_M) < 0.01, (
        float(out["loudness_M"]),
        orc.loudness_M,
    )
    assert abs(float(out["loudness_S"]) - orc.loudness_S) < 0.01
    assert abs(float(out["max_M"]) - orc.maxloudn_M) < 0.01
    assert abs(float(out["max_S"]) - orc.maxloudn_S) < 0.01
    # histograms must match bin-for-bin for gating parity
    np.testing.assert_array_equal(np.asarray(st.hist_m), orc.hist_M)
    np.testing.assert_array_equal(np.asarray(st.hist_s), orc.hist_S)
    # oracle integrated/range recompute at read-time (same cadence: 12 s is
    # a multiple of 500 ms so the reference's last recompute sees all points)
    assert abs(float(out["integrated"]) - orc.calc_integ()) < 0.01
    v0, v1 = orc.calc_range()
    assert abs(float(out["range_min"]) - v0) < 1e-6
    assert abs(float(out["range_max"]) - v1) < 1e-6


def test_r128_mono_vs_sine_theory():
    """Mono -23 dBFS 997 Hz sine: M ≈ S ≈ I ≈ −23 LUFS + K-weighting@997Hz."""
    secs = 6
    n = FS * secs
    t = np.arange(n) / FS
    x = (10 ** (-23 / 20) * np.sin(2 * np.pi * 997 * t)).astype(np.float32)[None]
    import jax

    m = EbuR128Meter(FS, nchan=1)
    st = m.init(())
    upd = jax.jit(m.update)
    for i in range(0, x.shape[1], FS):
        st = upd(st, jnp.asarray(x[:, i : i + FS]))
    out, _ = jax.jit(m.read)(st)
    # BS.1770 calibration: a 997 Hz mono sine at -23 dBFS measures -23.0
    # LUFS (mono counted twice doubles power; sine halves it; the -0.6976
    # offset cancels the K-weighting gain at ~1 kHz).
    got = float(out["loudness_S"])
    assert abs(got - (-23.0)) < 0.05, got
    # integrated includes the early-measurement M points whose 400 ms
    # windows still contain pre-start zeros (the reference's 64-slot ring
    # starts zeroed, ebu_r128_proc.cc:165) — ~0.1 dB below steady state on
    # a 6 s signal, exactly as the C reference measures (see the
    # ebur128_aligned golden fixtures for exact-I parity).
    assert abs(float(out["integrated"]) - (-23.11)) < 0.05
    # true peak of the sine
    assert abs(20 * np.log10(float(out["dbtp"])) - (-23.0)) < 0.01


def test_r128_batched():
    x = _stereo(4, 2)
    xs = np.stack([x, 0.5 * x, 0.25 * x])  # [3, 2, T]
    import jax

    m = EbuR128Meter(FS, nchan=2)
    st = m.init((3,))
    st = jax.jit(m.update)(st, jnp.asarray(xs))
    out, _ = jax.jit(m.read)(st)
    lm = np.asarray(out["loudness_S"])
    # halving amplitude = -6.02 dB loudness
    np.testing.assert_allclose(lm[0] - lm[1], 6.0206, atol=0.01)
    np.testing.assert_allclose(lm[1] - lm[2], 6.0206, atol=0.01)
    # and matches unbatched
    st1 = m.init(())
    st1 = jax.jit(m.update)(st1, jnp.asarray(x))
    o1, _ = jax.jit(m.read)(st1)
    np.testing.assert_allclose(lm[0], float(o1["loudness_S"]), rtol=1e-6)


def test_r128_441khz():
    """Non-48k rates: fragm = fs//20 (ebu_r128_proc.cc:166)."""
    import jax

    fs = 44100
    secs = 6
    n = fs * secs
    t = np.arange(n) / fs
    x = (10 ** (-23 / 20) * np.sin(2 * np.pi * 997 * t)).astype(np.float32)[None]
    m = EbuR128Meter(fs, nchan=1)
    assert m.fragm == 2205
    st = m.init(())
    st = jax.jit(m.update)(st, jnp.asarray(x))
    out, _ = jax.jit(m.read)(st)
    assert abs(float(out["loudness_S"]) - (-23.0)) < 0.05
    assert abs(20 * np.log10(float(out["dbtp"])) - (-23.0)) < 0.02

    orc = oracle.EbuR128Oracle(1, fs)
    orc.process(np.asarray(x))
    assert abs(float(out["loudness_M"]) - orc.loudness_M) < 0.01
    assert abs(float(out["loudness_S"]) - orc.loudness_S) < 0.01


def test_radar_ring_wrap_single_block_matches_streaming():
    """A single update spanning > 360 radar intervals must leave the
    same ring as streaming the same audio in chunks (the wrapped ring is
    last-wins, not max-combined), and per-fragment radar maxima are
    block-size invariant."""
    import jax

    m = EbuR128Meter(FS, nchan=1, radar_seconds=0.1)  # spd clamps to 4096
    secs = 35  # 35 s / 4096-sample interval = 410 events > 360 positions
    x = _stereo(secs, seed=3)[:1]
    st1 = m.init(())
    st1 = jax.jit(m.update)(st1, jnp.asarray(x))
    st2 = m.init(())
    upd = jax.jit(m.update)
    for i in range(secs):
        st2 = upd(st2, jnp.asarray(x[:, i * FS : (i + 1) * FS]))
    assert int(np.asarray(st1.radar_pos)) == int(np.asarray(st2.radar_pos))
    np.testing.assert_allclose(
        np.asarray(st1.radar_m), np.asarray(st2.radar_m), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st1.radar_s), np.asarray(st2.radar_s), atol=1e-5
    )
    # every position was (over)written during the wrap
    assert np.isfinite(np.asarray(st1.radar_m)).all()


def test_radar_interval_floor_at_96k():
    """The radar interval clamps to >= one fragment (fs/20): at 96 kHz a
    sub-18 s radar_seconds would otherwise fire more than one event per
    loudness sample point and silently drop ring writes."""
    import jax

    m = EbuR128Meter(96000, nchan=1, radar_seconds=15.0)
    assert m.radar_spd >= m.fragm
    rng = np.random.default_rng(4)
    T = 2 * 96000
    x = (0.2 * rng.standard_normal((1, T))).astype(np.float32)
    st = jax.jit(m.update)(m.init(()), jnp.asarray(x))
    n_written = int(np.isfinite(np.asarray(st.radar_m)).sum())
    # every COMPLETED 4800-sample interval got its ring write
    assert n_written == (T - 1) // m.radar_spd
