"""JAX meters vs per-sample float32 oracles (tolerance ±0.01 dB)."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle
from meters_lv2_tpu.models import cor, kmeter, needle, truepeak

FS = 48000
BLOCK = 1024
NBLK = 40
RTOL = 2e-4  # 0.01 dB ≈ 1.15e-3 relative; leave headroom


def _sig(seed=0, n=BLOCK * NBLK, kind="mix"):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    if kind == "mix":
        x = (
            0.5 * np.sin(2 * np.pi * 997 * t)
            + 0.2 * np.sin(2 * np.pi * 63 * t)
            + 0.1 * rng.standard_normal(n)
        )
        x *= np.minimum(1.0, t * 4)  # fade in
    elif kind == "burst":
        x = rng.standard_normal(n) * (np.sin(2 * np.pi * 0.7 * t) > 0)
    return x.astype(np.float32)


def _db(v):
    return 20 * np.log10(np.maximum(np.abs(v), 1e-12))


def assert_db_close(a, b, tol_db=0.01, msg=""):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.abs(_db(a) - _db(b))
    assert np.all(d <= tol_db), f"{msg}: max dB err {d.max()} a={a} b={b}"


@pytest.mark.parametrize("kind", ["mix", "burst"])
def test_vu(kind):
    x = _sig(1, kind=kind)
    m = needle.VUMeter(FS)
    st = m.init(())
    orc = oracle.VUOracle(FS)
    for i in range(NBLK):
        blk = x[i * BLOCK : (i + 1) * BLOCK]
        st = m.update(st, jnp.asarray(blk))
        orc.process(blk)
        if i % 4 == 3:
            got, st = m.read(st, ref_level_db=-22.0)
            # oracle read without rlgain; apply same gain
            want = orc.read() * 10 ** (0.05 * (-22 + 18))
            assert_db_close(float(got), want, 0.01, f"vu blk {i}")


@pytest.mark.parametrize("kind_meter", ["iec1", "iec2"])
def test_ppm(kind_meter):
    x = _sig(2)
    m = needle.DINMeter(FS) if kind_meter == "iec1" else needle.BBCMeter(FS)
    st = m.init(())
    orc = oracle.PPMOracle(FS, kind_meter)
    for i in range(NBLK):
        blk = x[i * BLOCK : (i + 1) * BLOCK]
        st = m.update(st, jnp.asarray(blk))
        orc.process(blk)
        if i % 3 == 2:
            got, st = m.read(st, ref_level_db=-18.0)
            want = orc.read() * 10 ** (0.05 * (-18 + 18))
            assert_db_close(float(got), want, 0.01, f"{kind_meter} blk {i}")


def test_kmeter():
    x = _sig(3, kind="burst")
    m = kmeter.KMeter(FS)
    st = m.init(())
    orc = oracle.KMeterOracle(FS)
    for i in range(NBLK):
        blk = x[i * BLOCK : (i + 1) * BLOCK]
        st = m.update(st, jnp.asarray(blk))
        orc.process(blk)
        got, st = m.read(st)
        rms, peak = orc.read()
        assert_db_close(float(got["rms"]), rms, 0.01, f"km rms blk {i}")
        assert_db_close(float(got["peak"]), peak, 0.01, f"km peak blk {i}")


def test_correlation():
    n = BLOCK * NBLK
    rng = np.random.default_rng(4)
    base = rng.standard_normal(n).astype(np.float32)
    l = base + 0.3 * rng.standard_normal(n).astype(np.float32)
    r = 0.8 * base + 0.3 * rng.standard_normal(n).astype(np.float32)
    m = cor.CorrelationMeter(FS)
    st = m.init(())
    orc = oracle.StcorrOracle(FS)
    for i in range(NBLK):
        lb = l[i * BLOCK : (i + 1) * BLOCK]
        rb = r[i * BLOCK : (i + 1) * BLOCK]
        st = m.update(st, jnp.stack([jnp.asarray(lb), jnp.asarray(rb)]))
        orc.process(lb, rb)
        got, st = m.read(st)
        want = orc.read()
        assert abs(float(got) - want) < 2e-3, f"cor blk {i}: {got} vs {want}"


def test_upsample4_matches_oracle():
    from meters_lv2_tpu.ops import resample

    x = _sig(5, n=512)
    up_ref = oracle.upsample4_oracle(x)
    hist = resample.upsample4_init(())
    up, _ = resample.upsample4(jnp.asarray(x), hist)
    up = np.asarray(up)
    assert np.max(np.abs(up - up_ref)) < 1e-5, np.max(np.abs(up - up_ref))


def test_truepeak_meter():
    x = _sig(6)
    m = truepeak.TruePeakMeter(FS)
    st = m.init(())
    # oracle: oversample whole stream, then run ballistics per block
    up_all = oracle.upsample4_oracle(x)
    orc = oracle.PPMOracle(FS, "iec2")  # reuse structure w/ TP coeffs:
    orc.w1 = np.float32(4000.0 / FS / 4)
    orc.w2 = np.float32(17200.0 / FS / 4)
    orc.w3 = np.float32(1.0 - 7.0 / FS / 4)
    orc.g = np.float32(1.0)
    peak_want = 0.0
    m_want = 0.0
    first = True
    for i in range(NBLK):
        blk = x[i * BLOCK : (i + 1) * BLOCK]
        st = m.update(st, jnp.asarray(blk))
        ub = up_all[i * BLOCK * 4 : (i + 1) * BLOCK * 4]
        orc.process(ub)
        mb = 0.502 * orc.m
        pb = np.max(np.abs(ub))
        if first:
            m_want, peak_want, first = mb, pb, False
        else:
            m_want = max(m_want, mb)
            peak_want = max(peak_want, pb)
        orc.res = False  # TP keeps accumulating internally differently
        if i % 5 == 4:
            got, st = m.read(st)
            assert_db_close(float(got["level"]), m_want, 0.02, f"tp level blk {i}")
            assert_db_close(float(got["peak"]), peak_want, 0.01, f"tp peak blk {i}")
            orc.res = True
            first = True


@pytest.mark.slow
def test_batched_matches_scalar():
    """vmap over a batch of streams == per-stream results (VU)."""
    import jax

    xs = np.stack([_sig(s) for s in range(6)])  # [6, T]
    m = needle.VUMeter(FS)
    st = m.init((6,))
    st = m.update(st, jnp.asarray(xs))
    got_b, _ = m.read(st)
    for s in range(6):
        st1 = m.init(())
        st1 = m.update(st1, jnp.asarray(xs[s]))
        got1, _ = m.read(st1)
        np.testing.assert_allclose(np.asarray(got_b)[s], float(got1), rtol=1e-6)


def test_general_upsampler_matches_zita_fixture():
    """2x/4x/8x hl=12 polyphase (goniometer config) vs the actual zita
    resampler output captured in tests/fixtures/resample_zita.npz."""
    import os

    from meters_lv2_tpu.ops import resample

    fixture = os.path.join(
        os.path.dirname(__file__), "fixtures", "resample_zita.npz"
    )
    data = np.load(fixture)
    x = jnp.asarray(data["x"])
    for factor in (2, 4, 8):
        taps = resample.upsample_taps(factor, 12)
        up, _ = resample.upsample(x, resample.upsample_init((2,), 12), taps)
        np.testing.assert_allclose(
            np.asarray(up), data[f"up{factor}"], atol=1e-6
        )


def test_kmeter_varied_block_sizes():
    """The peak fall multiplier depends on the block length
    (kmeterdsp.cc:65-69) — stream with mixed block sizes vs the oracle."""
    x = _sig(8, kind="burst")
    m = kmeter.KMeter(FS)
    st = m.init(())
    orc = oracle.KMeterOracle(FS)
    sizes = [512, 2048, 1024, 4096]
    i = 0
    k = 0
    while i + sizes[k % 4] <= len(x):
        n = sizes[k % 4]
        blk = x[i : i + n]
        st = m.update(st, jnp.asarray(blk))
        orc.process(blk)
        got, st = m.read(st)
        rms, peak = orc.read()
        assert_db_close(float(got["rms"]), rms, 0.01, f"km rms i={i}")
        assert_db_close(float(got["peak"]), peak, 0.01, f"km peak i={i}")
        i += n
        k += 1
