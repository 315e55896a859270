"""Fused Pallas R128 core (ops/pallas_r128) == unfused XLA path.

Runs the kernel in interpreter mode on CPU; on real TPU the same
comparison is part of tools/tpu_parity_check.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meters_lv2_tpu.models.ebur128 import EbuR128Meter
from meters_lv2_tpu.ops import design, lti, pallas_r128, resample


def test_fused_core_matches_ops():
    sys = lti.LTISystem(*design.k_weighting_state_space(48000))
    rng = np.random.default_rng(0)
    B, C, T = 5, 2, 768  # odd stream count exercises the pad-to-8 path
    gains = (1.0, 1.41)
    x = jnp.asarray(0.3 * rng.standard_normal((B, C, T)), jnp.float32)
    z0 = jnp.asarray(0.01 * rng.standard_normal((B, C, 4)), jnp.float32)
    hist = jnp.asarray(0.1 * rng.standard_normal((B, C, 47)), jnp.float32)

    y_ref, z_ref = sys.apply(x, z0)
    g = jnp.asarray(gains)
    p_ref = jnp.sum(g[:, None] * y_ref * y_ref, axis=-2)
    tpm_c, hist_ref = resample.upsample4_absmax(x, hist)
    tpm_ref = jnp.max(tpm_c, axis=-1)

    p, z, h, tpm = pallas_r128.fused_core(
        x, z0, hist, gains, sys.op(128), interpret=True
    )
    # kernel GEMMs are 3-pass bf16 (== XLA Precision.HIGH, the TPU
    # default); the CPU reference here is full f32 — tolerances reflect
    # the HIGH error floor (~1e-5 relative), far inside the 0.01 dB budget
    np.testing.assert_allclose(p, p_ref, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(z, z_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(h, hist_ref)
    np.testing.assert_allclose(tpm, tpm_ref, rtol=1e-4)


def test_fused_core_mono():
    sys = lti.LTISystem(*design.k_weighting_state_space(48000))
    rng = np.random.default_rng(3)
    B, T = 2, 256
    x = jnp.asarray(0.3 * rng.standard_normal((B, 1, T)), jnp.float32)
    z0 = jnp.zeros((B, 1, 4), jnp.float32)
    hist = jnp.zeros((B, 1, 47), jnp.float32)

    y_ref, _ = sys.apply(x, z0)
    p_ref = 2.0 * jnp.sum(y_ref * y_ref, axis=-2)
    p, _, _, _ = pallas_r128.fused_core(
        x, z0, hist, (2.0,), sys.op(128), interpret=True
    )
    np.testing.assert_allclose(p, p_ref, rtol=2e-4, atol=1e-5)


@pytest.fixture
def _fused_interpret():
    old = os.environ.get("METERS_TPU_R128_FUSED")
    os.environ["METERS_TPU_R128_FUSED"] = "interpret"
    yield
    if old is None:
        del os.environ["METERS_TPU_R128_FUSED"]
    else:
        os.environ["METERS_TPU_R128_FUSED"] = old


@pytest.mark.slow
def test_fused_update_matches_unfused(_fused_interpret):
    fs = 48000
    rng = np.random.default_rng(1)
    # T % 128 == 0 but not fragment-aligned: partial-fragment carry active
    x = jnp.asarray(
        0.2 * rng.standard_normal((3, 2, 128 * 41)), jnp.float32
    )
    m = EbuR128Meter(fs, nchan=2)
    st = m.init((3,))

    os.environ["METERS_TPU_R128_FUSED"] = "0"
    s_ref = m.update(m.update(st, x), x)
    o_ref, _ = m.read(s_ref)

    os.environ["METERS_TPU_R128_FUSED"] = "interpret"
    s = m.update(m.update(st, x), x)
    o, _ = m.read(s)

    # HIGH-precision GEMMs: loudness within a fraction of the 0.01 dB
    # budget; histograms may differ by at most edge-flip counts (none for
    # this fixed seed)
    assert int(jnp.sum(jnp.abs(s.hist_m - s_ref.hist_m))) == 0
    assert int(jnp.sum(jnp.abs(s.hist_s - s_ref.hist_s))) == 0
    for k in ("loudness_M", "loudness_S", "max_M", "max_S", "integrated",
              "lra"):
        np.testing.assert_allclose(o[k], o_ref[k], atol=2e-3, err_msg=k)
    np.testing.assert_allclose(o["dbtp"], o_ref["dbtp"], rtol=1e-4)


def test_fused_update_flat_layout_bitexact(_fused_interpret):
    """flat=True ([..., C*T] channel-major — the retile-free ingest
    layout) produces bit-identical state to the 3D layout."""
    fs = 48000
    rng = np.random.default_rng(9)
    x3 = jnp.asarray(
        0.2 * rng.standard_normal((3, 2, 128 * 40)), jnp.float32
    )
    xf = x3.reshape(3, -1)
    m = EbuR128Meter(fs, nchan=2)
    st = m.init((3,))
    s3 = jax.jit(m.update)(st, x3)
    sf = jax.jit(lambda s, v: m.update(s, v, flat=True))(st, xf)
    for a, b in zip(jax.tree_util.tree_leaves(s3), jax.tree_util.tree_leaves(sf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # non-128-aligned T falls back to the 3D path, still exact
    x3b = x3[..., : 128 * 40 - 36]
    s3b = jax.jit(m.update)(st, x3b)
    sfb = jax.jit(lambda s, v: m.update(s, v, flat=True))(
        st, x3b.reshape(3, -1)
    )
    for a, b in zip(jax.tree_util.tree_leaves(s3b), jax.tree_util.tree_leaves(sfb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_update_scalar_batch(_fused_interpret):
    """No leading batch dims: x [C, T]."""
    fs = 48000
    rng = np.random.default_rng(4)
    x = jnp.asarray(0.2 * rng.standard_normal((2, 128 * 20)), jnp.float32)
    m = EbuR128Meter(fs, nchan=2)
    st = m.init(())

    os.environ["METERS_TPU_R128_FUSED"] = "0"
    o_ref, _ = m.read(m.update(st, x))
    os.environ["METERS_TPU_R128_FUSED"] = "interpret"
    o, _ = m.read(m.update(st, x))
    np.testing.assert_allclose(
        o["loudness_M"], o_ref["loudness_M"], atol=2e-3
    )
    np.testing.assert_allclose(o["dbtp"], o_ref["dbtp"], rtol=1e-4)


def test_fused_gate_small_blocks():
    m = EbuR128Meter(48000, nchan=2)
    assert not m._use_fused(100)  # < one kernel block


@pytest.mark.slow
def test_fused_update_unaligned_tail(_fused_interpret):
    """T = 128k + r: kernel bulk + XLA tail with chained state equals
    the pure XLA path (e.g. 1 s chunks at 44.1 kHz)."""
    fs = 44100
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        0.2 * rng.standard_normal((2, 2, 44100)), jnp.float32
    )
    m = EbuR128Meter(fs, nchan=2)
    st = m.init((2,))
    os.environ["METERS_TPU_R128_FUSED"] = "0"
    s_ref = m.update(m.update(st, x), x)
    o_ref, _ = m.read(s_ref)
    os.environ["METERS_TPU_R128_FUSED"] = "interpret"
    s = m.update(m.update(st, x), x)
    o, _ = m.read(s)
    assert int(jnp.sum(jnp.abs(s.hist_m - s_ref.hist_m))) == 0
    np.testing.assert_allclose(
        o["loudness_M"], o_ref["loudness_M"], atol=2e-3
    )
    np.testing.assert_allclose(o["dbtp"], o_ref["dbtp"], rtol=1e-4)


def test_fused_core_5channel():
    """5.0 surround: per-channel gains {1,1,1,1.41,1.41} through the
    dynamic channel-grid path."""
    from meters_lv2_tpu.ops.design import R128_CHAN_GAIN

    sys = lti.LTISystem(*design.k_weighting_state_space(48000))
    rng = np.random.default_rng(6)
    B, C, T = 2, 5, 384
    gains = tuple(float(g) for g in R128_CHAN_GAIN[:C])
    x = jnp.asarray(0.3 * rng.standard_normal((B, C, T)), jnp.float32)
    z0 = jnp.asarray(0.01 * rng.standard_normal((B, C, 4)), jnp.float32)
    hist = jnp.asarray(0.1 * rng.standard_normal((B, C, 47)), jnp.float32)

    y_ref, z_ref = sys.apply(x, z0)
    g = jnp.asarray(gains)
    p_ref = jnp.sum(g[:, None] * y_ref * y_ref, axis=-2)
    tpm_c, hist_ref = resample.upsample4_absmax(x, hist)

    p, z, h, tpm = pallas_r128.fused_core(
        x, z0, hist, gains, sys.op(128), interpret=True
    )
    np.testing.assert_allclose(p, p_ref, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(z, z_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(h, hist_ref)
    np.testing.assert_allclose(tpm, jnp.max(tpm_c, -1), rtol=1e-4)


@pytest.mark.slow
def test_fused_update_with_cadence_and_radar_speed(_fused_interpret):
    """The fused core composes with the runtime-control features
    (track_cadence snapshots, runtime radar speed) — they consume the
    kernel's power output downstream."""
    fs = 48000
    rng = np.random.default_rng(8)
    x = jnp.asarray(
        0.2 * rng.standard_normal((2, 2, 128 * 60)), jnp.float32
    )
    m = EbuR128Meter(
        fs, nchan=2, track_cadence=True, runtime_radar_speed=True
    )
    st0 = m.init((2,))

    os.environ["METERS_TPU_R128_FUSED"] = "0"
    s_ref = m.update(m.update(st0, x), x)
    os.environ["METERS_TPU_R128_FUSED"] = "interpret"
    s = m.update(m.update(st0, x), x)

    assert int(jnp.sum(jnp.abs(s.hist_m_snap - s_ref.hist_m_snap))) == 0
    assert bool(jnp.all(s.count_m_snap == s_ref.count_m_snap))
    o_ref, _ = m.read(s_ref, cadence_500ms=True)
    o, _ = m.read(s, cadence_500ms=True)
    np.testing.assert_allclose(
        o["integrated"], o_ref["integrated"], atol=2e-3
    )
    # runtime radar-speed change still a pure state update under fused
    s2 = m.set_radar_speed(s, 60.0)
    assert bool(jnp.all(s2.radar_spd == int(round(60.0 * fs / 360))))


def test_fused_core_seg_mode():
    """SEG MODE: in-kernel fragment sums == shifted_segments of the
    full-rate power (up to f32 reduce order), for nontrivial per-stream
    offsets crossing fragment boundaries mid-block."""
    from meters_lv2_tpu.ops import segment

    sys = lti.LTISystem(*design.k_weighting_state_space(48000))
    rng = np.random.default_rng(4)
    B, C, T = 5, 2, 2560
    fragm = 2400  # 48 kHz fragment; boundaries land mid-128-block
    n_slots = T // fragm + 2
    gains = (1.0, 1.41)
    x = jnp.asarray(0.3 * rng.standard_normal((B, C, T)), jnp.float32)
    z0 = jnp.asarray(0.01 * rng.standard_normal((B, C, 4)), jnp.float32)
    hist = jnp.asarray(0.1 * rng.standard_normal((B, C, 47)), jnp.float32)
    off = jnp.asarray(rng.integers(0, fragm, B), jnp.int32)

    p, z, h, tpm = pallas_r128.fused_core(
        x, z0, hist, gains, sys.op(128), interpret=True
    )
    seg_ref = segment.shifted_segments(p, off, fragm, n_slots, "sum")

    seg, z2, h2, tpm2 = pallas_r128.fused_core(
        x, z0, hist, gains, sys.op(128), interpret=True,
        off=off, fragm=fragm, n_slots=n_slots,
    )
    assert seg.shape == (B, n_slots)
    np.testing.assert_allclose(seg, seg_ref, rtol=2e-6, atol=1e-9)
    np.testing.assert_allclose(z, z2, rtol=0, atol=0)
    np.testing.assert_array_equal(h, h2)
    np.testing.assert_array_equal(tpm, tpm2)
