"""Fused Pallas surround core (ops/pallas_surround) == unfused XLA path.

Runs the kernel in interpreter mode on CPU; on real TPU the same
comparison is part of tools/tpu_parity_check.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meters_lv2_tpu.models.surround import Surround5Meter, Surround8Meter
from meters_lv2_tpu.ops import pallas_surround


@pytest.fixture
def _fused_interpret():
    old = os.environ.get("METERS_TPU_SURROUND_FUSED")
    os.environ["METERS_TPU_SURROUND_FUSED"] = "interpret"
    yield
    if old is None:
        del os.environ["METERS_TPU_SURROUND_FUSED"]
    else:
        os.environ["METERS_TPU_SURROUND_FUSED"] = old


def _read_all(m, st):
    out, st = m.read(st)
    return {k: np.asarray(v) for k, v in out.items()}, st


def test_fused_core_matches_xla_core():
    """Raw kernel outputs vs the unfused _xla_core pieces, odd stream
    count (pad-to-8 path), carried nonzero states."""
    fs = 48000
    m = Surround5Meter(fs)
    rng = np.random.default_rng(0)
    B, C, T = 5, 5, 1280
    x = jnp.asarray(0.3 * rng.standard_normal((B, C, T)), jnp.float32)
    kmz = jnp.asarray(0.01 * rng.random((B, C, 2)), jnp.float32)
    zl = jnp.asarray(0.05 * rng.standard_normal((B, C, 1)), jnp.float32)
    zp = jnp.asarray(0.01 * rng.random((B, m.npairs, 3)), jnp.float32)
    sel_a, sel_b = m._sel(None, jnp.float32)

    kmz_r, zl_r, zp_r, tmax_r = m._xla_core(x, kmz, zl, zp, sel_a, sel_b)

    kmz_f, zl_f, pk, pacc = pallas_surround.fused_core(
        x, kmz, zl, sel_a, sel_b, m.km.sys.op(32), m.cor.lp.op(128),
        m.cor.w1, m.cor.w2, interpret=True,
    )
    zp_f = zp * np.float32((1.0 - m.cor.w2) ** T) + pacc

    # kernel conv GEMM is 3-pass bf16 (== XLA Precision.HIGH, what the
    # unfused path uses); state/peak paths are exact f32 VPU
    np.testing.assert_allclose(kmz_f, kmz_r, rtol=2e-5, atol=1e-9)
    np.testing.assert_allclose(zl_f, zl_r, rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(pk, tmax_r, rtol=0, atol=0)
    np.testing.assert_allclose(zp_f, zp_r, rtol=2e-4, atol=1e-7)


@pytest.mark.slow
def test_fused_update_matches_unfused(_fused_interpret):
    """Two chained update() calls + read(), 8-channel with the default
    adjacent wrap-around routing."""
    fs = 48000
    rng = np.random.default_rng(1)
    m = Surround8Meter(fs)
    x = jnp.asarray(
        0.2 * rng.standard_normal((3, 8, 128 * 9)), jnp.float32
    )
    st = m.init((3,))

    os.environ["METERS_TPU_SURROUND_FUSED"] = "0"
    o_ref, _ = _read_all(m, m.update(m.update(st, x), 0.7 * x))
    os.environ["METERS_TPU_SURROUND_FUSED"] = "interpret"
    o, _ = _read_all(m, m.update(m.update(st, x), 0.7 * x))

    np.testing.assert_allclose(o["level"], o_ref["level"], rtol=2e-5)
    np.testing.assert_array_equal(o["peak"], o_ref["peak"])
    np.testing.assert_allclose(
        o["correlation"], o_ref["correlation"], atol=2e-4
    )


def test_fused_update_runtime_pairs(_fused_interpret):
    """Traced runtime routing reaches the kernel through SMEM."""
    fs = 48000
    rng = np.random.default_rng(2)
    m = Surround5Meter(fs)
    x = jnp.asarray(
        0.2 * rng.standard_normal((2, 5, 128 * 6)), jnp.float32
    )
    st = m.init((2,))
    pairs = jnp.asarray([[0, 0], [1, 1], [0, 1], [2, 3]], jnp.float32)

    os.environ["METERS_TPU_SURROUND_FUSED"] = "0"
    o_ref, _ = _read_all(m, m.update(st, x, pairs=pairs))
    os.environ["METERS_TPU_SURROUND_FUSED"] = "interpret"
    o, _ = _read_all(
        m, jax.jit(lambda s, v, p: m.update(s, v, pairs=p))(st, x, pairs)
    )

    np.testing.assert_allclose(o["level"], o_ref["level"], rtol=2e-5)
    np.testing.assert_allclose(
        o["correlation"], o_ref["correlation"], atol=2e-4
    )
    # the 0:0 self-pair must read ~+1 either way
    assert o["correlation"][0, 0] > 0.99


@pytest.mark.slow
def test_fused_update_unaligned_tail(_fused_interpret):
    """44.1 kHz 1 s blocks: kernel bulk + XLA tail with chained state."""
    fs = 44100
    rng = np.random.default_rng(3)
    m = Surround5Meter(fs)
    x = jnp.asarray(
        0.2 * rng.standard_normal((2, 5, 44100)), jnp.float32
    )
    st = m.init((2,))
    os.environ["METERS_TPU_SURROUND_FUSED"] = "0"
    o_ref, _ = _read_all(m, m.update(m.update(st, x), x))
    os.environ["METERS_TPU_SURROUND_FUSED"] = "interpret"
    o, _ = _read_all(m, m.update(m.update(st, x), x))
    np.testing.assert_allclose(o["level"], o_ref["level"], rtol=2e-5)
    np.testing.assert_array_equal(o["peak"], o_ref["peak"])
    np.testing.assert_allclose(
        o["correlation"], o_ref["correlation"], atol=2e-4
    )


def test_fused_update_scalar_batch_and_nan(_fused_interpret):
    """No leading batch dims; a NaN burst flushes states but must not
    erase the block peak (kmeterdsp.cc:124, stcorrdsp.cc:65-76)."""
    fs = 48000
    rng = np.random.default_rng(4)
    m = Surround5Meter(fs)
    xn = 0.2 * rng.standard_normal((5, 128 * 4)).astype(np.float32)
    xn[2, 100] = np.nan
    x = jnp.asarray(xn)
    st = m.init(())
    os.environ["METERS_TPU_SURROUND_FUSED"] = "0"
    s_ref = m.update(st, x)
    o_ref, _ = _read_all(m, s_ref)
    os.environ["METERS_TPU_SURROUND_FUSED"] = "interpret"
    s = m.update(st, x)
    o, _ = _read_all(m, s)
    assert np.all(np.isfinite(np.asarray(s.zl)))
    np.testing.assert_array_equal(o["peak"], o_ref["peak"])
    assert o["peak"][2] > 0  # NaN did not erase channel 2's peak
    np.testing.assert_allclose(o["level"], o_ref["level"], rtol=2e-5)


def test_fused_gate_small_blocks():
    m = Surround5Meter(48000)
    assert not m._use_fused(100)  # < one kernel block
