"""Fused oversample+ballistics true-peak kernel (ops/pallas_truepeak)
vs the unfused XLA path (ops/resample + ops/ballistics).

Runs the kernel in interpret mode on CPU — same dataflow and split
precision as the compiled TPU kernel.  On-chip parity comes from
tools/tpu_parity_check.py's truepeak family; the perf motivation is the
round-5 roofline row (the materialized 4x stream's HBM round-trip was
the binder of dBTP/DR-14/goniometer).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from signals import make_signal

FS = 48000


def _mode(mode):
    class _Ctx:
        def __enter__(self):
            self.old = os.environ.get("METERS_TPU_TP_FUSED")
            os.environ["METERS_TPU_TP_FUSED"] = mode

        def __exit__(self, *a):
            if self.old is None:
                del os.environ["METERS_TPU_TP_FUSED"]
            else:
                os.environ["METERS_TPU_TP_FUSED"] = self.old

    return _Ctx()


def _run(m, x, mode, chunk):
    from meters_lv2_tpu.models.truepeak import TruePeakMeter  # noqa: F401

    with _mode(mode):
        st = m.init(x.shape[:-1])
        upd = jax.jit(m.update)
        outs = []
        for i in range(x.shape[-1] // chunk):
            st = upd(st, jnp.asarray(x[..., i * chunk : (i + 1) * chunk]))
            o, st = m.read(st)
            outs.append(
                (np.asarray(o["level"]).copy(), np.asarray(o["peak"]).copy())
            )
    return outs, st


def test_fused_matches_unfused_streaming():
    """Multi-chunk stream with carried ballistics + resampler history:
    the kernel's 3-pass bf16 frame GEMM tracks the XLA HIGH conv."""
    from meters_lv2_tpu.models.truepeak import TruePeakMeter

    m = TruePeakMeter(FS)
    x = make_signal("mix", 2.0)
    ref, rst = _run(m, x, "0", FS // 2)
    got, gst = _run(m, x, "interpret", FS // 2)
    for (rl, rp), (gl, gp) in zip(ref, got):
        np.testing.assert_allclose(gl, rl, rtol=2e-5)
        np.testing.assert_allclose(gp, rp, rtol=2e-5)
    # resampler history is computed outside any GEMM: bit-exact
    np.testing.assert_array_equal(
        np.asarray(gst.hist), np.asarray(rst.hist)
    )


def test_fused_subframe_tail_chain():
    """Blocks whose length is not a frame multiple (T % 64 != 0): the
    kernel covers the 64-aligned bulk, the XLA scan chains the tail
    through the SAME carried states, and the per-call epilogue applies
    exactly once."""
    from meters_lv2_tpu.models.truepeak import TruePeakMeter

    m = TruePeakMeter(FS)
    x = make_signal("mix", 1.0)[:, : 5 * 1000]  # 1000 % 64 == 40
    ref, _ = _run(m, x, "0", 1000)
    got, _ = _run(m, x, "interpret", 1000)
    for (rl, rp), (gl, gp) in zip(ref, got):
        np.testing.assert_allclose(gl, rl, rtol=2e-5)
        np.testing.assert_allclose(gp, rp, rtol=2e-5)


def test_fused_nan_skip_and_recovery():
    """A NaN burst must be skipped by the attack branch (reference
    semantics, truepeakdsp.cc) — not poison the carried state."""
    from meters_lv2_tpu.models.truepeak import TruePeakMeter

    m = TruePeakMeter(FS)
    x = make_signal("sine997", 1.0).copy()
    x[:, 1000:1100] = np.nan
    ref, rst = _run(m, x, "0", FS // 4)
    got, gst = _run(m, x, "interpret", FS // 4)
    for (rl, rp), (gl, gp) in zip(ref, got):
        assert np.isfinite(gl).all() and np.isfinite(gp).all()
        np.testing.assert_allclose(gl, rl, rtol=2e-5)
        np.testing.assert_allclose(gp, rp, rtol=2e-5)


def test_fused_batch_padding_shapes():
    """Batch sizes straddling the 1024-lane tile (and scalar batch)."""
    from meters_lv2_tpu.models.truepeak import TruePeakMeter

    m = TruePeakMeter(FS)
    rng = np.random.default_rng(7)
    for shape in ((), (3,), (2, 5)):
        x = (0.5 * rng.standard_normal((*shape, 1024))).astype(np.float32)
        ref, _ = _run(m, x, "0", 512)
        got, _ = _run(m, x, "interpret", 512)
        for (rl, rp), (gl, gp) in zip(ref, got):
            np.testing.assert_allclose(gl, rl, rtol=2e-5, err_msg=str(shape))
            np.testing.assert_allclose(gp, rp, rtol=2e-5, err_msg=str(shape))


def test_read_reset_semantics_preserved():
    """m/p accumulate across updates until read() arms the reset —
    src/meters.cc:438-508 wrapper semantics through the fused path."""
    from meters_lv2_tpu.models.truepeak import TruePeakMeter

    m = TruePeakMeter(FS)
    loud = make_signal("sine997", 0.25)
    quiet = (0.01 * loud).astype(np.float32)
    with _mode("interpret"):
        st = m.init((2,))
        upd = jax.jit(m.update)
        st = upd(st, jnp.asarray(loud))
        st = upd(st, jnp.asarray(quiet))  # no read between: max carries
        o, st = m.read(st)
        pk_held = float(np.max(np.asarray(o["peak"])))
        st = upd(st, jnp.asarray(quiet))
        o2, st = m.read(st)
        pk_after = float(np.max(np.asarray(o2["peak"])))
    assert pk_held > 0.1  # the loud block's peak survived the quiet one
    assert pk_after < 0.02  # read armed the reset; only quiet measured
