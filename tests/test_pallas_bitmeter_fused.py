"""Fused Pallas bitmeter kernel (ops/pallas_bitmeter) vs the XLA SWAR
path — exact integer equality (interpret mode on CPU; on-chip numbers
from tools/tpu_parity_check.py's bitmeter family + tools/bench_meters)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from signals import make_signal

FS = 48000


def _fused(mode):
    class _Ctx:
        def __enter__(self):
            self.old = os.environ.get("METERS_TPU_BITMETER_FUSED")
            os.environ["METERS_TPU_BITMETER_FUSED"] = mode

        def __exit__(self, *a):
            if self.old is None:
                del os.environ["METERS_TPU_BITMETER_FUSED"]
            else:
                os.environ["METERS_TPU_BITMETER_FUSED"] = self.old

    return _Ctx()


def _run(x, mode, batch=(), chunks=1):
    from meters_lv2_tpu.models.bitmeter import BitMeter

    m = BitMeter(FS)
    with _fused(mode):
        st = m.init(batch)
        upd = jax.jit(m.update)
        T = x.shape[-1]
        step = T // chunks
        for i in range(chunks):
            st = upd(st, jnp.asarray(x[..., i * step : (i + 1) * step]))
        out, _ = m.read(st)
    return out


def test_fused_bitmeter_exact_vs_xla():
    x = make_signal("weird_floats", 1.0)[0]  # incl. NaN/Inf/denormals
    xs = np.stack([x, 0.5 * x, np.abs(x)])
    ref = _run(xs, "0", batch=(3,))
    out = _run(xs, "interpret", batch=(3,))
    for k in ("hit", "one", "dset", "nan", "inf", "den", "zero", "pos",
              "integration_time"):
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(out[k]), err_msg=k
        )
    np.testing.assert_array_equal(np.asarray(ref["max"]), np.asarray(out["max"]))
    np.testing.assert_array_equal(np.asarray(ref["min"]), np.asarray(out["min"]))


def test_fused_bitmeter_nonaligned_tail():
    """T % 2048 != 0: kernel bulk + chained XLA tail, still exact."""
    x = make_signal("mix", 1.0)[0][:46000]
    ref = _run(x, "0", chunks=2)
    out = _run(x, "interpret", chunks=2)
    for k in ("hit", "one", "dset", "zero", "pos", "integration_time"):
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(out[k]), err_msg=k
        )
