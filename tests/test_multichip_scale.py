"""Virtual-mesh evidence beyond 8 devices: 16/32-device dryruns, the
sp=8 sequence-parallel extreme, and a dp-sharded ragged batch.

The in-process tests use the conftest 8-CPU mesh; the 16/32-device runs
go through ``dryrun_multichip``'s self-provisioning subprocess path
(XLA_FLAGS can't change device count after backend init).
"""

import os
import subprocess
import sys

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from signals import make_signal

FS = 48000
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_16_devices():
    import __graft_entry__ as g

    g.dryrun_multichip(16)


@pytest.mark.slow
def test_dryrun_multichip_32_devices():
    import __graft_entry__ as g

    g.dryrun_multichip(32)


def test_sharded_r128_sp8_matches_serial():
    """The sequence-parallel extreme on the 8-device mesh: ONE stream's
    timeline split over all 8 devices (dp=1, sp=8), 59-fragment halos
    chained across 7 shard boundaries — bin-exact vs the serial meter."""
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.parallel import make_mesh
    from meters_lv2_tpu.parallel.r128_sharded import analyze_r128

    m = EbuR128Meter(FS, nchan=2)
    mesh = make_mesh(dp=1, sp=8)
    secs = 8 * 60 * m.fragm / FS  # 60 fragments per shard (halo minimum)
    x = make_signal("bursts", secs)
    xs = x[None].astype(np.float32)
    out = analyze_r128(m, jnp.asarray(xs), mesh)

    st = m.init((1,))
    st = jax.jit(m.update)(st, jnp.asarray(xs))
    ref, _ = jax.jit(m.read)(st)

    np.testing.assert_array_equal(np.asarray(out["hist_m"]), np.asarray(st.hist_m))
    np.testing.assert_array_equal(np.asarray(out["hist_s"]), np.asarray(st.hist_s))
    np.testing.assert_allclose(
        np.asarray(out["max_M"]), np.asarray(ref["max_M"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["integrated"]), np.asarray(ref["integrated"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["dbtp"]), np.asarray(st.dbtp), atol=1e-6
    )


def test_sharded_r128_16_devices_matches_serial():
    """Sharded == serial at 16 virtual devices (dp=4, sp=4) — run in a
    fresh interpreter because device count is fixed at backend init."""
    code = """
import jax; jax.config.update('jax_platforms', 'cpu')
import sys; sys.path.insert(0, r'%s')
import numpy as np, jax.numpy as jnp
from signals import make_signal
from meters_lv2_tpu.models.ebur128 import EbuR128Meter
from meters_lv2_tpu.parallel import make_mesh
from meters_lv2_tpu.parallel.r128_sharded import analyze_r128
FS = 48000
m = EbuR128Meter(FS, nchan=2)
mesh = make_mesh(dp=4, sp=4)
secs = 4 * 60 * m.fragm / FS
x = make_signal('bursts', secs)
xs = np.stack([x, 0.5 * x, 0.25 * x, 2.0 * x]).astype(np.float32)
out = analyze_r128(m, jnp.asarray(xs), mesh)
st = m.init((4,))
st = jax.jit(m.update)(st, jnp.asarray(xs))
ref, _ = jax.jit(m.read)(st)
np.testing.assert_array_equal(np.asarray(out['hist_m']), np.asarray(st.hist_m))
np.testing.assert_allclose(np.asarray(out['integrated']),
                           np.asarray(ref['integrated']), atol=1e-4)
np.testing.assert_allclose(np.asarray(out['dbtp']), np.asarray(st.dbtp),
                           atol=1e-6)
print('OK16')
""" % os.path.join(REPO, "tests")
    env = dict(os.environ)
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=16"]
    )
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "OK16" in proc.stdout


@pytest.mark.slow
def test_ragged_batch_dp_sharded_matches_unsharded():
    """run_stream_ragged over a dp-sharded batch (GSPMD partitioning of
    both phases) == the unsharded run, length-exactness preserved."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.models.kmeter import K20Meter
    from meters_lv2_tpu.parallel import make_mesh
    from meters_lv2_tpu.parallel.pipeline import MeterPipeline

    mesh = make_mesh(dp=8, sp=1)
    B = 8
    chunk = FS
    lens = [(2 + (i % 3)) * FS + 1200 * (i % 4) for i in range(B)]  # %4==0
    T = ((max(lens) + chunk - 1) // chunk) * chunk
    rng = np.random.default_rng(5)
    x = np.zeros((B, 2, T), np.float32)
    for i, L in enumerate(lens):
        x[i, :, :L] = (0.1 * (1 + i) / B) * rng.standard_normal((2, L))

    def mk():
        return MeterPipeline(
            {"r128": EbuR128Meter(FS, nchan=2), "k20": K20Meter(FS)}, nchan=2
        )

    pipe = mk()
    st = pipe.init((B,))
    st = pipe.run_stream_ragged(st, jnp.asarray(x), np.asarray(lens), chunk)
    ref_outs, _ = pipe.read(st)

    pipe2 = mk()
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("dp", None, None)))
    st2 = jax.device_put(pipe2.init((B,)), NamedSharding(mesh, P("dp")))
    st2 = pipe2.run_stream_ragged(st2, xs, np.asarray(lens), chunk)
    outs2, _ = pipe2.read(st2)

    np.testing.assert_array_equal(
        np.asarray(st2["r128"].hist_m), np.asarray(st["r128"].hist_m)
    )
    for key in ("loudness_M", "integrated", "dbtp", "max_M"):
        np.testing.assert_allclose(
            np.asarray(outs2["r128"][key]), np.asarray(ref_outs["r128"][key]),
            atol=1e-6, err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(outs2["k20"]["rms"]), np.asarray(ref_outs["k20"]["rms"]),
        rtol=1e-6,
    )
