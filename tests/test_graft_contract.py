"""The driver contract, invoked EXACTLY as the driver does.

Round 1's MULTICHIP artifact failed (rc=1) because ``dryrun_multichip``
assumed ``jax.devices()`` had 8 entries, but the driver environment exposes
one axon TPU device and no conftest sets the virtual-CPU flags.  These tests
spawn a fresh interpreter with NO pytest conftest and NO XLA_FLAGS /
JAX_PLATFORMS help, so the function must self-provision its mesh.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    env = dict(os.environ)
    # Simulate the driver: no virtual-device help from the caller.
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "xla_force_host_platform_device_count" not in f
    )
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    # ... except: never let the test touch the real TPU tunnel.  The driver
    # runs the same code with the axon plugin registered; forcing CPU here
    # only changes which single-device platform the PARENT process sees.
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_dryrun_multichip_selfprovisions():
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]


def test_entry_compiles_single_device():
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "jax.block_until_ready(out)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
