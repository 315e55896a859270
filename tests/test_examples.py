"""Smoke-run the examples/ scripts as real subprocesses (CPU).

The examples are the public "getting started" surface (the analog of the
reference's doc/x42-meter.1 usage examples); nothing else executes them,
so they rot silently when APIs move.  All three run concurrently to keep
wall time near the slowest one.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(ROOT, "examples")


def _spawn(args):
    return subprocess.Popen(
        [sys.executable, *args, "--cpu"],
        cwd=ROOT,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


@pytest.mark.slow
def test_examples_smoke(tmp_path):
    from meters_lv2_tpu.io.wav import write_wav

    # 6 s each: calc_integ gates I at >= 50 M-points (5 s), so shorter
    # files legitimately report -200 LUFS and would mask regressions.
    rng = np.random.default_rng(7)
    wavs = []
    for i in range(2):
        x = (0.2 * rng.standard_normal((2, 6 * 48000))).astype(np.float32)
        p = str(tmp_path / f"ex{i}.wav")
        write_wav(p, x, 48000)
        wavs.append(p)

    procs = {
        "batch_loudness": _spawn(
            [os.path.join(EXAMPLES, "batch_loudness.py"), *wavs]
        ),
        "streaming_monitor": _spawn(
            [os.path.join(EXAMPLES, "streaming_monitor.py")]
        ),
        "sharded_analysis": _spawn(
            [os.path.join(EXAMPLES, "sharded_analysis.py")]
        ),
    }
    outs = {}
    try:
        for name, p in procs.items():
            try:
                outs[name], _ = p.communicate(timeout=900)
            except subprocess.TimeoutExpired:
                p.kill()
                outs[name], _ = p.communicate()
                pytest.fail(f"{name} timed out; tail:\n{outs[name][-2000:]}")
            assert p.returncode == 0, f"{name} failed:\n{outs[name][-2000:]}"
    finally:
        # an early fail must not leak the remaining jax subprocesses
        for p in procs.values():
            if p.poll() is None:
                p.kill()
                p.communicate()

    out = outs["batch_loudness"]
    # both files loud enough for a finite gated I (~ -8 LUFS)
    assert out.count("ADJUST") + out.count("PASS") == 2, out
    assert "-200.00" not in out, out

    assert "final:" in outs["streaming_monitor"], outs["streaming_monitor"]
    assert "radar -> 240" in outs["streaming_monitor"]

    out = outs["sharded_analysis"]
    assert "stream 7:" in out and "checkpointed + restored" in out, out
