"""Throughput benchmark: batched 48 kHz stereo EBU R128 + true-peak.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} where
value = aggregate x-realtime per chip (stream-seconds analyzed per
wall-clock second) and vs_baseline is relative to the BASELINE.json
north-star target of 10,000x realtime per chip.

The workload is the full reference pipeline (SURVEY.md §3.3): K-weighting
+ fragment powers + M/S loudness + gating histograms + 4x oversampled
true peak, streamed through the state-carrying update() under one jit
(lax.scan over time chunks keeps HBM bounded).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from meters_lv2_tpu.models.ebur128 import EbuR128Meter

    fs = 48000
    B = int(os.environ.get("BENCH_STREAMS", "128"))
    chunk_s = float(os.environ.get("BENCH_CHUNK_S", "2.0"))
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "15"))
    Tc = int(fs * chunk_s)
    dur = chunk_s * n_chunks

    meter = EbuR128Meter(fs, nchan=2)

    key = jax.random.PRNGKey(0)
    x = 0.1 * jax.random.normal(key, (B, 2, n_chunks, Tc), jnp.float32)

    @jax.jit
    def analyze(x):
        st = meter.init((B,))
        xs = jnp.moveaxis(x, 2, 0)  # [n_chunks, B, 2, Tc]

        def step(st, xc):
            return meter.update(st, xc), ()

        st, _ = jax.lax.scan(step, st, xs)
        out, _ = meter.read(st)
        return out

    # warmup / compile
    out = analyze(x)
    jax.block_until_ready(out["integrated"])

    runs = int(os.environ.get("BENCH_RUNS", "3"))
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        out = analyze(x)
        jax.block_until_ready(out["integrated"])
        best = min(best, time.perf_counter() - t0)

    stream_seconds = B * dur
    xrt = stream_seconds / best
    print(
        json.dumps(
            {
                "metric": "r128+truepeak x-realtime per chip (48kHz stereo, "
                f"B={B}, {dur:.0f}s streams)",
                "value": round(xrt, 1),
                "unit": "x-realtime",
                "vs_baseline": round(xrt / 10000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
