"""Throughput benchmark: batched 48 kHz stereo EBU R128 + true-peak.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} where
value = aggregate x-realtime per chip (stream-seconds analyzed per
wall-clock second) and vs_baseline is relative to the BASELINE.json
north-star target of 10,000x realtime per chip.

The workload is the full reference pipeline (SURVEY.md §3.3): K-weighting
+ fragment powers + M/S loudness + gating histograms + radar + 4x
oversampled true peak, streamed through the state-carrying update().  A
python loop dispatches one jitted update per chunk (dispatch is ~ms
against 20+ ms of device work), so only the single-chunk program compiles
— it is served from the persistent compilation cache on repeat runs.
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
    B = int(os.environ.get("BENCH_STREAMS", "256"))
    chunk_s = float(os.environ.get("BENCH_CHUNK_S", "1.0"))
    # 240 chunks: steady-state pipelined throughput (shorter runs spend a
    # visible fraction in pipeline ramp; production batch jobs stream
    # minutes of audio per file).  Round-3 sweep: 1 s x 240 = 164k x rt
    # beats 2 s chunks (145-153k) and 120 chunks (145-155k).
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "240"))
    Tc = int(fs * chunk_s)
    dur = chunk_s * n_chunks

    meter = EbuR128Meter(fs, nchan=2)
    read = jax.jit(meter.read)
    scan_n = int(os.environ.get("BENCH_SCAN", "1"))
    assert n_chunks % scan_n == 0

    # flat channel-major input layout: the producer lays audio out as
    # [B, C*T] so the fused kernel reads it without the [B,C,T]->[B,C*T]
    # physical retile (BENCH_FLAT=0 restores the 3D layout for A/B runs)
    flat = os.environ.get("BENCH_FLAT", "1") != "0"
    xshape = (B, 2 * Tc) if flat else (B, 2, Tc)

    if scan_n > 1:
        # amortize per-dispatch latency: one program advances scan_n chunks
        @jax.jit
        def update(st, xs):
            def step(s, xc):
                return meter.update(s, xc, flat=flat), ()

            st, _ = jax.lax.scan(step, st, xs)
            return st

        key = jax.random.PRNGKey(0)
        x = 0.1 * jax.random.normal(key, (scan_n, *xshape), jnp.float32)
        n_dispatch = n_chunks // scan_n
    else:
        update = jax.jit(lambda st, xc: meter.update(st, xc, flat=flat))
        key = jax.random.PRNGKey(0)
        x = 0.1 * jax.random.normal(key, xshape, jnp.float32)
        n_dispatch = n_chunks

    # warmup / compile
    st = meter.init((B,))
    st = update(st, x)
    out, _ = read(st)
    jax.block_until_ready(out["integrated"])

    # best-of-N: the axon tunnel RTT varies run to run (docs/BENCHMARKS.md
    # "Sustained/soak"); more samples pick a representative low-RTT window
    runs = int(os.environ.get("BENCH_RUNS", "6"))
    best = float("inf")
    for _ in range(runs):
        st = meter.init((B,))
        jax.block_until_ready(st.loud_m)
        t0 = time.perf_counter()
        for _ in range(n_dispatch):
            st = update(st, x)
        out, _ = read(st)
        # fetch, don't just block: on the axon backend block_until_ready
        # can return before execution for small programs — a host copy is
        # the only reliable completion barrier (docs/BENCHMARKS.md)
        np.asarray(out["integrated"])
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
