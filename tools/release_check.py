"""One-command release gate — the round-close verification ritual.

Chains every acceptance surface this repo ships and prints a PASS/FAIL
summary (exit 0 only if everything passed):

  1. CPU test suite           python -m pytest tests/ -q   (--fast for
                              -m "not slow"; --skip-suite to omit)
  2. entry() compile-check    the driver's single-chip contract
  3. dryrun_multichip(8)      the driver's virtual-mesh contract (CPU)
  4. bench.py                 the official throughput line (real chip;
                              hits .jax_cache/ when warm)
  5. tpu_parity_check         the 14-family on-chip numerics sweep

Steps 4-5 need the TPU tunnel; --skip-tpu runs only the CPU gates.
Each step streams to its own log under --logdir (default /tmp).

Usage:
  python tools/release_check.py [--fast] [--skip-suite] [--skip-tpu]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name, cmd, logdir, timeout, env=None):
    path = os.path.join(logdir, f"release_{name}.log")
    t0 = time.time()
    with open(path, "w") as log:
        try:
            rc = subprocess.run(
                cmd, cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
                timeout=timeout, env={**os.environ, **(env or {})},
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
    dt = time.time() - t0
    tail = ""
    with open(path) as f:
        lines = [ln.rstrip() for ln in f if ln.strip()]
        if lines:
            tail = lines[-1][:100]
    return {"name": name, "rc": rc, "s": dt, "log": path, "tail": tail}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fast", action="store_true",
                    help='suite runs -m "not slow" (~10 min vs ~20)')
    ap.add_argument("--skip-suite", action="store_true")
    ap.add_argument("--skip-tpu", action="store_true",
                    help="omit the on-chip gates (bench, parity sweep)")
    ap.add_argument("--logdir", default="/tmp")
    args = ap.parse_args(argv)

    py = sys.executable
    results = []

    if not args.skip_suite:
        cmd = [py, "-m", "pytest", "tests/", "-q"]
        if args.fast:
            cmd += ["-m", "not slow"]
        results.append(run("suite", cmd, args.logdir, timeout=3600))

    # driver contracts, exactly as tests/test_graft_contract.py shapes them
    results.append(run(
        "entry_compile",
        [py, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import __graft_entry__ as g; fn, a = g.entry();"
         "jax.jit(fn).lower(*a).compile(); print('entry OK')"],
        args.logdir, timeout=900,
    ))
    results.append(run(
        "dryrun_multichip",
        [py, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8);"
         "print('dryrun OK')"],
        args.logdir, timeout=1800,
    ))

    if not args.skip_tpu:
        results.append(run("bench", [py, "bench.py"], args.logdir,
                           timeout=3600))
        results.append(run(
            "parity_sweep", [py, "tools/tpu_parity_check.py"],
            args.logdir, timeout=3600,
        ))

    print()
    print(f"{'step':18s} {'rc':>4s} {'secs':>7s}  last line / log")
    ok = True
    for r in results:
        ok &= r["rc"] == 0
        mark = "PASS" if r["rc"] == 0 else "FAIL"
        print(f"{r['name']:18s} {mark:>4s} {r['s']:7.0f}  "
              f"{r['tail']}  [{r['log']}]")
    print()
    print("RELEASE GATE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
