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


def run(name, cmd, logdir, timeout):
    os.makedirs(logdir, exist_ok=True)
    path = os.path.join(logdir, f"release_{name}.log")
    t0 = time.time()
    timed_out = False
    with open(path, "w") as log:
        try:
            rc = subprocess.run(
                cmd, cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
                timeout=timeout,
            ).returncode
        except subprocess.TimeoutExpired:
            rc, timed_out = -1, True
    dt = time.time() - t0
    tail = ""
    with open(path, "rb") as f:  # bounded tail read — logs can be large
        f.seek(max(0, os.path.getsize(path) - 4096))
        lines = [ln.strip() for ln in f.read().decode(errors="replace")
                 .splitlines() if ln.strip()]
        if lines:
            tail = lines[-1][:100]
    return {"name": name, "rc": rc, "s": dt, "log": path, "tail": tail,
            "timed_out": timed_out}


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
        # timeouts assume a mostly-warm .jax_cache; a fully cold cache can
        # exceed them (the band-packed spectrum kernel alone compiles
        # ~16 min through the tunnel, XLA programs 5-10 min each) — warm
        # with `python bench.py` / a manual sweep first, or raise these
        results.append(run("bench", [py, "bench.py"], args.logdir,
                           timeout=7200))
        results.append(run(
            "parity_sweep", [py, "tools/tpu_parity_check.py"],
            args.logdir, timeout=10800,
        ))

    print()
    print(f"{'step':18s} {'status':>7s} {'secs':>7s}  last line / log")
    ok = True
    for r in results:
        ok &= r["rc"] == 0
        mark = ("TIMEOUT" if r["timed_out"]
                else "PASS" if r["rc"] == 0 else "FAIL")
        print(f"{r['name']:18s} {mark:>7s} {r['s']:7.0f}  "
              f"{r['tail']}  [{r['log']}]")
    print()
    print("RELEASE GATE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
