"""Command-line batch metering — the offline counterpart of the reference's
standalone apps (x42-meter-collection, doc/x42-meter.1).

    python -m meters_lv2_tpu FILES... [--meters r128,truepeak,k20,...]
                                      [--json] [--chunk-seconds 2.0]

All files are decoded (native WAV codec), padded into one batch and
analyzed in a single jitted pipeline; thousands of files amortize one
compile.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

METER_CHOICES = [
    "r128", "truepeak", "vu", "din", "nor", "bbc", "ebu", "bbcms",
    "k12", "k14", "k20", "cor", "dr14", "tpnrms", "spectrum", "sigdist",
    "bitmeter",
]


def build_meter(name: str, fs: float, nchan: int):
    from .models import (
        cor, dr14, ebur128, kmeter, needle, sigdist, spectrum, truepeak,
        bitmeter,
    )

    table = {
        "r128": lambda: ebur128.EbuR128Meter(fs, nchan=nchan),
        "truepeak": lambda: truepeak.TruePeakMeter(fs),
        "vu": lambda: needle.VUMeter(fs),
        "din": lambda: needle.DINMeter(fs),
        "nor": lambda: needle.NordicMeter(fs),
        "bbc": lambda: needle.BBCMeter(fs),
        "ebu": lambda: needle.EBUMeter(fs),
        "bbcms": lambda: needle.BBCMidSideMeter(fs),
        "k12": lambda: kmeter.K12Meter(fs),
        "k14": lambda: kmeter.K14Meter(fs),
        "k20": lambda: kmeter.K20Meter(fs),
        "cor": lambda: cor.CorrelationMeter(fs),
        "dr14": lambda: dr14.DR14Meter(fs, nchan=nchan),
        "tpnrms": lambda: dr14.TPnRMSMeter(fs, nchan=nchan),
        "spectrum": lambda: spectrum.SpectrumAnalyzer(fs),
        "sigdist": lambda: sigdist.SigDistMeter(fs),
        "bitmeter": lambda: bitmeter.BitMeter(fs),
    }
    return table[name]()


def _to_py(o):
    if isinstance(o, dict):
        return {k: _to_py(v) for k, v in o.items()}
    arr = np.asarray(o)
    if arr.size > 64:  # don't dump whole histograms unless asked
        return {"shape": list(arr.shape), "max": float(arr.max())}
    if arr.ndim == 0:
        return float(arr)
    return [round(float(v), 6) for v in arr.ravel()]


def _render_views(render_dir, names, outs, files):
    """Save each meter's end-of-file inline view as {file}_{meter}.png
    (the batch analog of the reference's inline-display renderers)."""
    import os

    import jax
    import numpy as np

    from .utils import db, render
    from .utils.png import write_png

    os.makedirs(render_dir, exist_ok=True)
    needle_types = {
        "vu": db.MT_VU, "din": db.MT_DIN, "nor": db.MT_NOR,
        "bbc": db.MT_BBC, "ebu": db.MT_EBU,
    }
    kranges = {"k12": 12.0, "k14": 14.0, "k20": 20.0}
    # fetch each meter's batched output once (not once per file)
    host = {
        n: jax.tree_util.tree_map(np.asarray, outs[n]) for n in names
    }
    for i, path in enumerate(files):
        base = os.path.splitext(os.path.basename(path))[0]
        for n in names:
            o = jax.tree_util.tree_map(lambda a: a[i], host[n])
            img = None
            if n == "r128":
                img = render.radar_image(o["radar_m"], int(o["radar_pos"]))
            elif n in needle_types:
                v = o if not isinstance(o, dict) else next(iter(o.values()))
                img = render.needle_image(float(np.max(v)), needle_types[n])
            elif n in kranges:
                rms_db = 20.0 * np.log10(max(float(np.max(o["rms"])), 1e-10))
                img = render.bargraph_image(rms_db, kranges[n])
            elif n == "spectrum":
                img = render.spectrum_image(o["bands"], o.get("peaks"))
            elif n == "sigdist":
                img = render.sigdist_image(o["hist"])
            elif n == "bitmeter":
                img = render.bitmeter_image(o["hit"], o["one"])
            if img is not None:
                write_png(
                    os.path.join(render_dir, f"{base}_{n}.png"), img
                )


def main(argv=None):
    ap = argparse.ArgumentParser(prog="meters_lv2_tpu", description=__doc__)
    ap.add_argument("files", nargs="+", help="WAV files to analyze")
    ap.add_argument(
        "--meters", default="r128,truepeak",
        help=f"comma list from: {','.join(METER_CHOICES)}",
    )
    ap.add_argument("--json", action="store_true", help="machine output")
    ap.add_argument("--chunk-seconds", type=float, default=2.0)
    ap.add_argument("--ref-level", type=float, default=-18.0)
    ap.add_argument(
        "--target-rate", type=int, default=None,
        help="resample mixed-rate inputs to this rate on ingest",
    )
    ap.add_argument(
        "--render-dir", default=None,
        help="write end-of-file meter views as PNGs (radar, needle faces,"
             " bargraphs, spectrum, sigdist, bitmeter) to this directory",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .io.batch import load_files
    from .parallel.pipeline import MeterPipeline

    batch = load_files(args.files, target_rate=args.target_rate)
    B, C, T = batch.data.shape
    fs = batch.rate

    names = [m.strip() for m in args.meters.split(",") if m.strip()]
    for n in names:
        if n not in METER_CHOICES:
            ap.error(f"unknown meter {n!r}")
    pipe = MeterPipeline(
        {n: build_meter(n, fs, C) for n in names}, nchan=C
    )

    chunk = int(fs * args.chunk_seconds)
    Tpad = ((T + chunk - 1) // chunk) * chunk
    x = np.zeros((B, C, Tpad), np.float32)
    x[:, :, :T] = batch.data

    # measure each file over exactly its own length (4-sample grain):
    # padding past a file's end is never processed, matching a per-file
    # reference run (src/meters.cc:298-331, one run() stream per track)
    lengths = (np.asarray(batch.lengths) // 4) * 4
    st = pipe.init((B,))
    st = pipe.run_stream_ragged(st, jnp.asarray(x), lengths, chunk)
    outs, _ = jax.jit(pipe.read)(st)

    if args.render_dir:
        _render_views(args.render_dir, names, outs, args.files)

    results = []
    for i, path in enumerate(args.files):
        row = {"file": path, "seconds": float(batch.lengths[i] / fs)}
        for n in names:
            row[n] = _to_py(jax.tree_util.tree_map(lambda a: a[i], outs[n]))
        results.append(row)

    if args.json:
        print(json.dumps(results, indent=None))
    else:
        for row in results:
            print(f"== {row['file']} ({row['seconds']:.1f}s)")
            for n in names:
                print(f"  [{n}] {json.dumps(row[n])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
