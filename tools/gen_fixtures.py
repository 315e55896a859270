"""Generate committed parity fixtures by running the compiled reference
(tools/build_golden.sh) over the deterministic test signals.

Usage: python tools/gen_fixtures.py [golden_binary]
Writes tests/fixtures/<meter>_<signal>.json.
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from signals import ALL_SIGNALS, FS, make_signal  # noqa: E402

# argv: [--golden PATH] [case-name patterns...].  A positional first arg is
# accepted as the binary only when it contains a path separator — a bare
# case-name filter can never be silently consumed as the binary even if a
# same-named file happens to exist in cwd.
_args = sys.argv[1:]
GOLDEN = "/tmp/meters_golden/golden"
if _args and _args[0] == "--golden":
    if len(_args) < 2:
        raise SystemExit("--golden requires a path")
    GOLDEN = _args[1]
    _args = _args[2:]
    if not os.path.isfile(GOLDEN):
        raise SystemExit(f"golden binary not found: {GOLDEN}")
elif _args and os.sep in _args[0]:
    GOLDEN = _args.pop(0)
    if not os.path.isfile(GOLDEN):
        raise SystemExit(f"golden binary not found: {GOLDEN}")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
BLOCK = 1024
READ_EVERY = 16

CASES = [
    # (meter, nchan, signals, seconds[, block, read_every])
    ("vu", 2, ALL_SIGNALS, 6.0),
    ("iec1", 2, ALL_SIGNALS, 6.0),
    ("iec2", 2, ALL_SIGNALS, 6.0),
    ("msppm", 2, ["mix", "noise", "sine997"], 6.0),
    # side gain toggled -6 -> +14 dB mid-stream (the BBCM6 S20 port)
    ("msppm_s20", 2, ["mix"], 6.0),
    ("kmeter", 2, ALL_SIGNALS, 6.0),
    ("truepeak", 2, ALL_SIGNALS, 6.0),
    ("stcorr", 2, ["mix", "noise", "sine997", "clipped"], 6.0),
    ("ebur128", 2, ALL_SIGNALS, 12.0),
    ("ebur128mono", 1, ["mix", "sine997"], 12.0),
    # fragment-aligned blocks: golden's 500 ms I/LRA recompute cadence lands
    # exactly on the read points, so integrated/LRA compare directly
    ("ebur128_aligned", 2, ["mix", "bursts", "silence_then_tone"], 12.0, 2400, 10),
    # block-size invariance: same meters at very different process() cadences
    ("vu_blk4096", 2, ["mix"], 6.0, 4096, 4),
    ("kmeter_blk512", 2, ["bursts"], 6.0, 512, 32),
    ("ebur128_blk4096", 2, ["mix"], 12.0, 4096, 4),
    # 5.0 surround: exercises the {1,1,1,1.41,1.41} channel gains
    ("ebur128_5ch", 5, ["mix"], 12.0, 2400, 10),
    # non-48k sample rate (fragm = fs//20 = 2205, all coefficients rescale)
    ("ebur128_44k", 2, ["mix"], 12.0, 1024, 16, 44100),
    ("truepeak_44k", 2, ["intersample_peak"], 6.0, 1024, 16, 44100),
    ("spectrum_44k", 2, ["mix"], 4.0, 1024, 16, 44100),
    # ballistics coefficient rescaling at 44.1k (w1/w2/w3 = f(fs))
    ("vu_44k", 2, ["mix"], 6.0, 1024, 16, 44100),
    ("iec1_44k", 2, ["mix"], 6.0, 1024, 16, 44100),
    ("iec2_44k", 2, ["mix"], 6.0, 1024, 16, 44100),
    ("kmeter_44k", 2, ["bursts"], 6.0, 1024, 16, 44100),
    # high rate (96 kHz: fragm = 4800; 4x-oversampled true peak at 384 k)
    ("ebur128_96k", 2, ["mix"], 12.0, 1024, 16, 96000),
    ("truepeak_96k", 2, ["intersample_peak"], 6.0, 1024, 16, 96000),
    # ballistics coefficient rescaling at 96 kHz (w = f(fs) at 2x the
    # design rate; complements the 44.1 kHz row above)
    ("vu_96k", 2, ["mix"], 6.0, 1024, 16, 96000),
    ("iec2_96k", 2, ["mix"], 6.0, 1024, 16, 96000),
    ("kmeter_96k", 2, ["bursts"], 6.0, 1024, 16, 96000),
    ("spectrum", 2, ["mix", "noise", "sine997"], 4.0),
    # DR-14: >=5 complete 3 s (144001-sample) windows, incl. a silence-gated
    # stretch; read cadence = the km/tp read-reset parity contract
    ("dr14", 2, ["mix", "silence_then_tone", "sine997"], 16.0, 1024, 47),
    ("dr14mono", 1, ["mix"], 16.0, 1024, 47),
    # 44.1 kHz: n_sample_cnt = rint(44100*3) = 132300 -> 132301-sample windows
    ("dr14_44k", 2, ["mix"], 16.0, 1024, 47, 44100),
    ("tpnrms", 2, ["mix", "bursts"], 6.0),
    # sigdist: signals with all samples in the 361-bin range (out-of-range
    # samples desync the accepted-count Welford; see sigdist_oor below)
    ("sigdist", 1, ["mix", "sine997", "clipped"], 6.0),
    # out-of-range material (> ±1.2): pins the reference's Welford count
    # quirk (sigdistlv2.c:316-318), reproduced by reference_oor_count=True
    ("sigdist_oor", 1, ["hot"], 6.0),
    ("bitmeter", 1, ["weird_floats", "mix"], 2.0),
    # FFT meters + goniometer (fftw-free golden path in golden_main.cc).
    # block=960 divides hop=ceil(48000/25)=1920, so the reference's
    # block-quantized analysis points land exactly on hop multiples —
    # frame-exact comparison with the TPU STFT
    ("stft", 2, ["mix", "sine997"], 2.0, 960, 2, FS, ["512", "25"]),
    # block NOT dividing the hop: pins fftx's quantized-hop placement
    ("stft_oddblock", 2, ["mix"], 2.0, 1024, 2, FS, ["512", "25"]),
    ("phasewheel", 2, ["mix", "sine997"], 2.0, 960, 5, FS, ["128"]),
    ("stereoscope", 2, ["mix", "noise"], 2.0, 960, 5, FS, ["128"]),
    ("goniometer", 2, ["mix", "sine997"], 2.0, 1024, 8, FS, ["4"]),
    ("goniometer_os1", 2, ["mix"], 2.0, 1024, 8, FS, ["1"]),
    ("goniometer_os2", 2, ["mix"], 2.0, 1024, 8, FS, ["2"]),
    ("goniometer_os8", 2, ["mix"], 2.0, 1024, 8, FS, ["8"]),
    # arbitrary-ratio zita resampler: (block, read_every) carry
    # (fs_out, hlen) for this mode
    ("surround5", 5, ["mix"], 6.0),
    # channel-count extremes: 3ch drops to 3 correlators (surmeter.c:57),
    # 7/8ch exercise the full pair wrap-around routing
    ("surround3", 3, ["mix"], 6.0),
    ("surround7", 7, ["mix"], 6.0),
    ("surround8", 8, ["mix"], 6.0),
    # 96 kHz display analyzers: the 25 Hz band (spectrum) is the f32
    # precision worst case; DR windows = 288001 samples
    ("spectrum_96k", 2, ["mix"], 4.0, 1024, 16, 96000),
    ("dr14_96k", 2, ["mix"], 16.0, 1024, 47, 96000),
    # 44.1 kHz STFT analyzers (hop = 1764; block 882 keeps frames aligned)
    ("phasewheel_44k", 2, ["mix"], 2.0, 882, 5, 44100, ["128"]),
    ("stereoscope_44k", 2, ["mix"], 2.0, 882, 5, 44100, ["128"]),
    ("rresample_up", 2, ["mix"], 1.0, 48000, 32, 44100),
    ("rresample_down", 2, ["intersample_peak"], 1.0, 44100, 32, 48000),
]


def main(patterns=()):
    """Regenerate fixtures; with name patterns, only matching cases
    (e.g. `python tools/gen_fixtures.py ebur128_96k`)."""
    os.makedirs(OUT, exist_ok=True)
    for case in CASES:
        if patterns and not any(p in case[0] for p in patterns):
            continue
        meter, nchan, signals, seconds = case[:4]
        block = case[4] if len(case) > 4 else BLOCK
        read_every = case[5] if len(case) > 5 else READ_EVERY
        rate = case[6] if len(case) > 6 else FS
        extra = case[7] if len(case) > 7 else []
        gmeter = meter
        for prefix in ("ebur128", "vu", "iec1", "iec2", "kmeter",
                       "truepeak", "spectrum",
                       "dr14", "tpnrms", "sigdist", "bitmeter", "stft",
                       "phasewheel", "stereoscope", "goniometer",
                       "rresample", "surround"):
            if meter.startswith(prefix):
                gmeter = prefix
        for sig in signals:
            if meter.startswith("surround") or meter.startswith("ebur128_5ch"):
                from signals import make_surround

                x = make_surround(sig, seconds, fs=rate, nchan=nchan)
            else:
                x = make_signal(sig, seconds, fs=rate)  # [2, T]
                if nchan == 1:
                    x = x[:1]
            inter = np.ascontiguousarray(x.T).astype(np.float32)  # [T, C]
            with tempfile.NamedTemporaryFile(suffix=".f32", delete=False) as f:
                inter.tofile(f)
                raw = f.name
            try:
                res = subprocess.run(
                    [GOLDEN, gmeter, str(rate), str(block), str(read_every),
                     str(nchan), raw, *extra],
                    capture_output=True, text=True, check=True,
                )
            finally:
                os.unlink(raw)
            lines = [json.loads(l) for l in res.stdout.splitlines() if l.strip()]
            fx = {
                "meter": meter,
                "signal": sig,
                "fs": rate,
                "nchan": nchan,
                "seconds": seconds,
                "block": block,
                "read_every": read_every,
                "extra": extra,
                "reads": lines,
            }
            path = os.path.join(OUT, f"{meter}_{sig}.json")
            with open(path, "w") as f:
                json.dump(fx, f)
            print(f"wrote {path} ({len(lines)} reads)")


if __name__ == "__main__":
    main(tuple(_args))
