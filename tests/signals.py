"""Deterministic fixture test signals, shared by tools/gen_fixtures.py (which
runs them through the compiled reference) and the parity tests."""

import zlib

import numpy as np

FS = 48000


def make_signal(name: str, seconds: float = 6.0, fs: int = FS) -> np.ndarray:
    """Returns [2, T] float32 stereo."""
    n = int(fs * seconds)
    t = np.arange(n) / fs
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    if name == "sine997":
        l = 10 ** (-18 / 20) * np.sin(2 * np.pi * 997 * t)
        r = 10 ** (-20 / 20) * np.sin(2 * np.pi * 1499 * t)
    elif name == "mix":
        env = 0.15 + 0.5 * (np.sin(2 * np.pi * 0.25 * t) > 0.2) + 0.2 * np.sin(
            2 * np.pi * 0.05 * t
        )
        l = env * (0.4 * np.sin(2 * np.pi * 997 * t) + 0.05 * rng.standard_normal(n))
        r = env * (0.3 * np.sin(2 * np.pi * 1499 * t) + 0.05 * rng.standard_normal(n))
    elif name == "noise":
        l = 0.3 * rng.standard_normal(n)
        r = 0.3 * rng.standard_normal(n)
    elif name == "bursts":
        g = (np.sin(2 * np.pi * 0.7 * t) > 0).astype(np.float64)
        l = 0.8 * g * rng.standard_normal(n)
        r = 0.8 * g * rng.standard_normal(n)
    elif name == "clipped":
        l = np.clip(2.0 * np.sin(2 * np.pi * 441 * t), -1, 1)
        r = np.clip(1.5 * np.sin(2 * np.pi * 883 * t + 0.5), -1, 1)
    elif name == "silence_then_tone":
        l = np.where(t > seconds / 2, 0.25 * np.sin(2 * np.pi * 997 * t), 0.0)
        r = np.where(t > seconds / 2, 0.20 * np.sin(2 * np.pi * 499 * t), 0.0)
    elif name == "hot":
        # Deliberately exceeds the sigdist bin span (bin = rint(180+150v)
        # in [0,360] <=> v in [-1.203, 1.203]): exercises the reference's
        # out-of-range Welford count quirk (src/sigdistlv2.c:316-318 — the
        # running-variance count advances for skipped samples).
        env = 1.0 + 0.6 * np.sin(2 * np.pi * 0.33 * t)
        l = env * np.sin(2 * np.pi * 441 * t) + 0.1 * rng.standard_normal(n)
        r = 0.9 * env * np.sin(2 * np.pi * 883 * t) + 0.1 * rng.standard_normal(n)
    elif name == "intersample_peak":
        # near-fs/4 tone with phase offset: true peak exceeds sample peak
        l = 0.5 * np.sin(2 * np.pi * (fs / 4.0 - 10) * t + 0.3)
        r = 0.5 * np.sin(2 * np.pi * (fs / 6.0 + 7) * t + 1.1)
    elif name == "weird_floats":
        # IEEE-754 zoo for the bitmeter: zeros (both signs), denormals,
        # NaN/Inf, huge-dynamic-range normals, plus ordinary audio
        l = (0.3 * np.sin(2 * np.pi * 441 * t)).astype(np.float32)
        l[::17] = 0.0
        l[1::17] = -0.0
        l[2::17] = np.float32(1e-42)  # denormal
        l[3::17] = np.float32(-3e-44)  # denormal
        l[4::17] = np.nan
        l[5::17] = np.inf
        l[6::17] = -np.inf
        l[7::17] = np.float32(1e30)
        l[8::17] = np.float32(-1e-30)
        l[9::17] = np.float32(0.75)
        scale = np.float32(2.0) ** rng.integers(-40, 10, n).astype(np.float32)
        l[10::17] = (scale * rng.standard_normal(n).astype(np.float32))[10::17]
        r = l[::-1].copy()
        return np.stack([l, r]).astype(np.float32)
    else:
        raise KeyError(name)
    return np.stack([l, r]).astype(np.float32)


def make_surround(
    name: str, seconds: float = 6.0, fs: int = FS, nchan: int = 5
) -> np.ndarray:
    """[nchan, T] synthetic surround bed derived from the stereo signal.
    nchan=5 keeps the original (L, R, center, Ls, Rs) mix bit-exactly;
    3..8 channels extend it with deterministic derived beds."""
    x = make_signal(name, seconds, fs)
    l, r = x
    chans = [
        l, r, 0.5 * (l + r), 0.7 * l, 0.6 * r,
        0.5 * (l - r), 0.8 * r, 0.65 * l + 0.2 * r,
    ]
    assert 3 <= nchan <= 8, nchan
    return np.stack(chans[:nchan]).astype(np.float32)


ALL_SIGNALS = [
    "sine997",
    "mix",
    "noise",
    "bursts",
    "clipped",
    "silence_then_tone",
    "intersample_peak",
]
