"""ctypes bindings to the native runtime (native/libmeters_native.so).

Builds the library on first use if the toolchain is available; all
functionality degrades gracefully to pure-Python fallbacks (io.wav).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmeters_native.so")

METER_KINDS = {
    "vu": 0,
    "iec1": 1,
    "iec2": 2,
    "kmeter": 3,
    "truepeak": 4,
    "stcorr": 5,
    "r128": 6,
    "spectrum": 7,
    "msppm": 8,
    "sigdist": 9,
    "bitmeter": 10,
    "dr14": 11,
    "tpnrms": 12,
    "gonio": 13,  # nchan argument carries the oversample factor (1/2/4/8)
    "phasewheel": 14,
    "stereoscope": 15,
    "surround": 16,
}

_lib = None

_SOURCES = ("Makefile", "engine.cc", "wavio.cc", "meters_native.h")
_STAMP_PATH = _LIB_PATH + ".srchash"


def _src_hash() -> str:
    """Content hash of the native sources: the .so is built on demand and
    never committed, and a binary whose stamp doesn't match the sources is
    rebuilt — a stale library can't silently diverge from engine.cc (it is
    the third parity leg, tests/test_native.py)."""
    import hashlib

    h = hashlib.sha256()
    for name in _SOURCES:
        with open(os.path.join(_NATIVE_DIR, name), "rb") as f:
            h.update(name.encode())
            h.update(f.read())
    return h.hexdigest()


def _stamp() -> str | None:
    try:
        with open(_STAMP_PATH) as f:
            return f.read().strip()
    except OSError:
        return None


def _build(want: str) -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-B"], check=True,
            capture_output=True,
        )
    except Exception:
        return False
    with open(_STAMP_PATH, "w") as f:
        f.write(want)
    return True


def load():
    """Load the native library, (re)building whenever the source hash
    stamp is missing or stale; None if unavailable (callers degrade to
    the pure-Python paths)."""
    global _lib
    if _lib is not None:
        return _lib
    want = _src_hash()
    if (not os.path.exists(_LIB_PATH) or _stamp() != want) and not _build(
        want
    ):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mt_wav_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.mt_wav_read.restype = ctypes.c_int
    lib.mt_wav_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.mt_wav_read_batch.restype = ctypes.c_int
    lib.mt_wav_write.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.mt_wav_write.restype = ctypes.c_int
    lib.mt_free.argtypes = [ctypes.c_void_p]
    lib.mt_engine_create.argtypes = [ctypes.c_int, ctypes.c_float, ctypes.c_int]
    lib.mt_engine_create.restype = ctypes.c_void_p
    lib.mt_engine_destroy.argtypes = [ctypes.c_void_p]
    lib.mt_engine_process.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.mt_engine_process.restype = ctypes.c_int
    lib.mt_engine_read.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]
    lib.mt_engine_read.restype = ctypes.c_int
    _lib = lib
    return lib


def wav_read(path: str):
    """Read a WAV file → (data [C, T] float32, rate)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    data = ctypes.POINTER(ctypes.c_float)()
    nchan = ctypes.c_int32()
    nframes = ctypes.c_int64()
    rate = ctypes.c_int32()
    rc = lib.mt_wav_read(
        path.encode(), ctypes.byref(data), ctypes.byref(nchan),
        ctypes.byref(nframes), ctypes.byref(rate),
    )
    if rc != 0:
        raise IOError(f"mt_wav_read({path}) failed: {rc}")
    n = nchan.value * nframes.value
    arr = np.ctypeslib.as_array(data, shape=(n,)).reshape(
        nchan.value, nframes.value
    ).copy()
    lib.mt_free(data)
    return arr, rate.value


def wav_read_batch(paths, workers: int = 0):
    """Decode many WAVs with the native thread pool.

    Returns a list of (data [C, T] float32, rate); raises on the first
    failed file.  workers <= 0 uses hardware concurrency.
    """
    lib = load()
    assert lib is not None
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    data = (ctypes.POINTER(ctypes.c_float) * n)()
    nchan = (ctypes.c_int32 * n)()
    nframes = (ctypes.c_int64 * n)()
    rate = (ctypes.c_int32 * n)()
    rc = (ctypes.c_int32 * n)()
    lib.mt_wav_read_batch(c_paths, n, workers, data, nchan, nframes, rate, rc)
    out = []
    try:
        for i in range(n):
            if rc[i] != 0:
                raise IOError(f"mt_wav_read({paths[i]}) failed: {rc[i]}")
            cnt = nchan[i] * nframes[i]
            arr = np.ctypeslib.as_array(data[i], shape=(cnt,)).reshape(
                nchan[i], nframes[i]
            ).copy()
            out.append((arr, int(rate[i])))
    finally:
        for i in range(n):
            if data[i]:
                lib.mt_free(data[i])
    return out


def wav_write(path: str, data: np.ndarray, rate: int, format: int = 32):
    """Write planar float32 [C, T] as WAV (format 16 = PCM16, 32 = f32)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    data = np.ascontiguousarray(data, np.float32)
    c, t = data.shape
    rc = lib.mt_wav_write(
        path.encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        c, t, rate, format,
    )
    if rc != 0:
        raise IOError(f"mt_wav_write({path}) failed: {rc}")


class NativeEngine:
    """Streaming scalar CPU meter (host-side reference / fallback)."""

    def __init__(self, kind: str, fs: float, nchan: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.mt_engine_create(METER_KINDS[kind], fs, nchan)
        if not self._h:
            raise ValueError(f"bad meter kind {kind}")
        self.kind = kind
        # gonio repurposes the nchan argument as the oversample factor;
        # the engine itself is always stereo (meters_native.h)
        self.nchan = 2 if kind == "gonio" else nchan

    def process(self, x: np.ndarray):
        """x: [C, T] float32 planar, C == the engine's channel count.

        Validated here because the C side receives only nframes and reads
        nchan*T floats — a mismatched array would be an out-of-bounds
        read, not an error."""
        x = np.ascontiguousarray(x, np.float32)
        if x.ndim != 2 or x.shape[0] != self.nchan:
            raise ValueError(
                f"expected [C={self.nchan}, T] planar audio, got {x.shape}"
            )
        rc = self._lib.mt_engine_process(
            self._h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            x.shape[-1],
        )
        if rc != 0:
            raise RuntimeError(f"process failed: {rc}")

    def read(self) -> np.ndarray:
        # 8193 doubles covers the largest readout (phasewheel: 1 + 2*4096)
        cap = 8193
        out = np.zeros(cap, np.float64)
        n = self._lib.mt_engine_read(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap
        )
        if n < 0:
            raise RuntimeError(f"read failed: {n}")
        return out[:n]

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.mt_engine_destroy(self._h)
            self._h = None
