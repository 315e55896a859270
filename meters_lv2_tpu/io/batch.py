"""Batch assembly: pad/segment a ragged set of audio files into the
fixed-shape [B, C, T] tensors the TPU pipeline consumes.

The reference's throughput axis is "one plugin instance per track"; here a
thousand files become one batch.  Files are right-padded with silence to a
common (block-aligned) length; per-file valid lengths ride along and
parallel.pipeline.run_stream_ragged consumes them so each file is measured
over exactly its own samples — trailing padding is never processed and
per-file readouts equal a serial per-file run.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class AudioBatch:
    data: np.ndarray  # [B, C, T] float32
    lengths: np.ndarray  # [B] int64 valid frames per file
    rate: int


def assemble(
    files: list[np.ndarray],
    rate: int,
    align: int = 2400,
    max_frames: int | None = None,
) -> AudioBatch:
    """Stack [C, T_i] arrays into one padded batch.

    align: pad the common length to a multiple (default one R128 fragment
    at 48 kHz so sequence-parallel sharding stays fragment-aligned).
    """
    assert files
    C = files[0].shape[0]
    assert all(f.shape[0] == C for f in files), "channel counts differ"
    lens = np.array([f.shape[1] for f in files], np.int64)
    T = int(lens.max() if max_frames is None else max_frames)
    T = ((T + align - 1) // align) * align
    out = np.zeros((len(files), C, T), np.float32)
    for i, f in enumerate(files):
        n = min(f.shape[1], T)
        out[i, :, :n] = f[:, :n]
    return AudioBatch(data=out, lengths=np.minimum(lens, T), rate=rate)


def load_files(
    paths: list[str],
    expect_rate: int | None = None,
    target_rate: int | None = None,
) -> AudioBatch:
    """Read WAVs (native decoder) and assemble a batch.

    target_rate: normalize a mixed-rate set to one meter rate via the
    arbitrary-ratio polyphase resampler (ops.resample.RationalResampler —
    the zita Resampler is generic, resampler.cc:67-120).  Without it, all
    files must share one rate.
    """
    decoded = None
    try:
        from ..runtime import native

        lib = native.load()
    except Exception:
        lib = None  # native runtime unavailable: pure-python fallback
    if lib is not None:
        # production ingest: native thread-pool decode keeps the
        # accelerator fed (the reference's host feeds one RT stream; a
        # batch framework's data-loader is the analogous native runtime
        # component).  Decode errors (corrupt file etc.) propagate — only
        # runtime *availability* falls back to python.
        decoded = native.wav_read_batch(paths)
    if decoded is None:
        from .wav import read_wav

        decoded = [read_wav(p) for p in paths]

    arrs = []
    rate = None
    for p, (x, r) in zip(paths, decoded):
        if target_rate is not None and r != target_rate:
            import numpy as _np

            from ..ops.resample import resample_signal

            x = _np.asarray(resample_signal(x, r, target_rate))
            r = target_rate
        if rate is None:
            rate = r
        assert r == rate, (
            f"sample-rate mismatch: {p} has {r}, want {rate} "
            f"(pass target_rate= to resample on ingest)"
        )
        arrs.append(x)
    if expect_rate is not None:
        assert rate == expect_rate
    return assemble(arrs, rate)
