"""Standards-derived compliance properties (EBU Tech 3341/3342 spirit).

The golden fixtures pin parity against the compiled reference; these
tests pin the *standards* semantics independently of any implementation:
BS.1770 1 kHz calibration, dB-linearity, absolute/relative gating, and
LRA of a two-level programme (the Tech 3342 construction).
"""

import numpy as np

import jax
import jax.numpy as jnp

from meters_lv2_tpu.models.ebur128 import EbuR128Meter

FS = 48000


def _run(x: np.ndarray) -> dict:
    m = EbuR128Meter(FS, nchan=2)
    st = m.init(())
    st = jax.jit(m.update)(st, jnp.asarray(x))
    out, _ = m.read(st)
    return {k: np.asarray(v) for k, v in out.items()}


def _stereo_tone(level_dbfs: float, seconds: float, f0: float = 997.0):
    t = np.arange(int(FS * seconds)) / FS
    a = 10 ** (level_dbfs / 20.0)
    s = (a * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    return np.stack([s, s])


def test_bs1770_1khz_calibration():
    """A 997 Hz stereo tone at -23 dBFS per channel reads -23.0 LUFS
    (the -0.691 offset cancels the K-weighting gain at 1 kHz; identical
    L/R sum to twice one channel's mean-square = +3.01 dB, and a sine's
    mean square is amplitude^2/2 = -3.01 dB)."""
    out = _run(_stereo_tone(-23.0, 10.0))
    # Tech 3341 acceptance is +/-0.1 LU; I is additionally quantized by
    # the 0.1 LU gating-histogram bins
    assert abs(float(out["integrated"]) - (-23.0)) < 0.1
    assert abs(float(out["loudness_M"]) - (-23.0)) < 0.05
    assert abs(float(out["loudness_S"]) - (-23.0)) < 0.05


def test_gain_linearity():
    """I(a*x) = I(x) + 20 log10(a) (Tech 3341 cases 1/2: -23 vs -33)."""
    lo = _run(_stereo_tone(-33.0, 10.0))
    hi = _run(_stereo_tone(-23.0, 10.0))
    d = float(hi["integrated"]) - float(lo["integrated"])
    assert abs(d - 10.0) < 0.02


def test_absolute_gate_ignores_silence():
    """Appending digital silence must not move I (absolute -70 gate)."""
    tone = _stereo_tone(-23.0, 10.0)
    silence = np.zeros((2, FS * 8), np.float32)
    a = _run(tone)
    b = _run(np.concatenate([tone, silence], axis=1))
    # each I is quantized by the 0.1 LU histogram bins
    assert abs(float(a["integrated"]) - float(b["integrated"])) < 0.1


def test_relative_gate_excludes_quiet_passage():
    """Tech 3341 case 5 construction: 20 s at -36 then 20 s at -23: the
    -10 LU relative gate excludes the quiet passage, so I lands near -23,
    far above the ungated mean."""
    quiet = _stereo_tone(-36.0, 20.0)
    loud = _stereo_tone(-23.0, 20.0)
    out = _run(np.concatenate([quiet, loud], axis=1))
    i = float(out["integrated"])
    assert -23.6 < i < -22.9, i
    # sanity: the ungated energy mean would be ~ -25.6
    assert i > -24.5


def test_lra_two_level_programme():
    """Tech 3342 case 2-style: 20 s at -20 then 20 s at -30 gives an
    LRA close to the 10 LU level difference."""
    a = _stereo_tone(-20.0, 20.0)
    b = _stereo_tone(-30.0, 20.0)
    out = _run(np.concatenate([b, a], axis=1))
    lra = float(out["lra"])
    assert 8.0 < lra < 11.0, lra


def test_momentary_vs_short_windows():
    """After a level step, M (400 ms) settles to the new level well
    before S (3 s)."""
    m = EbuR128Meter(FS, nchan=2)
    st = m.init(())
    st = jax.jit(m.update)(st, jnp.asarray(_stereo_tone(-33.0, 6.0)))
    # 1 s into the louder passage: M fully settled, S still blending
    st = jax.jit(m.update)(st, jnp.asarray(_stereo_tone(-23.0, 1.0)))
    out, _ = m.read(st)
    assert abs(float(out["loudness_M"]) - (-23.0)) < 0.1
    assert float(out["loudness_S"]) < -24.0  # still carries old material
