"""Envelope-composition ballistics (SURVEY §7 option (a)) equivalence.

The 5-piece max-of-affine group envelope in ops/pallas_ballistics must
reproduce the serial branch recurrence: max distributes over the
monotone affine step maps, so the results agree up to f32 op-order
rounding (the envelope evaluates (1-w)^k * z + b_k instead of chained
z += w*(t-z); branch-equivalent paths differ by ~1 ulp).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meters_lv2_tpu.ops import ballistics, design
from meters_lv2_tpu.ops import pallas_ballistics as pb


def _serial_reference(t, z1, z2, w1, w2, w3, track_peak):
    """Per-sample float32 python oracle of the reference loop."""
    t = np.asarray(t, np.float32)
    B, T = t.shape
    z1 = z1.copy()
    z2 = z2.copy()
    m = np.zeros(B, np.float32)
    p = np.zeros(B, np.float32)
    # NaN rows exercise the flush path; np.where evaluates both branches,
    # so the unselected NaN arithmetic would warn without this guard
    with np.errstate(invalid="ignore"):
        return _serial_loop(t, z1, z2, m, p, w1, w2, w3, track_peak)


def _serial_loop(t, z1, z2, m, p, w1, w2, w3, track_peak):
    T = t.shape[1]
    for g in range(T // 4):
        z1 *= np.float32(w3)
        z2 *= np.float32(w3)
        for j in range(4):
            tt = t[:, 4 * g + j]
            a1 = tt > z1
            z1 = np.where(a1, z1 + np.float32(w1) * (tt - z1), z1)
            a2 = tt > z2
            z2 = np.where(a2, z2 + np.float32(w2) * (tt - z2), z2)
            if track_peak:
                p = np.where(tt > p, tt, p)
        m = np.maximum(m, z1 + z2)
    return z1, z2, m, p


@pytest.mark.parametrize("track_peak", [False, True])
def test_envelope_matches_serial(track_peak):
    coeffs = design.iec2_ppm(48000.0)
    rng = np.random.default_rng(3)
    B, T = 8, 256
    t = np.abs(rng.standard_normal((B, T))).astype(np.float32)
    # adversarial content: silence runs (pure decay), a huge spike, NaN
    # and +inf samples (reference branch skips NaN, follows inf)
    t[0, 32:128] = 0.0
    t[1, 77] = 50.0
    t[2, 10] = np.nan
    t[3, ::7] = np.nan
    t[4, 100] = np.inf
    z1 = np.abs(rng.standard_normal(B)).astype(np.float32) * 0.5
    z2 = np.abs(rng.standard_normal(B)).astype(np.float32) * 0.5

    ref = _serial_reference(t, z1, z2, coeffs.w1, coeffs.w2, coeffs.w3,
                            track_peak)
    got = pb.ballistics_pallas(
        jnp.asarray(t), jnp.asarray(z1), jnp.asarray(z2),
        jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.float32),
        w1=coeffs.w1, w2=coeffs.w2, w3=coeffs.w3,
        track_peak=track_peak, envelope=True, interpret=True,
    )
    for name, r, g in zip(("z1", "z2", "m", "p"), ref, got):
        if name == "p" and not track_peak:
            continue
        np.testing.assert_allclose(
            np.asarray(g)[:B], r, rtol=2e-6, atol=1e-7, err_msg=name)


def test_envelope_vs_scan_path_random():
    """Envelope kernel vs the lax.scan formulation over random blocks."""
    coeffs = design.true_peak_ballistics(192000.0)
    rng = np.random.default_rng(11)
    B, T = 16, 512
    t = np.abs(0.7 * rng.standard_normal((B, T))).astype(np.float32)
    z1 = np.zeros(B, np.float32)
    z2 = np.zeros(B, np.float32)

    ref = _serial_reference(t, z1, z2, coeffs.w1, coeffs.w2, coeffs.w3, True)
    got = pb.ballistics_pallas(
        jnp.asarray(t), jnp.asarray(z1), jnp.asarray(z2),
        jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.float32),
        w1=coeffs.w1, w2=coeffs.w2, w3=coeffs.w3,
        track_peak=True, envelope=True, interpret=True,
    )
    for name, r, g in zip(("z1", "z2", "m", "p"), ref, got):
        np.testing.assert_allclose(
            np.asarray(g)[:B], r, rtol=2e-6, atol=1e-7, err_msg=name)
