"""4x polyphase oversampling for true-peak detection, as a batched MXU conv.

Replaces the sequential two-sided MAC of zita-resampler
(resampler.cc:189-262) with a single causal convolution: the oversampled
stream is

    up[4*t + ph] = sum_{k=-hl}^{hl-1} x[t - hl - k] * h(k + ph/4)

(see ops/design.upsample4_kernel).  Phase 0 is a pure hl-sample delay, so
the reference's alignment — including its 8192-zero prefeed at init
(truepeakdsp.cc:159-168) — is reproduced by zero history at stream start.
The 47-sample input history is carried across blocks for streaming use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .design import upsample4_kernel, upsample_poly_kernel

_HL = 24
_HIST = 2 * _HL - 1  # 47 samples of history


def upsample_taps(factor: int, hl: int, dtype=jnp.float32) -> jax.Array:
    """[factor, 2*hl] polyphase filters for integer-factor oversampling."""
    return jnp.asarray(upsample_poly_kernel(factor, hl), dtype)


_BLOCK_MATS: dict[tuple, np.ndarray] = {}


def _block_matrix(taps: np.ndarray, tb: int) -> np.ndarray:
    """Dense block operator M [tb + K - 1, factor*tb] with
    M[j+i, factor*j + ph] = taps[ph, i] — one MXU GEMM produces factor*tb
    outputs from tb inputs + (K-1)-sample halo.

    XLA lowers the equivalent 1-channel conv off the MXU (~100x slower on
    TPU); this keeps the FIR on the systolic array.
    """
    factor, K = taps.shape
    key = (taps.tobytes(), tb)
    if key not in _BLOCK_MATS:
        M = np.zeros((tb + K - 1, factor * tb), np.float32)
        for j in range(tb):
            for ph in range(factor):
                M[j : j + K, factor * j + ph] = taps[ph]
        _BLOCK_MATS[key] = M
    return _BLOCK_MATS[key]


def _upsample_blocked(
    x: jax.Array, hist: jax.Array, taps_np: np.ndarray, tb: int = 128
) -> tuple[jax.Array, jax.Array]:
    """Core polyphase upsampler as overlapping-block GEMMs.

    x [..., T], hist [..., K-1] -> (up [..., factor*T], new_hist).
    Overlapping frames are assembled from plain reshapes/slices (no
    gather): frame n = [block_n, head of block_{n+1}].
    """
    factor, K = taps_np.shape
    nh = K - 1
    *batch, T = x.shape
    main = (T // tb) * tb
    xp = jnp.concatenate([hist, x], axis=-1)  # [..., nh + T]
    outs = []
    segments = []
    if main:
        segments.append((0, main, tb))
    if T - main:
        segments.append((main, T, T - main))
    for start, end, step in segments:
        seg = xp[..., start : end + nh]  # [..., L + nh]
        L = end - start
        nblk = L // step
        blocks = seg[..., :L].reshape(*batch, nblk, step)
        heads_mid = blocks[..., 1:, :nh] if step >= nh else None
        tail = seg[..., L:][..., None, :]  # [..., 1, nh]
        if step >= nh:
            heads = jnp.concatenate([heads_mid, tail], axis=-2)
        else:
            # step < nh: heads overlap multiple blocks; fall back to stack
            heads = jnp.stack(
                [seg[..., (n + 1) * step : (n + 1) * step + nh]
                 for n in range(nblk)],
                axis=-2,
            )
        frames = jnp.concatenate([blocks, heads], axis=-1)  # [..., nblk, step+nh]
        M = jnp.asarray(_block_matrix(taps_np, step))
        from .lti import _HIGH

        y = jnp.matmul(frames, M, precision=_HIGH)
        outs.append(y.reshape(*batch, factor * L))
    up = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    return up, xp[..., -nh:]


def upsample_init(batch_shape=(), hl: int = _HL, dtype=jnp.float32) -> jax.Array:
    return jnp.zeros((*batch_shape, 2 * hl - 1), dtype)


def upsample(
    x: jax.Array, hist: jax.Array, taps: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Integer-factor polyphase upsampling (generalises upsample4).

    x [..., T], hist [..., 2*hl-1], taps [factor, 2*hl] →
    (up [..., factor*T], new_hist).  Used by the goniometer's optional
    2x/4x/8x oversampling (gui/goniometer.c:155-189, hlen=12).
    """
    return _upsample_blocked(x, hist, np.asarray(taps, np.float32))


def upsample4_taps(dtype=jnp.float32) -> jax.Array:
    """[4, 48] phase filters (float64 design, float32 constants)."""
    return jnp.asarray(upsample4_kernel(_HL), dtype)


def composed_smooth_taps(
    taps_np: np.ndarray, hpw: float, n_sm: int = 4
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fold a one-pole smoother into polyphase upsampling taps (f64 host).

    The goniometer's trace smoother ``lp += hpw*(d - lp)``
    (gui/goniometer.c:400-409) runs on the OVERSAMPLED stream, so the
    unfused path materializes the full factor*T stream between the
    polyphase conv and the recurrence.  But its pole is (1-hpw) ~ 3e-4
    .. 3e-3 — near-memoryless — so the smoother is, to below f32 ulp, an
    ``n_sm``-tap FIR ``sm[k] = hpw*(1-hpw)^k`` (residual (1-hpw)^n_sm
    <= ~1e-10 of the signal).  Convolving it into the upsampling taps
    collapses oversample+smooth into ONE overlapping-block GEMM: the
    4x stream is never materialized and the blocked one-pole stage
    (2nd GEMM pass + d=1 scan) disappears.

    Block-entry exactness: outputs t < n_sm-1 of an update() block need
    pre-block oversampled samples; the caller instead evaluates them via
    the exact recurrence identity

        trace_t = sum_{k<=t} sm[k] * d_{t-k}  +  (1-hpw)^(t+1) * s0

    where s0 is the carried smoother state (== trace_{-1}) — it covers
    ALL older history with an exact coefficient.  C/pow below implement
    that row form over the window [hist(K-1) | x_0 x_1].

    Returns (taps_c [os, nh'+1], C [n_sm-1, K+1], pow [n_sm-1]):
    taps_c feeds ``_block_matrix`` with nh' = (os*K + n_sm - 2)//os
    history samples ((os>1 callers zero-pad the base K-1-sample history
    on the LEFT; the pad corrupts exactly the outputs C replaces).
    """
    os_, K = np.asarray(taps_np).shape
    nh = K - 1
    t64 = np.asarray(taps_np, np.float64)
    sm = float(hpw) * (1.0 - float(hpw)) ** np.arange(n_sm, dtype=np.float64)
    # oversampled-domain impulse response: H[ph + os*(nh - i)] = taps[ph, i]
    H = np.zeros(os_ * K, np.float64)
    for ph in range(os_):
        for i in range(K):
            H[ph + os_ * (nh - i)] = t64[ph, i]
    Hc = np.convolve(H, sm)
    nmax = len(Hc) - 1
    nhp = nmax // os_
    taps_c = np.zeros((os_, nhp + 1), np.float64)
    for ph in range(os_):
        for ip in range(nhp + 1):
            n = ph + os_ * (nhp - ip)
            if 0 <= n <= nmax:
                taps_c[ph, ip] = Hc[n]
    # exact first-output rows over [hist(nh) | x_0 x_1]  (a = col - nh)
    C = np.zeros((n_sm - 1, K + 1), np.float64)
    for m in range(n_sm - 1):
        for k in range(m + 1):
            mp = m - k  # d_{m-k}: j = mp//os, ph' = mp%os
            j, php = divmod(mp, os_)
            for i in range(K):
                col = (j + i - nh) + nh  # a + nh
                if 0 <= col <= K:
                    C[m, col] += sm[k] * t64[php, i]
    powv = (1.0 - float(hpw)) ** np.arange(1, n_sm, dtype=np.float64)
    return (
        taps_c.astype(np.float32),
        C.astype(np.float32),
        powv.astype(np.float32),
    )


def upsample4_init(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    """History buffer of 2*hl-1 zeros (equivalent to the zero prefeed)."""
    return jnp.zeros((*batch_shape, _HIST), dtype)


def upsample4_absmax(
    x: jax.Array, hist: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """max |4x-oversampled stream| over the block, without materializing it.

    The reduce happens directly on each block-GEMM output (the layout ops
    of assembling the full 4T stream would force an HBM round trip of 16
    bytes/sample).  Exactly TruePeakdsp::process_max (truepeakdsp.cc:109-131)
    over one block.  Returns (absmax [...], new_hist).
    """
    taps_np = upsample4_kernel(_HL).astype(np.float32)
    factor, K = taps_np.shape
    nh = K - 1
    *batch, T = x.shape
    tb = 128
    main = (T // tb) * tb
    xp = jnp.concatenate([hist, x], axis=-1)
    from .lti import _HIGH

    best = jnp.zeros((*batch,), x.dtype)
    segments = []
    if main:
        segments.append((0, main, tb))
    if T - main:
        segments.append((main, T, T - main))
    for start, end, step in segments:
        seg = xp[..., start : end + nh]
        L = end - start
        nblk = L // step
        blocks = seg[..., :L].reshape(*batch, nblk, step)
        tail = seg[..., L:][..., None, :]
        if step >= nh:
            heads = jnp.concatenate([blocks[..., 1:, :nh], tail], axis=-2)
        else:
            heads = jnp.stack(
                [seg[..., (n + 1) * step : (n + 1) * step + nh]
                 for n in range(nblk)], axis=-2,
            )
        frames = jnp.concatenate([blocks, heads], axis=-1)
        M = jnp.asarray(_block_matrix(taps_np, step))
        y = jnp.matmul(frames, M, precision=_HIGH)
        av = jnp.abs(y)
        # reference `if (v > m) m = v` (truepeakdsp.cc:111-122): NaN
        # comparisons are false, so NaN oversamples are SKIPPED, not
        # propagated (0 is the max identity here; +/-Inf still registers)
        av = jnp.where(jnp.isnan(av), 0.0, av)
        best = jnp.maximum(best, jnp.max(av, axis=(-2, -1)))
    return best, xp[..., -nh:]


def upsample4(x: jax.Array, hist: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Upsample a block 4x.

    Args:
      x: [..., T] input block.
      hist: [..., 47] carried history (upsample4_init at stream start).

    Returns:
      (up, new_hist): up [..., 4*T] oversampled stream aligned like the
      reference (up[4t+ph] uses inputs ... x[t]); new_hist [..., 47].
    """
    return _upsample_blocked(x, hist, upsample4_kernel(_HL).astype(np.float32))


class RationalResampler:
    """Arbitrary-ratio polyphase resampler, zita-equivalent, as cycle GEMMs.

    The reference's generic Resampler (resampler.cc:67-120,171-262) handles
    any fs_in -> fs_out.  TPU formulation: with n = fs_out/gcd phases and
    s = fs_in/gcd inputs per cycle, every cycle of n outputs is one GEMM of
    an overlapping input frame [s + 2h - 1] against a dense [F, n] matrix —
    all cycles batch into a single MXU matmul.

    Streaming: apply() carries a 2h-1 sample history; a fresh (zeros)
    history reproduces the reference primed with 2h-1 zero samples.
    """

    def __init__(self, fs_in: int, fs_out: int, hl: int = 32,
                 frel: float | None = None, dtype=jnp.float32):
        from .design import rational_resample_kernel

        W, n, s, h = rational_resample_kernel(fs_in, fs_out, hl, frel)
        self.fs_in, self.fs_out = int(fs_in), int(fs_out)
        self.n, self.s, self.h = n, s, h
        self.nh = 2 * h - 1
        self.F = s + self.nh  # frame length per cycle
        Wc = np.zeros((self.F, n), np.float32)
        for p in range(n):
            b = (p * s) // n
            Wc[b : b + 2 * h, p] = W[p]
        self._Wc = Wc  # numpy: trace-safe constant
        self.dtype = dtype

    def init(self, batch_shape=()) -> jax.Array:
        return jnp.zeros((*batch_shape, self.nh), self.dtype)

    def apply(self, x: jax.Array, hist: jax.Array):
        """x [..., T] (T % s == 0), hist [..., 2h-1] ->
        (y [..., T*n/s], new_hist)."""
        *batch, T = x.shape
        assert T % self.s == 0, (T, self.s)
        ncyc = T // self.s
        z = jnp.concatenate([hist, x], axis=-1)  # [..., nh + T]
        s, nh = self.s, self.nh
        blocks = z[..., nh:].reshape(*batch, ncyc, s)
        if s >= nh:
            # head of cycle c (= z[c*s : c*s+nh]) is the tail of block c-1;
            # cycle 0's head is the carried history — no gathers needed
            heads = jnp.concatenate(
                [z[..., None, :nh], blocks[..., :-1, s - nh :]], axis=-2
            )
        else:
            # nh spans multiple blocks: assemble from ceil(nh/s)+1 shifted
            # reshapes of z (still O(1) ops, not O(ncyc))
            cols = []
            done = 0
            while done < nh:
                w = min(s, nh - done)
                seg = z[..., done : done + ncyc * s].reshape(*batch, ncyc, s)
                cols.append(seg[..., :w])
                done += w
            heads = jnp.concatenate(cols, axis=-1)
        frames = jnp.concatenate(
            [heads, blocks], axis=-1
        )  # [..., ncyc, nh + s] = z[c*s : c*s + F]
        from .lti import _HIGH

        y = jnp.matmul(frames, jnp.asarray(self._Wc), precision=_HIGH)
        return y.reshape(*batch, ncyc * self.n), z[..., -nh:]


def resample_signal(x, fs_in: int, fs_out: int, hl: int = 32):
    """Whole-array convenience: resample [..., T] from fs_in to fs_out.

    Pads the tail with zeros to a whole number of polyphase cycles; returns
    [..., ceil(T/s)*n] samples (the first T*fs_out/fs_in are the signal,
    offset by the resampler's h-sample group delay)."""
    if fs_in == fs_out:
        return jnp.asarray(x)
    rs = RationalResampler(fs_in, fs_out, hl)
    T = x.shape[-1]
    pad = (-T) % rs.s
    if pad:
        x = jnp.concatenate(
            [jnp.asarray(x),
             jnp.zeros((*x.shape[:-1], pad), jnp.asarray(x).dtype)], -1
        )
    y, _ = rs.apply(jnp.asarray(x), rs.init(x.shape[:-1]))
    return y
