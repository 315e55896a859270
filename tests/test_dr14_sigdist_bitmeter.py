"""DR-14 window logic, sigdist and bitmeter statistics vs python oracles."""

import numpy as np

import jax
import jax.numpy as jnp

FS = 48000


def dr14_oracle(x, fs=FS):
    """Vectorized-per-window reimplementation of the dr14 measurement loop
    (src/dr14.c:263-352, 396-416) for whole signals."""
    C, T = x.shape
    win = int(round(fs * 3.0))
    # the reference window spans n_sample_cnt+1 samples (post-increment
    # `++scnt > slmt` test, dr14.c:404-410) but normalizes by n_sample_cnt
    wl = win + 1
    nwin = T // wl
    hist = np.zeros((C, 8000), np.int64)
    peak_hist = np.zeros((C, 2))
    peak_cur = np.zeros(C)
    nf = 0
    for wdx in range(nwin):
        seg = x[:, wdx * wl : (wdx + 1) * wl]
        sums = (seg.astype(np.float64) ** 2).sum(-1)
        peak_cur = np.maximum(peak_cur, np.maximum(seg.max(-1), 0.0))
        if not (sums > 1e-9 * win).any():
            continue
        nf += 1
        rms = np.sqrt(2.0 * sums / win)
        db = np.where(rms < 1e-4, -80.0, 20 * np.log10(np.maximum(rms, 1e-30)))
        bins = np.round(100.0 * (80.0 + db)).astype(int) - 1
        bins = np.minimum(bins, 7999)
        for c in range(C):
            if bins[c] > 0:
                hist[c, bins[c]] += 1
        for c in range(C):
            pk = peak_cur[c]
            if pk >= peak_hist[c, 0]:
                peak_hist[c, 1] = peak_hist[c, 0]
                peak_hist[c, 0] = pk
            elif pk > peak_hist[c, 1]:
                peak_hist[c, 1] = pk
        peak_cur[:] = 0
    # score
    m_cut = max(1, int(np.floor(nf / 5.0)))
    rms_db = np.full(C, -81.0)
    peak_db = np.full(C, -81.0)
    if nf > 2:
        for c in range(C):
            n_cut = 0
            score = 0.0
            for b in range(7999, 0, -1):
                if n_cut >= m_cut:
                    break
                bc = hist[c, b]
                if bc == 0:
                    continue
                db = (b - 7999) / 100.0
                cd = 0.0 if db <= -80 else 10 ** (0.05 * db)
                score += cd * cd * bc
                n_cut += bc
            if n_cut > 0:
                v = np.sqrt(score / n_cut)
                rms_db[c] = -80.0 if v < 1e-4 else 20 * np.log10(v)
            p = peak_hist[c, 1]
            peak_db[c] = -80.0 if p < 1e-4 else 20 * np.log10(p)
            if p < 1e-4:
                peak_db[c] = -80.0
    dr = np.where(
        (rms_db > -80) & (peak_db > -80),
        np.clip(np.minimum(0, peak_db) - rms_db, 1, 20),
        21.0,
    )
    return {"rms_db": rms_db, "peak_db": peak_db, "dr": dr, "nf": nf,
            "hist": hist}


def test_dr14_matches_oracle():
    from meters_lv2_tpu.models.dr14 import DR14Meter

    rng = np.random.default_rng(9)
    T = FS * 15  # 5 windows
    t = np.arange(T) / FS
    env = 0.1 + 0.6 * (np.sin(2 * np.pi * 0.11 * t) > 0)
    # include a silent stretch in window 2
    env[2 * FS * 3 : 2 * FS * 3 + FS * 3] = 0.0
    x = np.stack(
        [env * 0.5 * np.sin(2 * np.pi * 440 * t),
         env * (0.3 * np.sin(2 * np.pi * 950 * t) + 0.1 * rng.standard_normal(T))]
    ).astype(np.float32)

    ref = dr14_oracle(x)
    m = DR14Meter(FS, nchan=2)
    st = m.init(())
    upd = jax.jit(m.update)
    step = 10000  # unaligned with the 144000-sample window
    for i in range(0, T - T % step, step):
        st = upd(st, jnp.asarray(x[:, i : i + step]))
    # feed the remainder so all complete windows are seen
    rem = T % step
    if rem:
        st = upd(st, jnp.asarray(x[:, T - rem :]))
    out, _ = m.read(st)

    assert int(st.num_windows) == ref["nf"]
    np.testing.assert_array_equal(
        np.asarray(st.hist).astype(np.int64), ref["hist"]
    )
    np.testing.assert_allclose(np.asarray(out["m_rms"]), ref["rms_db"], atol=1e-3)
    # the DR peak (2nd-highest window sample-peak) is internal to the DR
    # computation; the m_peak *port* carries the oversampled true peak
    # (src/dr14.c:470), so compare the top-2 state and dr directly
    np.testing.assert_allclose(
        20 * np.log10(np.asarray(st.peak_top2)[:, 1]), ref["peak_db"], atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(out["dr"]), ref["dr"], atol=1e-3)


def test_sigdist_statistics():
    from meters_lv2_tpu.models.sigdist import SigDistMeter

    rng = np.random.default_rng(3)
    x = np.clip(0.4 * rng.standard_normal(200_000), -1, 1).astype(np.float32)
    m = SigDistMeter(FS)
    st = m.init(())
    upd = jax.jit(m.update)
    for i in range(0, len(x), 48000):
        st = upd(st, jnp.asarray(x[i : i + 48000]))
    out, _ = m.read(st)
    bins = np.round(180.0 + x * 150.0).astype(int)
    ok = (bins >= 0) & (bins < 361)
    ref_hist = np.bincount(bins[ok], minlength=361)
    np.testing.assert_array_equal(np.asarray(out["hist"]).astype(int), ref_hist)
    xs = x[ok].astype(np.float64)
    np.testing.assert_allclose(float(out["mean"]), xs.mean(), atol=1e-5)
    np.testing.assert_allclose(
        float(out["variance"]), xs.var(ddof=1), rtol=1e-4
    )
    assert int(out["integration_time"]) == len(x)


def test_bitmeter_stats():
    from meters_lv2_tpu.models.bitmeter import BitMeter

    # crafted values with known bit patterns
    vals = np.array(
        [0.0, -0.0, 1.0, -1.0, 0.5, 0.75, np.nan, np.inf, -np.inf, 1e-42,
         3.0, -2.5] * 32,
        dtype=np.float32,
    )
    m = BitMeter(FS)
    st = m.init(())
    st = jax.jit(m.update)(st, jnp.asarray(vals))
    out, _ = m.read(st)
    assert float(out["zero"]) == 64  # +0 and -0
    assert float(out["nan"]) == 32
    assert float(out["inf"]) == 64
    assert float(out["den"]) == 32
    assert float(out["max"]) == 3.0
    assert float(out["min"]) == 0.5
    # 1.0 has exponent 127, mantissa 0: the implicit bit lands at hit
    # position 127+23 = 150 and one position 150
    hit = np.asarray(out["hit"])
    one = np.asarray(out["one"])
    assert hit[150] > 0 and one[150] > 0
    # mantissa-zero values (1.0, -1.0, 0.5) set no dset bits; 0.75
    # (mantissa 0x400000) sets bit 22
    dset = np.asarray(out["dset"])
    assert dset[22] > 0
    # per-value audit for 0.75: exp=126, bit22 set -> one[126+22]=one[148]>0
    assert one[148] > 0


def test_counters_exact_past_2pow24():
    """Integer counters keep exact counts where f32 increments would stall
    (reference uses int/long counters: src/bitmeter.c:75-105, dr14.c:89,
    ebulv2.cc:394-396).  Simulates a >24 h stream by seeding the counters
    just past the f32 integer limit and checking exact advance."""
    import dataclasses
    from meters_lv2_tpu.models.bitmeter import BitMeter
    from meters_lv2_tpu.models.sigdist import SigDistMeter
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter

    big = (1 << 24) + 5  # f32 cannot represent big+1

    bm = BitMeter(FS)
    st = bm.init(())
    st = dataclasses.replace(
        st,
        zero=jnp.asarray(big, jnp.int32),
        hit=st.hit.at[150].set(big),
        time=jnp.asarray(big, jnp.int32),
    )
    x = jnp.concatenate([jnp.zeros(64, jnp.float32), jnp.ones(64, jnp.float32)])
    st = jax.jit(bm.update)(st, x)
    out, _ = bm.read(st)
    assert int(out["zero"]) == big + 64
    assert int(np.asarray(out["hit"])[150]) == big + 64
    assert int(out["integration_time"]) == big + 128

    sd = SigDistMeter(FS)
    st = sd.init(())
    st = dataclasses.replace(
        st,
        hist=st.hist.at[180].set(big),
        time=jnp.asarray(big, jnp.int32),
        n=jnp.asarray(big, jnp.int32),
    )
    st = jax.jit(sd.update)(st, jnp.zeros(128, jnp.float32))
    assert int(np.asarray(st.hist)[180]) == big + 128
    assert int(st.time) == big + 128
    assert int(st.n) == big + 128

    # EBU sample counter: hi/lo int32 split carries exactly past 2^31
    # (24 h @ 48 kHz = 4.15e9 samples > int32 range)
    m = EbuR128Meter(FS, nchan=2)
    st = m.init(())
    st = dataclasses.replace(
        st,
        n_lo=jnp.asarray((1 << 30) - 100, jnp.int32),
        n_hi=jnp.asarray(3, jnp.int32),  # ~3.2e9 samples so far
    )
    st = jax.jit(m.update)(st, jnp.zeros((2, 2400), jnp.float32))
    assert int(st.n_lo) == 2300
    assert int(st.n_hi) == 4
    total = int(st.n_lo) + (int(st.n_hi) << 30)
    assert total == ((1 << 30) - 100) + (3 << 30) + 2400


def test_ebu_integration_time_pauses():
    """integ_time only advances while integrating (src/ebulv2.cc:394-396)."""
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter

    m = EbuR128Meter(FS, nchan=2)
    st = m.init(())
    x = jnp.zeros((2, 4800), jnp.float32)
    st = jax.jit(m.update)(st, x)
    st = m.integr_pause(st)
    st = jax.jit(m.update)(st, x)
    st = m.integr_start(st)
    st = jax.jit(m.update)(st, x)
    assert int(st.n_lo) + (int(st.n_hi) << 30) == 9600


def test_swar_value_histogram_matches_bincount():
    """ops/swar.value_histogram (the SWAR alternative to the one-hot
    matmul; kept for wide-bin per-sample counting) is exact."""
    from meters_lv2_tpu.ops import swar

    rng = np.random.default_rng(11)
    idx = rng.integers(-5, 370, (2, 3000)).astype(np.int32)
    h = np.asarray(swar.value_histogram(jnp.asarray(idx), 361))
    for b in range(2):
        sel = idx[b][(idx[b] >= 0) & (idx[b] < 361)]
        ref = np.bincount(sel, minlength=361)
        np.testing.assert_array_equal(h[b], ref)


def test_sigdist_oor_mean_tracks_past_2pow24():
    """The quirk-mode Welford chain must keep tracking past cnt ~ 2^24:
    a direct f32 `a = 1 - 1/cnt` rounds to exactly 1.0 there (f32 eps)
    and freezes the mean; the complement-form composition (u = 1/cnt)
    stays live.  Oracle: the reference's double recurrence
    (sigdistlv2.c:313-318)."""
    import dataclasses

    from meters_lv2_tpu.models.sigdist import SigDistMeter

    m = SigDistMeter(FS, reference_oor_count=True)
    st = m.init(())
    t0 = 1 << 25  # ~11.7 min at 48 kHz, past the f32 freeze point
    st = dataclasses.replace(
        st,
        time=jnp.asarray(t0, st.time.dtype),
        mean=jnp.asarray(0.5, jnp.float32),
    )
    rng = np.random.default_rng(7)
    x = (0.2 + 0.05 * rng.standard_normal(4096)).astype(np.float32)
    st2 = jax.jit(m.update)(st, jnp.asarray(x))

    mean = 0.5  # f64 oracle of the sequential reference loop
    for i, v in enumerate(np.asarray(x, np.float64)):
        mean += (v - mean) / (t0 + i + 1)
    got = float(np.asarray(st2.mean))
    assert got != 0.5, "mean recurrence froze"
    np.testing.assert_allclose(got, mean, rtol=1e-4)


def test_bincount_radix_factored_exact():
    """The two-level (hi*radix+lo) one-hot histogram is integer-exact
    against both the single-level path and numpy, including OOR drops,
    weights, validity masks, ragged nbins/radix and multi-chunk."""
    import jax.numpy as jnp

    from meters_lv2_tpu.ops import hist as hist_ops

    rng = np.random.default_rng(11)
    for nbins, radix, shape in [
        (361, 64, (3, 20000)),  # sigdist shape: nbins % radix != 0
        (361, 19, (2, 8192)),   # exact factor
        (8000, 128, (5000,)),   # dr14-sized, 1-D batchless
        (7, 4, (2, 3, 1000)),   # tiny, deep batch
    ]:
        ids = rng.integers(-5, nbins + 5, size=shape).astype(np.int32)
        valid = rng.random(shape) > 0.1
        a = hist_ops.bincount(
            jnp.asarray(ids), nbins, valid=jnp.asarray(valid),
            dtype=jnp.int32, radix=radix,
        )
        b = hist_ops.bincount(
            jnp.asarray(ids), nbins, valid=jnp.asarray(valid),
            dtype=jnp.int32,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        flat_ids = ids.reshape(-1, shape[-1])
        flat_ok = (
            valid.reshape(-1, shape[-1]) & (flat_ids >= 0)
            & (flat_ids < nbins)
        )
        for r in range(flat_ids.shape[0]):
            ref = np.bincount(flat_ids[r][flat_ok[r]], minlength=nbins)
            np.testing.assert_array_equal(
                np.asarray(a).reshape(-1, nbins)[r], ref
            )
    # fractional weights keep the HIGHEST path and still agree
    ids = rng.integers(0, 361, size=(2, 4000)).astype(np.int32)
    w = rng.random((2, 4000)).astype(np.float32)
    aw = hist_ops.bincount(
        jnp.asarray(ids), 361, weights=jnp.asarray(w), radix=64
    )
    bw = hist_ops.bincount(jnp.asarray(ids), 361, weights=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(aw), np.asarray(bw), rtol=1e-6)
