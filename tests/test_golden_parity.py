"""Parity vs the compiled C reference (committed fixtures).

Fixtures in tests/fixtures/ were produced by streaming deterministic signals
(tests/signals.py) through a binary compiled from the unmodified reference
sources (tools/build_golden.sh + tools/gen_fixtures.py).  Each test streams
the same signal through the TPU implementation with identical block/read
cadence and asserts ±0.01 dB on every readout — the BASELINE.json parity
target.
"""

import glob
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from signals import make_signal
from meters_lv2_tpu.models import cor, ebur128, kmeter, needle, truepeak

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")

TOL_DB = 0.01


def _load(name):
    with open(os.path.join(FIXDIR, name)) as f:
        return json.load(f)


def _fixtures(prefix):
    out = []
    for p in sorted(glob.glob(os.path.join(FIXDIR, prefix + "_*.json"))):
        fx = _load(os.path.basename(p))
        if fx["meter"] == prefix:
            out.append(fx)
    return out


def _stream(fx):
    x = make_signal(fx["signal"], fx["seconds"], fs=fx["fs"])  # [2, T]
    if fx["nchan"] == 1:
        x = x[:1]
    return x


def _db(v):
    return 20 * np.log10(np.maximum(np.abs(np.asarray(v, np.float64)), 1e-12))


def assert_level(got, want, tol=TOL_DB, floor=1e-6, msg=""):
    got, want = float(got), float(want)
    if abs(want) < floor and abs(got) < floor:
        return
    assert abs(_db(got) - _db(want)) <= tol, f"{msg}: {got} vs {want}"


def _run_meter(fx, meter, reader):
    """Stream fixture signal; yield (read_record, our_read) pairs."""
    x = _stream(fx)
    block, re = fx["block"], fx["read_every"]
    st = meter.init((fx["nchan"],)) if reader == "per_chan" else meter.init(())
    upd = jax.jit(meter.update)
    nblocks = x.shape[1] // block
    reads = iter(fx["reads"])
    out = []
    for b in range(nblocks):
        xb = jnp.asarray(x[:, b * block : (b + 1) * block])
        st = upd(st, xb)
        if (b + 1) % re == 0:
            r, st = meter.read(st) if reader != "ref" else meter.read(st, -18.0)
            out.append((next(reads), r))
    return out, st


@pytest.mark.parametrize("kind", ["vu", "iec1", "iec2"])
def test_needle_parity(kind):
    cls = {"vu": needle.VUMeter, "iec1": needle.DINMeter, "iec2": needle.BBCMeter}[kind]
    for fx in _fixtures(kind):
        m = cls(fx["fs"])
        x = _stream(fx)
        st = m.init((2,))
        upd = jax.jit(m.update)
        reads = iter(fx["reads"])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                # golden read() has no rlgain; use ref -18 → gain 1
                vals, st = m.read(st, ref_level_db=-18.0)
                rec = next(reads)
                for c in range(2):
                    assert_level(
                        np.asarray(vals)[c], rec["values"][c],
                        msg=f"{kind}/{fx['signal']} blk {rec['block']} ch{c}",
                    )


def test_msppm_parity():
    for fx in _fixtures("msppm"):
        m = needle.BBCMidSideMeter(fx["fs"])
        x = _stream(fx)
        st = m.init(())
        upd = jax.jit(m.update)
        reads = iter(fx["reads"])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                vals, st = m.read(st, ref_level_db=-18.0)
                rec = next(reads)
                assert_level(vals["mid"], rec["values"][0],
                             msg=f"msppm/{fx['signal']} mid blk {rec['block']}")
                assert_level(vals["side"], rec["values"][1],
                             msg=f"msppm/{fx['signal']} side blk {rec['block']}")


def test_msppm_s20_toggle_parity():
    """Mid-stream S20 side-gain toggle (-6 -> +14 dB) matches the golden
    run that calls Msppmdsp::set_gain at the halfway block — and the
    toggle is a TRACED argument: one compiled program serves both modes
    (the BBCM6 wrapper reads port 7 every run(), src/meters.cc:577-580)."""
    fxs = _fixtures("msppm_s20")
    assert fxs, "msppm_s20 fixture missing"
    for fx in fxs:
        m = needle.BBCMidSideMeter(fx["fs"])
        x = _stream(fx)
        st = m.init(())
        upd = jax.jit(m.update)
        nblocks = x.shape[1] // fx["block"]
        reads = iter(fx["reads"])
        for b in range(nblocks):
            s20 = jnp.asarray(b >= nblocks // 2)  # traced, not static
            st = upd(st, jnp.asarray(
                x[:, b * fx["block"] : (b + 1) * fx["block"]]), s20)
            if (b + 1) % fx["read_every"] == 0:
                vals, st = m.read(st, ref_level_db=-18.0)
                rec = next(reads)
                assert_level(vals["mid"], rec["values"][0],
                             msg=f"s20/{fx['signal']} mid blk {rec['block']}")
                assert_level(vals["side"], rec["values"][1],
                             msg=f"s20/{fx['signal']} side blk {rec['block']}")
        # traced toggle => exactly one executable for update
        assert upd._cache_size() == 1


def test_kmeter_parity():
    for fx in _fixtures("kmeter"):
        m = kmeter.KMeter(fx["fs"])
        x = _stream(fx)
        st = m.init((2,))
        upd = jax.jit(m.update)
        reads = iter(fx["reads"])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                vals, st = m.read(st)
                rec = next(reads)
                for c in range(2):
                    assert_level(np.asarray(vals["rms"])[c], rec["values"][2 * c],
                                 msg=f"km/{fx['signal']} rms ch{c} blk {rec['block']}")
                    assert_level(np.asarray(vals["peak"])[c], rec["values"][2 * c + 1],
                                 msg=f"km/{fx['signal']} peak ch{c} blk {rec['block']}")


def test_truepeak_parity():
    for fx in _fixtures("truepeak"):
        m = truepeak.TruePeakMeter(fx["fs"])
        x = _stream(fx)
        st = m.init((2,))
        upd = jax.jit(m.update)
        reads = iter(fx["reads"])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                vals, st = m.read(st)
                rec = next(reads)
                for c in range(2):
                    assert_level(np.asarray(vals["level"])[c], rec["values"][2 * c],
                                 msg=f"tp/{fx['signal']} lvl ch{c} blk {rec['block']}")
                    assert_level(np.asarray(vals["peak"])[c], rec["values"][2 * c + 1],
                                 msg=f"tp/{fx['signal']} peak ch{c} blk {rec['block']}")


def test_stcorr_parity():
    for fx in _fixtures("stcorr"):
        m = cor.CorrelationMeter(fx["fs"])
        x = _stream(fx)
        st = m.init(())
        upd = jax.jit(m.update)
        reads = iter(fx["reads"])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                v, st = m.read(st)
                rec = next(reads)
                assert abs(float(v) - rec["values"][0]) < 2e-3, (
                    f"stcorr/{fx['signal']} blk {rec['block']}: {float(v)} vs {rec['values'][0]}"
                )


@pytest.mark.parametrize("prefix", ["ebur128", "ebur128mono", "ebur128_aligned"])
def test_ebur128_parity(prefix):
    for fx in _fixtures(prefix):
        m = ebur128.EbuR128Meter(fx["fs"], nchan=fx["nchan"])
        x = _stream(fx)
        st = m.init(())
        upd = jax.jit(m.update)
        rd = jax.jit(m.read)
        mid = [r for r in fx["reads"] if "final" not in r]
        final = [r for r in fx["reads"] if r.get("final")][0]
        it = iter(mid)
        aligned = prefix == "ebur128_aligned"
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                out, _ = rd(st)
                rec = next(it)
                for key, mine in [
                    ("M", "loudness_M"), ("S", "loudness_S"),
                    ("maxM", "max_M"), ("maxS", "max_S"),
                ]:
                    g, o = rec[key], float(out[mine])
                    if g <= -199.0:
                        assert o <= -199.0, (key, o, g)
                    else:
                        assert abs(o - g) < TOL_DB, (
                            f"{prefix}/{fx['signal']} {key} blk {rec['block']}: {o} vs {g}"
                        )
                if aligned:
                    for key, mine in [("I", "integrated"),
                                      ("LRAmin", "range_min"), ("LRAmax", "range_max")]:
                        g, o = rec[key], float(out[mine])
                        if g <= -199.0:
                            assert o <= -199.0, (key, o, g)
                        else:
                            assert abs(o - g) < TOL_DB, (
                                f"{prefix}/{fx['signal']} {key} blk {rec['block']}: {o} vs {g}"
                            )
        # final: exact histogram + count parity (gating inputs identical)
        np.testing.assert_array_equal(np.asarray(st.hist_m), final["histM"],
                                      err_msg=f"{prefix}/{fx['signal']} histM")
        np.testing.assert_array_equal(np.asarray(st.hist_s), final["histS"],
                                      err_msg=f"{prefix}/{fx['signal']} histS")
        assert int(st.count_m) == final["countM"]
        assert int(st.count_s) == final["countS"]


@pytest.mark.parametrize("prefix", ["spectrum", "spectrum_96k"])
def test_spectrum_parity(prefix):
    # 96 kHz is the precision worst case: the 25 Hz band's poles sit
    # closest to the unit circle there (spectr.c bilinear design)
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer

    fxs = _fixtures(prefix)
    assert fxs, f"no {prefix} fixtures found"
    for fx in fxs:
        m = SpectrumAnalyzer(fx["fs"])
        x = _stream(fx)
        st = m.init(())
        upd = jax.jit(lambda s, xb: m.update(s, xb, stereo=True))
        reads = iter(fx["reads"])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                out, _ = m.read(st)
                rec = next(reads)
                bands = np.asarray(out["bands"])
                peaks = np.asarray(out["peaks"])
                for i in range(30):
                    for got, want, tag in [
                        (bands[i], rec["bands"][i], "band"),
                        (peaks[i], rec["peaks"][i], "peak"),
                    ]:
                        if want <= -99.9:
                            assert got <= -99.0, (tag, i, got, want)
                        else:
                            # the BASELINE.json +-0.01 dB budget: the banked
                            # modal-balanced LTI holds the high-Q low bands
                            # to ~0.0013 dB worst in f32
                            assert abs(got - want) < TOL_DB, (
                                f"spectrum/{fx['signal']} {tag} {i} "
                                f"blk {rec['block']}: {got} vs {want}"
                            )


def test_block_size_invariance():
    """Same meters at very different process() cadences vs the reference."""
    for fx in _fixtures("vu_blk4096"):
        m = needle.VUMeter(fx["fs"])
        x = _stream(fx)
        st = m.init((2,))
        upd = jax.jit(m.update)
        reads = iter(fx["reads"])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                vals, st = m.read(st, ref_level_db=-18.0)
                rec = next(reads)
                for c in range(2):
                    assert_level(np.asarray(vals)[c], rec["values"][c],
                                 msg=f"vu4096 blk {rec['block']} ch{c}")
    for fx in _fixtures("kmeter_blk512"):
        m = kmeter.KMeter(fx["fs"])
        x = _stream(fx)
        st = m.init((2,))
        upd = jax.jit(m.update)
        reads = iter(fx["reads"])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                vals, st = m.read(st)
                rec = next(reads)
                for c in range(2):
                    assert_level(np.asarray(vals["rms"])[c], rec["values"][2 * c],
                                 msg=f"km512 rms ch{c} blk {rec['block']}")
                    assert_level(np.asarray(vals["peak"])[c], rec["values"][2 * c + 1],
                                 msg=f"km512 peak ch{c} blk {rec['block']}")
    for fx in _fixtures("ebur128_blk4096"):
        m = ebur128.EbuR128Meter(fx["fs"], nchan=2)
        x = _stream(fx)
        st = m.init(())
        upd = jax.jit(m.update)
        final = [r for r in fx["reads"] if r.get("final")][0]
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
        np.testing.assert_array_equal(np.asarray(st.hist_m), final["histM"])
        np.testing.assert_array_equal(np.asarray(st.hist_s), final["histS"])


def test_parity_441khz():
    """44.1 kHz fixtures: every coefficient rescales (fragm=2205, etc.)."""
    for fx in _fixtures("truepeak_44k"):
        m = truepeak.TruePeakMeter(fx["fs"])
        x = _stream(fx)
        st = m.init((2,))
        upd = jax.jit(m.update)
        reads = iter(fx["reads"])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                vals, st = m.read(st)
                rec = next(reads)
                for c in range(2):
                    assert_level(np.asarray(vals["level"])[c], rec["values"][2 * c],
                                 msg=f"tp44k lvl ch{c} blk {rec['block']}")
                    assert_level(np.asarray(vals["peak"])[c], rec["values"][2 * c + 1],
                                 msg=f"tp44k peak ch{c} blk {rec['block']}")
    for fx in _fixtures("ebur128_44k"):
        m = ebur128.EbuR128Meter(fx["fs"], nchan=2)
        x = _stream(fx)
        st = m.init(())
        upd = jax.jit(m.update)
        rd = jax.jit(m.read)
        mid = [r for r in fx["reads"] if "final" not in r]
        final = [r for r in fx["reads"] if r.get("final")][0]
        it = iter(mid)
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                out, _ = rd(st)
                rec = next(it)
                for key, mine in [("M", "loudness_M"), ("S", "loudness_S")]:
                    g, o = rec[key], float(out[mine])
                    if g > -199.0:
                        assert abs(o - g) < TOL_DB, (key, o, g, rec["block"])
        np.testing.assert_array_equal(np.asarray(st.hist_m), final["histM"])
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer

    for fx in _fixtures("spectrum_44k"):
        m = SpectrumAnalyzer(fx["fs"])
        x = _stream(fx)
        st = m.init(())
        upd = jax.jit(lambda s, xb: m.update(s, xb, stereo=True))
        reads = iter(fx["reads"])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                out, _ = m.read(st)
                rec = next(reads)
                bands = np.asarray(out["bands"])
                for i in range(30):
                    want = rec["bands"][i]
                    if want > -99.9:
                        assert abs(bands[i] - want) < TOL_DB, (i, bands[i], want)
    # ballistics coefficient rescaling (w1/w2/w3 = f(fs))
    for kind, cls in [("vu_44k", needle.VUMeter), ("iec1_44k", needle.DINMeter),
                      ("iec2_44k", needle.BBCMeter)]:
        for fx in _fixtures(kind):
            m = cls(fx["fs"])
            x = _stream(fx)
            st = m.init((2,))
            upd = jax.jit(m.update)
            reads = iter(fx["reads"])
            for b in range(x.shape[1] // fx["block"]):
                st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
                if (b + 1) % fx["read_every"] == 0:
                    vals, st = m.read(st, ref_level_db=-18.0)
                    rec = next(reads)
                    for c in range(2):
                        assert_level(np.asarray(vals)[c], rec["values"][c],
                                     msg=f"{kind} blk {rec['block']} ch{c}")
    for fx in _fixtures("kmeter_44k"):
        m = kmeter.KMeter(fx["fs"])
        x = _stream(fx)
        st = m.init((2,))
        upd = jax.jit(m.update)
        reads = iter(fx["reads"])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                vals, st = m.read(st)
                rec = next(reads)
                for c in range(2):
                    assert_level(np.asarray(vals["rms"])[c], rec["values"][2 * c],
                                 msg=f"km44k rms ch{c} blk {rec['block']}")
                    assert_level(np.asarray(vals["peak"])[c], rec["values"][2 * c + 1],
                                 msg=f"km44k peak ch{c} blk {rec['block']}")


def test_ebur128_5channel_parity():
    """5.0 surround: channel gains {1,1,1,1.41,1.41} vs the C reference."""
    from signals import make_surround

    for fx in _fixtures("ebur128_5ch"):
        m = ebur128.EbuR128Meter(fx["fs"], nchan=5)
        x = make_surround(fx["signal"], fx["seconds"], fs=fx["fs"])
        st = m.init(())
        upd = jax.jit(m.update)
        rd = jax.jit(m.read)
        mid = [r for r in fx["reads"] if "final" not in r]
        final = [r for r in fx["reads"] if r.get("final")][0]
        it = iter(mid)
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                out, _ = rd(st)
                rec = next(it)
                for key, mine in [("M", "loudness_M"), ("S", "loudness_S"),
                                  ("I", "integrated")]:
                    g, o = rec[key], float(out[mine])
                    if g > -199.0:
                        assert abs(o - g) < TOL_DB, (key, o, g, rec["block"])
        np.testing.assert_array_equal(np.asarray(st.hist_m), final["histM"])
        np.testing.assert_array_equal(np.asarray(st.hist_s), final["histS"])


@pytest.mark.parametrize("prefix", ["dr14", "dr14mono", "dr14_44k", "dr14_96k"])
def test_dr14_parity(prefix):
    """DR-14 vs the compiled reference (src/dr14.c measurement loop linked
    with the reference Kmeterdsp/TruePeakdsp in the golden CLI)."""
    from meters_lv2_tpu.models.dr14 import DR14Meter

    for fx in _fixtures(prefix):
        m = DR14Meter(fx["fs"], nchan=fx["nchan"])
        x = _stream(fx)
        st = m.init(())
        upd = jax.jit(m.update)
        mid = [r for r in fx["reads"] if "final" not in r]
        final = [r for r in fx["reads"] if r.get("final")][0]
        it = iter(mid)
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                out, st = m.read(st)
                rec = next(it)
                tag = f"{prefix}/{fx['signal']} blk {rec['block']}"
                for c in range(fx["nchan"]):
                    for key in ("v_rms", "v_peak", "m_peak", "m_rms", "dr"):
                        got = float(np.asarray(out[key])[c])
                        want = rec["ch"][c][key]
                        assert abs(got - want) <= TOL_DB, (tag, key, c, got, want)
                if fx["nchan"] > 1:
                    got = float(out["dr_total"])
                    assert abs(got - rec["dr_total"]) <= TOL_DB, (tag, got, rec)
                assert float(out["block_count"]) == rec["block_count"], tag
        # exact structural parity: histograms, window count, top-2 peaks
        assert int(st.num_windows) == final["num_fragments"], fx["signal"]
        h = np.asarray(st.hist)
        g = np.asarray(final["hist"])
        if fx["fs"] >= 96000 and not np.array_equal(h, g):
            # the reference accumulates rms_sum in SEQUENTIAL f32
            # (dr14.c:86); at 96 kHz a 3 s window sums 288001 squares and
            # a window whose true RMS sits on a 0.01 dB bin edge can land
            # one bin apart from our blocked f32 sum.  Allow exactly one
            # adjacent-bin transfer (documented in docs/PARITY.md; the
            # m_rms/DR impact is <= 0.01 dB, inside TOL_DB).
            d = (h.astype(np.int64) - g).reshape(-1, h.shape[-1])
            bad = [np.nonzero(r)[0] for r in d]
            moved = sum(len(b) for b in bad)
            assert moved <= 2, (fx["signal"], moved)
            for r, b in zip(d, bad):
                if len(b):
                    assert len(b) == 2 and b[1] - b[0] == 1, (fx["signal"], b)
                    assert r[b[0]] + r[b[1]] == 0 and abs(r[b[0]]) == 1
        else:
            np.testing.assert_array_equal(h, g, err_msg=fx["signal"])
        np.testing.assert_allclose(
            np.asarray(st.peak_top2), np.asarray(final["peak_top2"]),
            rtol=1e-6, atol=1e-9, err_msg=fx["signal"],
        )


def test_tpnrms_parity():
    from meters_lv2_tpu.models.dr14 import TPnRMSMeter

    for fx in _fixtures("tpnrms"):
        m = TPnRMSMeter(fx["fs"], nchan=fx["nchan"])
        x = _stream(fx)
        st = m.init(())
        upd = jax.jit(m.update)
        it = iter([r for r in fx["reads"] if "final" not in r])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                out, st = m.read(st)
                rec = next(it)
                for c in range(fx["nchan"]):
                    for key in ("v_rms", "v_peak", "m_peak", "m_rms"):
                        got = float(np.asarray(out[key])[c])
                        want = rec["ch"][c][key]
                        assert abs(got - want) <= TOL_DB, (
                            fx["signal"], rec["block"], key, c, got, want)


def _run_sigdist_fixture(fx, **meter_kw):
    """Stream a sigdist fixture; returns the worst |hist_var| rel error."""
    from meters_lv2_tpu.models.sigdist import SigDistMeter

    m = SigDistMeter(fx["fs"], **meter_kw)
    x = _stream(fx)[0]  # reference meters channel 0 only
    st = m.init(())
    upd = jax.jit(m.update)
    mid = [r for r in fx["reads"] if "final" not in r]
    final = [r for r in fx["reads"] if r.get("final")][0]
    it = iter(mid)
    worst_var_rel = 0.0
    for b in range(len(x) // fx["block"]):
        st = upd(st, jnp.asarray(x[b * fx["block"] : (b + 1) * fx["block"]]))
        if (b + 1) % fx["read_every"] == 0:
            out, st = m.read(st)
            rec = next(it)
            assert int(out["hist_max"]) == rec["hist_max"], rec["block"]
            # peak-bin ties: reference keeps first-to-reach; we take
            # argmax — assert our bin holds the max count
            pb = int(out["hist_peak_bin"])
            assert int(np.asarray(out["hist"])[pb]) == rec["hist_max"]
            assert int(out["integration_time"]) == rec["time"]
            np.testing.assert_allclose(
                float(out["hist_avg"]), rec["hist_avg"], rtol=1e-3, atol=0.1)
            worst_var_rel = max(
                worst_var_rel,
                abs(float(out["hist_var"]) - rec["hist_var"])
                / max(abs(rec["hist_var"]), 1e-3),
            )
    np.testing.assert_array_equal(
        np.asarray(st.hist), np.asarray(final["hist"]),
        err_msg=fx["signal"],
    )
    return worst_var_rel


def test_sigdist_parity():
    """361-bin histogram exact; running avg / Welford variance vs the
    reference's sequential double-precision loop (sigdistlv2.c:298-326)."""
    for fx in _fixtures("sigdist"):
        assert _run_sigdist_fixture(fx) <= 1e-3, fx["signal"]


def test_sigdist_oor_quirk_parity():
    """Out-of-range Welford count quirk (sigdistlv2.c:316-318): on material
    exceeding the ±1.2 bin span, `reference_oor_count=True` must reproduce
    the reference's inflated-count variance; the default (accepted-count)
    mode must measurably diverge — proving the fixture exercises the quirk."""
    fixtures = _fixtures("sigdist_oor")
    assert fixtures, "sigdist_oor golden fixture missing"
    for fx in fixtures:
        quirk = _run_sigdist_fixture(fx, reference_oor_count=True)
        plain = _run_sigdist_fixture(fx)  # accepted-count denominator
        # quirk-exact mode tracks the f64 golden at f32 precision (~3e-7
        # measured); the accepted-count mode carries a systematic bias two
        # orders larger (~5e-5 on this near-zero-mean signal)
        assert quirk <= 1e-5, (fx["signal"], quirk)
        assert plain > 30 * quirk, (fx["signal"], plain, quirk)


def test_bitmeter_parity():
    """IEEE-754 field statistics: exact integer equality of every counter
    region vs the reference float_stats loop (bitmeter.c:63-105)."""
    from meters_lv2_tpu.models.bitmeter import BitMeter

    for fx in _fixtures("bitmeter"):
        m = BitMeter(fx["fs"])
        x = _stream(fx)[0]
        st = m.init(())
        upd = jax.jit(m.update)
        for b in range(len(x) // fx["block"]):
            st = upd(st, jnp.asarray(x[b * fx["block"] : (b + 1) * fx["block"]]))
        final = [r for r in fx["reads"] if r.get("final")][0]
        out, _ = m.read(st)
        histS = np.asarray(final["histS"])
        sig = fx["signal"]
        np.testing.assert_array_equal(np.asarray(out["hit"]), histS[0:280], err_msg=sig)
        np.testing.assert_array_equal(np.asarray(out["one"]), histS[280:560], err_msg=sig)
        np.testing.assert_array_equal(np.asarray(out["dset"]), histS[560:583], err_msg=sig)
        for key in ("zero", "pos", "nan", "inf", "den"):
            assert int(out[key]) == final[key], (sig, key, int(out[key]), final[key])
        assert int(out["integration_time"]) == final["time"], sig
        np.testing.assert_allclose(float(out["max"]), final["max"], rtol=1e-6)
        np.testing.assert_allclose(float(out["min"]), final["min"], rtol=1e-6)


def test_ebur128_reference_radar_parity():
    """reference_radar=True reproduces the wrapper's radar ring VERBATIM
    (block-rate sampling, one point per run(), radarSC lm-gate quirk —
    src/ebulv2.cc:390-421) so rings golden-diff against the reference;
    the default fragment-rate semantics stay documented as a deliberate
    deviation (docs/PARITY.md)."""
    for fx in _fixtures("ebur128"):
        if fx["nchan"] != 2:
            continue
        m = ebur128.EbuR128Meter(fx["fs"], nchan=2, reference_radar=True)
        x = _stream(fx)
        st = m.init(())
        upd = jax.jit(m.update)
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
        final = [r for r in fx["reads"] if r.get("final")][0]
        assert int(st.radar_pos) == final["radarPos"], fx["signal"]
        got_m = np.asarray(st.radar_m)
        got_s = np.asarray(st.radar_s)
        want_m = np.asarray(final["radarM"])  # -999 encodes -inf
        want_s = np.asarray(final["radarS"])
        for got, want, tag in ((got_m, want_m, "M"), (got_s, want_s, "S")):
            unset = want <= -998.0
            assert np.all(np.isneginf(got[unset])), (fx["signal"], tag)
            np.testing.assert_allclose(
                got[~unset], want[~unset], atol=5e-4,
                err_msg=f"{fx['signal']} radar{tag}",
            )


def test_ebur128_cadence_500ms_parity():
    """With cadence_500ms reads, I and LRA match the reference's CACHED
    values even at unaligned block sizes (the reference recomputes them
    every 10th fragment, ebu_r128_proc.cc:240-243; the plain ebur128
    fixtures read at block 1024 x 16, far from S-point boundaries)."""
    for fx in _fixtures("ebur128"):
        m = ebur128.EbuR128Meter(fx["fs"], nchan=fx["nchan"], track_cadence=True)
        x = _stream(fx)
        st = m.init(())
        upd = jax.jit(m.update)
        rd = jax.jit(lambda s: m.read(s, cadence_500ms=True))
        mid = [r for r in fx["reads"] if "final" not in r]
        it = iter(mid)
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                out, _ = rd(st)
                rec = next(it)
                for key, mine in [("I", "integrated"),
                                  ("LRAmin", "range_min"),
                                  ("LRAmax", "range_max")]:
                    g, o = rec[key], float(out[mine])
                    if g > -199.0:
                        assert abs(o - g) < TOL_DB, (
                            fx["signal"], key, o, g, rec["block"])
                    else:
                        assert o <= -199.0, (fx["signal"], key, o, g)


@pytest.mark.parametrize("prefix", ["surround3", "surround5", "surround7",
                                    "surround8"])
def test_surround_parity(prefix):
    """surround3..8 vs the compiled reference composition (surmeter.c:
    50-160: N Kmeterdsp + (N>3 ? 4 : 3) Stcorrdsp, adjacent routing with
    wrap-around, cor init (2e3, 0.3))."""
    from signals import make_surround
    from meters_lv2_tpu.models import base as model_base

    for fx in _fixtures(prefix):
        C = fx["nchan"]
        m = model_base.create(f"surround{C}", fx["fs"])
        x = make_surround(fx["signal"], fx["seconds"], fs=fx["fs"], nchan=C)
        st = m.init(())
        upd = jax.jit(m.update)
        reads = iter(fx["reads"])
        npairs = 4 if C > 3 else 3
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                out, st = m.read(st)
                rec = next(reads)
                for c in range(C):
                    assert_level(np.asarray(out["level"])[c], rec["rms"][c],
                                 msg=f"sur{C} rms ch{c} blk {rec['block']}")
                    assert_level(np.asarray(out["peak"])[c], rec["peak"][c],
                                 msg=f"sur{C} peak ch{c} blk {rec['block']}")
                for c in range(npairs):
                    g = rec["cor"][c]
                    o = float(np.asarray(out["correlation"])[c])
                    assert abs(o - g) < 1e-3, (c, o, g, rec["block"])


def test_parity_96khz():
    """96 kHz fixtures: high-rate coefficient rescaling (fragm = 4800,
    4x-oversampled true peak at 384 kHz, ballistics w = f(fs))."""
    # needle/K ballistics at 96 kHz (mirrors the 44.1 kHz coverage)
    for kind, cls in [("vu_96k", needle.VUMeter),
                      ("iec2_96k", needle.BBCMeter)]:
        for fx in _fixtures(kind):
            m = cls(fx["fs"])
            x = _stream(fx)
            st = m.init((2,))
            upd = jax.jit(m.update)
            reads = iter(fx["reads"])
            for b in range(x.shape[1] // fx["block"]):
                st = upd(st, jnp.asarray(
                    x[:, b * fx["block"] : (b + 1) * fx["block"]]))
                if (b + 1) % fx["read_every"] == 0:
                    vals, st = m.read(st, ref_level_db=-18.0)
                    rec = next(reads)
                    for c in range(2):
                        assert_level(np.asarray(vals)[c], rec["values"][c],
                                     msg=f"{kind} blk {rec['block']} ch{c}")
    for fx in _fixtures("kmeter_96k"):
        m = kmeter.KMeter(fx["fs"])
        x = _stream(fx)
        st = m.init((2,))
        upd = jax.jit(m.update)
        reads = iter(fx["reads"])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(
                x[:, b * fx["block"] : (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                vals, st = m.read(st)
                rec = next(reads)
                for c in range(2):
                    assert_level(np.asarray(vals["rms"])[c],
                                 rec["values"][2 * c],
                                 msg=f"km96k rms ch{c} blk {rec['block']}")
                    assert_level(np.asarray(vals["peak"])[c],
                                 rec["values"][2 * c + 1],
                                 msg=f"km96k peak ch{c} blk {rec['block']}")
    for fx in _fixtures("truepeak_96k"):
        m = truepeak.TruePeakMeter(fx["fs"])
        x = _stream(fx)
        st = m.init((2,))
        upd = jax.jit(m.update)
        reads = iter(fx["reads"])
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"]: (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                vals, st = m.read(st)
                rec = next(reads)
                for c in range(2):
                    assert_level(np.asarray(vals["level"])[c],
                                 rec["values"][2 * c],
                                 msg=f"tp96k lvl ch{c} blk {rec['block']}")
                    assert_level(np.asarray(vals["peak"])[c],
                                 rec["values"][2 * c + 1],
                                 msg=f"tp96k peak ch{c} blk {rec['block']}")
    for fx in _fixtures("ebur128_96k"):
        m = ebur128.EbuR128Meter(fx["fs"], nchan=2)
        x = _stream(fx)
        st = m.init(())
        upd = jax.jit(m.update)
        rd = jax.jit(m.read)
        mid = [r for r in fx["reads"] if "final" not in r]
        final = [r for r in fx["reads"] if r.get("final")][0]
        it = iter(mid)
        for b in range(x.shape[1] // fx["block"]):
            st = upd(st, jnp.asarray(x[:, b * fx["block"]: (b + 1) * fx["block"]]))
            if (b + 1) % fx["read_every"] == 0:
                out, _ = rd(st)
                rec = next(it)
                for key, mine in [("M", "loudness_M"), ("S", "loudness_S")]:
                    g, o = rec[key], float(out[mine])
                    if g > -199.0:
                        assert abs(o - g) < TOL_DB, (key, o, g, rec["block"])
        np.testing.assert_array_equal(np.asarray(st.hist_m), final["histM"])
        np.testing.assert_array_equal(np.asarray(st.hist_s), final["histS"])
