"""Live streaming shell (meters_lv2_tpu.live): engine semantics, transport
controls, and the embedded dashboard server — the capability analog of the
reference's standalone JACK apps (Makefile:281-446) and the EBU GUI button
row (gui/ebur.c integr start/pause/reset)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from meters_lv2_tpu.live import LiveEngine, feed_file, make_server
from tests.signals import make_signal

FS = 48000


def _stereo(seconds=1.0):
    return make_signal("sine997", seconds)  # [2, T], −18/−20 dBFS tones


@pytest.fixture(scope="module")
def engine():
    eng = LiveEngine(["r128", "truepeak", "vu", "goniometer"], FS, 2)
    feed_file(eng, _stereo(1.0), FS, chunk=FS // 2, speed=0.0)
    return eng


def test_engine_feed_and_snapshot(engine):
    assert engine.fed_samples == FS
    outs = engine.snapshot()
    assert set(outs) == {"r128", "truepeak", "vu", "goniometer"}
    # momentary loudness of the −18/−20 dBFS tone pair is in a sane band
    # (K-weighting ≈ 0 dB at 1 kHz, +sum of the two channels)
    m = float(outs["r128"]["loudness_M"])
    assert -20.0 < m < -12.0
    assert float(np.max(outs["truepeak"]["peak"])) > 0.05
    assert outs["goniometer"]["x"].shape[-1] > 0


def test_frame_png_and_cache(engine):
    png = engine.frame("r128")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert engine.frame("r128") is png  # same generation -> cached bytes
    for n in ("truepeak", "vu", "goniometer"):
        assert engine.frame(n)[:8] == b"\x89PNG\r\n\x1a\n"
    engine.feed(np.zeros((2, 4), np.float32))
    assert engine.frame("r128") is not png  # new generation re-renders


def test_integration_pause_and_reset():
    eng = LiveEngine(["r128"], FS, 2)
    blk = _stereo(0.5)
    eng.feed(blk)
    n1 = int(np.asarray(eng._state["r128"].n_lo))
    eng.control("pause")
    eng.feed(blk)
    assert int(np.asarray(eng._state["r128"].n_lo)) == n1  # frozen
    eng.control("start")
    eng.feed(blk)
    assert int(np.asarray(eng._state["r128"].n_lo)) == 2 * n1
    eng.control("reset")
    assert int(np.asarray(eng._state["r128"].n_lo)) == 0


def test_reset_reinits_other_meters():
    eng = LiveEngine(["vu"], FS, 2)
    eng.feed(_stereo(0.5))
    assert float(np.max(np.asarray(eng._read_one("vu")))) > 1e-4
    eng.control("reset")
    out = eng._read_one("vu")
    assert float(np.max(np.abs(np.asarray(out)))) < 1e-4


def test_reset_clears_radar_ring():
    """GUI RESET (ebu_reset, src/ebulv2.cc:45-60) clears the radar ring
    and position but — reference quirk — carries the open interval's
    sample counter and running maxima (only instantiate clears those)."""
    eng = LiveEngine(["r128"], FS, 2)
    for _ in range(3):  # 3 s at 16000-sample radar interval = 9 points
        eng.feed(_stereo(1.0))
    st = eng._state["r128"]
    assert float(np.max(np.asarray(st.radar_m))) > -np.inf
    spd_cur = int(np.asarray(st.radar_spd_cur))
    eng.control("reset")
    st = eng._state["r128"]
    assert np.all(np.isneginf(np.asarray(st.radar_m)))
    assert np.all(np.isneginf(np.asarray(st.radar_s)))
    assert int(np.asarray(st.radar_pos)) == 0
    assert int(np.asarray(st.radar_spd_cur)) == spd_cur  # interval carries


def test_radar_reset_control_clears_ring_only():
    """CTL_RESETRADAR analog: clears the ring without touching the
    integration counters."""
    eng = LiveEngine(["r128"], FS, 2)
    for _ in range(3):
        eng.feed(_stereo(1.0))
    n1 = int(np.asarray(eng._state["r128"].n_lo))
    assert n1 > 0
    eng.control("reset_radar")
    st = eng._state["r128"]
    assert np.all(np.isneginf(np.asarray(st.radar_m)))
    assert int(np.asarray(st.n_lo)) == n1  # integration untouched


def test_reset_reapplies_runtime_ports():
    """LV2 control ports are host-held and re-read every run(): a reset
    (plugin-reinstantiation analog) must not revert runtime-set values."""
    eng = LiveEngine(["spectrum"], FS, 2)
    om0 = float(np.asarray(eng._state["spectrum"].omega))
    eng.set_port("spectrum", "speed", 8.0)
    om8 = float(np.asarray(eng._state["spectrum"].omega))
    assert om8 != om0
    eng.control("reset")
    assert float(np.asarray(eng._state["spectrum"].omega)) == om8


def test_feed_never_measures_padding():
    """Padding-never-measured: a non-4-aligned block is measured only to
    its 4-aligned prefix; fed_samples reports real audio exactly."""
    eng = LiveEngine(["r128"], FS, 2)
    sig = _stereo(0.5)[:, : FS // 2 - 3]  # T % 4 == 1
    eng.feed(sig)
    assert eng.fed_samples == sig.shape[-1]
    n = int(np.asarray(eng._state["r128"].n_lo))
    assert n == sig.shape[-1] // 4 * 4


def test_feed_file_exact_length():
    eng = LiveEngine(["r128"], FS, 2)
    sig = _stereo(1.0)[:, : FS - 2]
    feed_file(eng, sig, FS, chunk=FS // 4, speed=0.0)
    assert eng.fed_samples == FS - 2


def test_s20_port_toggles_side_gain_without_recompile():
    """BBC M-6 s20 port (src/meters.cc:562-563): side gain -6 -> +14 dB
    mid-stream through ONE compiled update program."""
    eng = LiveEngine(["bbcms"], FS, 2)
    sig = _stereo(0.5)
    side_sig = np.stack([sig[0], -sig[0]])  # pure side content
    eng.feed(side_sig)
    lo = float(np.asarray(eng._read_one("bbcms")["side"]))
    eng.set_port("bbcms", "s20", 1)
    # steady-state: feed enough for the ballistics to re-settle
    for _ in range(4):
        eng.feed(side_sig)
    hi = float(np.asarray(eng._read_one("bbcms")["side"]))
    np.testing.assert_allclose(hi / lo, 10.0, rtol=0.05)  # +20 dB
    assert eng._update._cache_size() == 1  # traced port: no recompile


def test_spectrum_and_radar_ports():
    eng = LiveEngine(["spectrum", "r128"], FS, 2)
    om0 = float(np.asarray(eng._state["spectrum"].omega))
    eng.set_port("spectrum", "speed", 8.0)
    assert float(np.asarray(eng._state["spectrum"].omega)) > om0
    spd0 = int(np.asarray(eng._state["r128"].radar_spd))
    eng.set_port("r128", "radar_seconds", 240.0)
    assert int(np.asarray(eng._state["r128"].radar_spd)) == 2 * spd0
    with pytest.raises(ValueError):
        eng.set_port("spectrum", "nope", 1.0)
    with pytest.raises(ValueError):
        eng.set_port("vu", "speed", 1.0)  # meter not in this engine


def test_http_set_port_endpoint():
    eng = LiveEngine(["spectrum"], FS, 2)
    srv = make_server(eng, port=0, fps=5.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        om0 = float(np.asarray(eng._state["spectrum"].omega))
        r = urllib.request.urlopen(
            f"{base}/ctl?action=set&meter=spectrum&param=speed&value=9.0")
        assert r.read() == b"ok"
        assert float(np.asarray(eng._state["spectrum"].omega)) > om0
        ports = json.loads(urllib.request.urlopen(f"{base}/ports").read())
        assert ports["spectrum.speed"] == 9.0
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"{base}/ctl?action=set&meter=spectrum&param=zz&value=1")
        assert ei.value.code == 500
    finally:
        srv.shutdown()


def test_session_save_resume(tmp_path):
    """Session checkpoint round-trip: a resumed engine carries the full
    measurement state (histograms, ring, sample count, control ports) and
    integration continues seamlessly — strictly more than the reference's
    LV2 State persistence (src/ebulv2.cc:514-553, ui prefs only)."""
    path = str(tmp_path / "session.npz")
    blk = _stereo(1.0)
    a = LiveEngine(["r128", "bbcms", "goniometer"], FS, 2)
    a.set_port("bbcms", "s20", 1)
    for _ in range(5):
        a.feed(blk)
    a.save(path)
    for _ in range(5):
        a.feed(blk)
    ref = a.snapshot()

    b = LiveEngine(["r128", "bbcms", "goniometer"], FS, 2)
    b.load(path)
    assert b.fed_samples == 5 * FS
    assert bool(b._controls["bbcms"]["s20"])  # port value restored
    assert b._port_values[("bbcms", "s20")] == 1.0  # host port view too
    for _ in range(5):
        b.feed(blk)
    got = b.snapshot()
    for n in ref:
        for k in ref[n]:
            np.testing.assert_array_equal(
                np.asarray(got[n][k]), np.asarray(ref[n][k]),
                err_msg=f"{n}.{k}")


def test_http_save_load_endpoints(tmp_path):
    path = str(tmp_path / "s.npz")
    eng = LiveEngine(["vu"], FS, 2)
    eng.feed(_stereo(0.5))
    srv = make_server(eng, port=0, fps=5.0, state_file=path)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        assert urllib.request.urlopen(f"{base}/save").read() == b"ok"
        v1 = float(np.max(np.asarray(eng._read_one("vu"))))
        eng.control("reset")
        assert urllib.request.urlopen(f"{base}/load").read() == b"ok"
        v2 = float(np.max(np.asarray(eng._read_one("vu"))))
        assert v1 == v2 and v1 > 1e-4
    finally:
        srv.shutdown()
    srv2 = make_server(eng, port=0, fps=5.0)  # no state file -> 400
    threading.Thread(target=srv2.serve_forever, daemon=True).start()
    base2 = f"http://127.0.0.1:{srv2.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base2}/save")
        assert ei.value.code == 400
    finally:
        srv2.shutdown()


def test_save_extensionless_path_roundtrip(tmp_path):
    """save/load are symmetric for paths without a .npz suffix (np.savez
    alone would append .npz on write but not on read)."""
    import os

    path = str(tmp_path / "session")  # no extension
    eng = LiveEngine(["vu"], FS, 2)
    eng.feed(_stereo(0.5))
    eng.save(path)
    assert os.path.exists(path)  # exactly the configured --state-file
    eng2 = LiveEngine(["vu"], FS, 2)
    eng2.load(path)
    assert eng2.fed_samples == eng.fed_samples


def test_load_rejects_mismatched_config(tmp_path):
    """A checkpoint from a different meter set must be rejected, not
    positionally mapped into the wrong state slots."""
    path = str(tmp_path / "s.npz")
    a = LiveEngine(["r128", "vu"], FS, 2)
    a.feed(_stereo(0.5))
    a.save(path)
    b = LiveEngine(["vu"], FS, 2)
    with pytest.raises(ValueError):
        b.load(path)


def test_ref_level_port_scales_needles():
    """The needle meters' reference-level port (src/meters.cc:303-306
    rlgain = 10^(0.05*(refl+18)), lv2ttl default -22) is a live host
    port: set_port scales the next readout without recompiling."""
    eng = LiveEngine(["vu", "din"], FS, 2)
    eng.feed(_stereo(0.5))
    v22 = np.asarray(eng._read_one("vu"))
    d22 = np.asarray(eng._read_one("din"))
    eng.set_port("vu", "ref_level_db", -18.0)
    v18 = np.asarray(eng._read_one("vu"))
    np.testing.assert_allclose(v18 / v22, 10.0 ** 0.2, rtol=1e-5)
    # only the written meter's dial moved
    np.testing.assert_array_equal(np.asarray(eng._read_one("din")), d22)
    assert eng._read._cache_size() == 1  # traced scalar: no recompile


def test_reset_peak_control_clears_hold_only():
    """K-meter ref-level-port edge = peak-hold reset (src/meters.cc:
    337-357): the held digital peak clears, the RMS needle state does
    not."""
    eng = LiveEngine(["k20"], FS, 2)
    eng.feed(_stereo(1.0))
    out = eng._read_one("k20")
    pk, rms = float(np.max(out["peak"])), float(np.max(out["rms"]))
    assert pk > 0.05 and rms > 0.01
    eng.control("reset_peak")
    out = eng._read_one("k20")
    assert float(np.max(out["peak"])) == 0.0
    z = np.asarray(eng._state["k20"].z)
    assert float(np.max(z)) > 1e-6  # smoother state untouched


def test_goniometer_prefs_change_the_frame():
    """Goniometer gain/persistence prefs (persisted via LV2 State in the
    reference, src/goniometerlv2.c:210-293) are live render ports."""
    eng = LiveEngine(["goniometer"], FS, 2)
    eng.feed(_stereo(1.0))
    a = eng.frame("goniometer")
    assert a[:8] == b"\x89PNG\r\n\x1a\n"
    eng.set_port("goniometer", "autogain", 0.0)
    eng.set_port("goniometer", "gain", 0.05)
    b = eng.frame("goniometer")
    assert b != a  # manual low gain shrinks the trace
    eng.set_port("goniometer", "persistence", 0.05)
    c = eng.frame("goniometer")
    assert c != b


def test_display_floor_port():
    """Display floor (gui/phasewheel.c:1296-1342): raising it from -60
    to -20 dB hides the ~-54 dB cross-channel bins of a common tone."""
    sig = _stereo(1.0)
    t = np.arange(sig.shape[-1]) / FS
    common = (0.0224 * np.sin(2 * np.pi * 5000.0 * t)).astype(np.float32)
    eng = LiveEngine(["phasewheel"], FS, 2)
    eng.feed(sig + common[None])  # same tone on BOTH channels
    a = eng.frame("phasewheel")
    eng.set_port("phasewheel", "floor_db", -20.0)
    assert eng.frame("phasewheel") != a


def test_host_ports_survive_save_load(tmp_path):
    path = str(tmp_path / "s.npz")
    a = LiveEngine(["vu", "goniometer"], FS, 2)
    a.feed(_stereo(0.5))
    a.set_port("vu", "ref_level_db", -20.0)
    a.set_port("goniometer", "persistence", 0.5)
    a.save(path)
    b = LiveEngine(["vu", "goniometer"], FS, 2)
    b.load(path)
    assert b._port_values[("vu", "ref_level_db")] == -20.0
    assert b._port_values[("goniometer", "persistence")] == 0.5


def test_http_generic_port_widgets_and_reset_peak():
    eng = LiveEngine(["vu", "k20"], FS, 2)
    eng.feed(_stereo(0.5))
    srv = make_server(eng, port=0, fps=5.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "vu.ref_level_db" in page and "reset_peak" in page
        r = urllib.request.urlopen(
            f"{base}/ctl?action=set&meter=vu&param=ref_level_db&value=-18")
        assert r.read() == b"ok"
        assert eng._port_values[("vu", "ref_level_db")] == -18.0
        assert float(np.max(np.asarray(eng._read_one("k20")["peak"]))) > 0
        urllib.request.urlopen(f"{base}/ctl?action=reset_peak&meter=k20")
        assert float(np.max(np.asarray(eng._read_one("k20")["peak"]))) == 0
    finally:
        srv.shutdown()


def _pipe_writer(wfd, payload: bytes, sizes):
    """Write payload down the pipe in ragged pieces, then close."""
    import os

    off = 0
    i = 0
    while off < len(payload):
        n = sizes[i % len(sizes)]
        os.write(wfd, payload[off: off + n])
        off += n
        i += 1
    os.close(wfd)


def test_feed_stream_pipe_f32_matches_file_path():
    """Live raw-f32 ingest from a pipe (the JACK-capture analog): a
    producer thread writes ragged byte pieces; the stream result matches
    feeding the same audio as one block, while the dashboard answers
    mid-stream."""
    import os

    sig = _stereo(1.0)  # [2, T]
    payload = np.ascontiguousarray(sig.T, "<f4").tobytes()

    eng = LiveEngine(["r128"], FS, 2)
    srv = make_server(eng, port=0, fps=5.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    rfd, wfd = os.pipe()
    t = threading.Thread(
        target=_pipe_writer, args=(wfd, payload, (997 * 8, 1531 * 8, 61)))
    t.start()
    try:
        from meters_lv2_tpu.live import feed_stream

        with os.fdopen(rfd, "rb") as fh:
            fed = feed_stream(eng, fh, 2, fmt="f32", chunk=2048)
        t.join()
        st = json.loads(urllib.request.urlopen(f"{base}/state.json").read())
        assert st["_fed_samples"] == sig.shape[-1]
    finally:
        srv.shutdown()
    assert fed == sig.shape[-1] == eng.fed_samples

    ref = LiveEngine(["r128"], FS, 2)
    ref.feed(sig)
    got = eng._read_one("r128")
    want = ref._read_one("r128")
    np.testing.assert_allclose(
        float(got["loudness_M"]), float(want["loudness_M"]), atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(eng._state["r128"].n_lo), np.asarray(ref._state["r128"].n_lo))


def test_feed_stream_s16_and_eof_remainder():
    """s16 decode (1/32768 scaling) + a total length that is NOT
    4-aligned: every frame is fed, only the 4-aligned prefix is
    measured (padding-never-measured at EOF too)."""
    import os

    T = FS // 4 + 3  # % 4 == 3
    sig = (np.clip(_stereo(1.0)[:, :T], -1, 1) * 32767).astype("<i2")
    payload = np.ascontiguousarray(sig.T).tobytes()
    eng = LiveEngine(["r128"], FS, 2)
    rfd, wfd = os.pipe()
    t = threading.Thread(target=_pipe_writer, args=(wfd, payload, (4001,)))
    t.start()
    from meters_lv2_tpu.live import feed_stream

    with os.fdopen(rfd, "rb") as fh:
        fed = feed_stream(eng, fh, 2, fmt="s16", chunk=1000)
    t.join()
    assert fed == T == eng.fed_samples
    assert int(np.asarray(eng._state["r128"].n_lo)) == T // 4 * 4


def test_http_server_endpoints(engine):
    srv = make_server(engine, port=0, fps=5.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "r128" in page and "meters_lv2_tpu live" in page
        assert "%PORTVALS%" not in page  # port seeds substituted
        assert "r128.radar_seconds" in page
        png = urllib.request.urlopen(f"{base}/view/r128.png?t=1").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        st = json.loads(
            urllib.request.urlopen(f"{base}/state.json").read())
        assert st["_fed_samples"] == engine.fed_samples
        assert "integrated" in st["r128"]
        assert urllib.request.urlopen(
            f"{base}/ctl?action=pause&meter=r128").read() == b"ok"
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/view/nope.png")
        assert ei.value.code == 404
    finally:
        srv.shutdown()
