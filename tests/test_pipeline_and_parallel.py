"""Fused pipeline, sequence-parallel LTI, sharded R128, graft entry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from signals import make_signal

FS = 48000


def test_pipeline_multi_meter():
    from meters_lv2_tpu.models import cor, ebur128, kmeter, truepeak
    from meters_lv2_tpu.parallel.pipeline import MeterPipeline

    x = make_signal("mix", 4.0)  # [2, T]
    pipe = MeterPipeline(
        {
            "r128": ebur128.EbuR128Meter(FS, nchan=2),
            "k20": kmeter.K20Meter(FS),
            "tp": truepeak.TruePeakMeter(FS),
            "cor": cor.CorrelationMeter(FS),
        }
    )

    @jax.jit
    def run(x):
        st = pipe.init(())
        st = pipe.run_stream(st, x, FS)
        return pipe.read(st)

    outs, _ = run(jnp.asarray(x))
    # cross-meter consistency: r128 dbtp == max over channels of tp peak
    tp_peak = np.asarray(outs["tp"]["peak"]).max()
    np.testing.assert_allclose(float(outs["r128"]["dbtp"]), tp_peak, rtol=1e-5)
    assert float(outs["r128"]["loudness_S"]) > -40
    assert np.all(np.asarray(outs["k20"]["rms"]) > 0)


def test_timepar_lti_matches_serial():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from meters_lv2_tpu.ops import design, lti
    from meters_lv2_tpu.parallel import make_mesh
    from meters_lv2_tpu.parallel.timepar import lti_apply_sp

    sys_ = lti.LTISystem(*design.k_weighting_state_space(FS))
    mesh = make_mesh(dp=1, sp=8)
    T = 8 * 6000
    x = np.asarray(
        0.3 * np.random.default_rng(3).standard_normal((T,)), np.float32
    )

    y_ref, s_ref = sys_.apply(jnp.asarray(x), sys_.init(()))

    def body(xl):
        return lti_apply_sp(sys_, xl, jnp.zeros((4,), jnp.float32), "sp")

    y_sp, s_sp = jax.jit(
        shard_map(
            body, mesh=mesh, in_specs=P("sp"), out_specs=(P("sp"), P()), check_vma=False,
        )
    )(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(y_sp), np.asarray(y_ref), atol=2e-5, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s_sp), np.asarray(s_ref), atol=2e-5, rtol=1e-6
    )


def test_sharded_r128_matches_serial():
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.parallel import make_mesh
    from meters_lv2_tpu.parallel.r128_sharded import analyze_r128

    m = EbuR128Meter(FS, nchan=2)
    mesh = make_mesh(dp=2, sp=4)
    x = make_signal("bursts", 12.0)
    xs = np.stack([x, 0.5 * x, 0.25 * x, 2.0 * x]).astype(np.float32)
    out = analyze_r128(m, jnp.asarray(xs), mesh)

    st = m.init((4,))
    st = jax.jit(m.update)(st, jnp.asarray(xs))
    ref, _ = jax.jit(m.read)(st)

    np.testing.assert_array_equal(np.asarray(out["hist_m"]), np.asarray(st.hist_m))
    np.testing.assert_array_equal(np.asarray(out["hist_s"]), np.asarray(st.hist_s))
    np.testing.assert_allclose(
        np.asarray(out["max_M"]), np.asarray(ref["max_M"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["integrated"]), np.asarray(ref["integrated"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["dbtp"]), np.asarray(st.dbtp), atol=1e-6
    )
    # fragment-rate loudness curves: final fragment equals the serial
    # meter's loudness_M/S, shape covers the full timeline
    cm = np.asarray(out["curve_M"])
    assert cm.shape == (4, 12 * 20)  # 12 s at 20 fragments/s
    np.testing.assert_allclose(
        cm[:, -1], np.asarray(ref["loudness_M"]), atol=1e-4
    )


def test_sharded_r128_radar_matches_serial():
    """Radar rings (fragment-rate interval maxima) from the sp-sharded
    analysis == the serial meter's, incl. intervals straddling shards."""
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.parallel import make_mesh
    from meters_lv2_tpu.parallel.r128_sharded import analyze_r128

    # radar interval not divisible by the per-shard length -> straddling
    m = EbuR128Meter(FS, nchan=2, radar_seconds=42.0)
    assert m.radar_spd == 5600
    mesh = make_mesh(dp=4, sp=2)
    x = make_signal("bursts", 12.0)
    xs = np.stack([x, 0.5 * x, 0.25 * x, 2.0 * x]).astype(np.float32)
    out = analyze_r128(m, jnp.asarray(xs), mesh)

    st = m.init((4,))
    st = jax.jit(m.update)(st, jnp.asarray(xs))
    np.testing.assert_allclose(
        np.asarray(out["radar_m"]), np.asarray(st.radar_m), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["radar_s"]), np.asarray(st.radar_s), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out["radar_pos"]), np.asarray(st.radar_pos)
    )


def test_sharded_r128_rejects_short_shards():
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.parallel import make_mesh
    from meters_lv2_tpu.parallel.r128_sharded import analyze_r128
    import pytest

    m = EbuR128Meter(FS, nchan=2)
    mesh = make_mesh(dp=2, sp=4)
    # 2 s / 4 sp-shards = 10 fragments per shard < 59
    xs = np.zeros((2, 2, FS * 2), np.float32)
    with pytest.raises(AssertionError, match="59 fragments"):
        analyze_r128(m, jnp.asarray(xs), mesh)


def test_sharded_spectrum_matches_serial():
    """Time-sharded 30-band spectrum (banked LTI state handoff + linear
    smoother composition over 'sp') == one serial full-file update."""
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer
    from meters_lv2_tpu.parallel import make_mesh
    from meters_lv2_tpu.parallel.spectrum_sharded import analyze_spectrum

    m = SpectrumAnalyzer(FS)
    mesh = make_mesh(dp=2, sp=4)
    x = make_signal("mix", 1.0)
    xs = np.stack([x, 0.5 * x, 0.25 * x, 2.0 * x]).astype(np.float32)

    out, st = analyze_spectrum(m, jnp.asarray(xs), mesh)

    sst = m.init((4,))
    sst = jax.jit(lambda s, v: m.update(s, v, stereo=True))(
        sst, jnp.asarray(xs)
    )
    ref, _ = m.read(sst)

    # split-order numerics (A^L composition, smoother superposition):
    # worst 0.0036 dB on near-floor bands — half the 0.01 dB budget
    np.testing.assert_allclose(
        np.asarray(out["bands"]), np.asarray(ref["bands"]), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["peaks"]), np.asarray(ref["peaks"]), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(st.zf), np.asarray(sst.zf), atol=1e-3, rtol=1e-3
    )


def test_graft_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert jax.tree_util.tree_structure(out).num_leaves > 0
    g.dryrun_multichip(8)


def test_state_checkpoint_roundtrip(tmp_path):
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.utils.state import load_state, save_state

    m = EbuR128Meter(FS, nchan=2)
    x = make_signal("mix", 4.0)
    st = m.init(())
    st = jax.jit(m.update)(st, jnp.asarray(x[:, : 2 * FS]))
    p = str(tmp_path / "ck.npz")
    save_state(st, p)
    st2 = load_state(m.init(()), p)
    # resume both and compare
    a = jax.jit(m.update)(st, jnp.asarray(x[:, 2 * FS :]))
    b = jax.jit(m.update)(st2, jnp.asarray(x[:, 2 * FS :]))
    oa, _ = m.read(a)
    ob, _ = m.read(b)
    np.testing.assert_allclose(
        float(oa["integrated"]), float(ob["integrated"]), rtol=0
    )


def test_cli_json(tmp_path, capsys):
    import json

    from meters_lv2_tpu.__main__ import main
    from meters_lv2_tpu.io import write_wav

    t = np.arange(FS) / FS
    x = np.stack(
        [0.25 * np.sin(2 * np.pi * 440 * t), 0.2 * np.sin(2 * np.pi * 880 * t)]
    ).astype(np.float32)
    p1 = str(tmp_path / "a.wav")
    p2 = str(tmp_path / "b.wav")
    write_wav(p1, x, FS)
    write_wav(p2, (0.5 * x).astype(np.float32), FS)
    rc = main([p1, p2, "--meters", "truepeak,k20", "--json",
               "--chunk-seconds", "0.5"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 2
    tp1 = rows[0]["truepeak"]["peak"][0]
    tp2 = rows[1]["truepeak"]["peak"][0]
    np.testing.assert_allclose(tp1, 0.25, rtol=1e-3)
    np.testing.assert_allclose(tp1 / tp2, 2.0, rtol=1e-3)


def test_pipeline_mono_and_mix_modes():
    from meters_lv2_tpu.models.bitmeter import BitMeter
    from meters_lv2_tpu.models.sigdist import SigDistMeter
    from meters_lv2_tpu.models.spectrum import SpectrumAnalyzer
    from meters_lv2_tpu.parallel.pipeline import MeterPipeline

    t = np.arange(FS) / FS
    x = np.stack(
        [0.3 * np.sin(2 * np.pi * 1000 * t), 0.3 * np.sin(2 * np.pi * 1000 * t)]
    ).astype(np.float32)
    pipe = MeterPipeline(
        {
            "spectrum": SpectrumAnalyzer(FS),
            "sigdist": SigDistMeter(FS),
            "bitmeter": BitMeter(FS),
        }
    )

    @jax.jit
    def run(x):
        st = pipe.init(())
        st = pipe.update(st, x)
        return pipe.read(st)

    outs, _ = run(jnp.asarray(x))
    bands = np.asarray(outs["spectrum"]["bands"])
    assert bands.argmax() == 16  # 1 kHz band
    assert int(outs["sigdist"]["integration_time"]) == FS
    assert float(outs["bitmeter"]["zero"]) == 1  # t=0 sample is exactly 0


def test_pipeline_gspmd_batch_sharding():
    """The full meter pipeline partitions over a batch-sharded mesh via
    GSPMD — no code changes, identical results to unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from meters_lv2_tpu.models import kmeter, needle, truepeak
    from meters_lv2_tpu.parallel import make_mesh
    from meters_lv2_tpu.parallel.pipeline import MeterPipeline

    mesh = make_mesh(dp=8, sp=1)
    B = 16
    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal((B, 2, FS))).astype(np.float32)
    pipe = MeterPipeline(
        {
            "vu": needle.VUMeter(FS),
            "tp": truepeak.TruePeakMeter(FS),
            "k20": kmeter.K20Meter(FS),
        }
    )

    def run(x):
        st = pipe.init((B,))
        st = pipe.update(st, x)
        return pipe.read(st)[0]

    ref = jax.jit(run)(jnp.asarray(x))
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("dp", None, None))
    )
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        out = jax.jit(run)(xs)
    for k in ("vu",):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(out["tp"]["peak"]), np.asarray(ref["tp"]["peak"]), rtol=1e-6
    )


def test_transport_follow():
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.utils import transport

    m = EbuR128Meter(FS, nchan=2)
    st = m.init(())
    x = make_signal("mix", 2.0)
    mode = transport.FOLLOW_START_STOP | transport.FOLLOW_AUTO_RESET
    # transport stops -> integration pauses (no new histogram points)
    st = transport.follow(m, st, rolling=False, was_rolling=True, mode=mode)
    st = jax.jit(m.update)(st, jnp.asarray(x))
    assert int(st.count_m) == 0
    # transport starts -> reset + integrate
    st = transport.follow(m, st, rolling=True, was_rolling=False, mode=mode)
    st = jax.jit(m.update)(st, jnp.asarray(x))
    assert int(st.count_m) > 0


def test_cli_all_meters(tmp_path, capsys):
    """--meters all on a stereo file: every applicable capability of
    x42-meter-collection (doc/x42-meter.1:16-76) produces a readout —
    measuring meters through the fused pipeline, display processors
    (goniometer/phasewheel/stereoscope) on the trailing window."""
    import json

    from meters_lv2_tpu.__main__ import applicable_meters, main
    from meters_lv2_tpu.io import write_wav

    t = np.arange(FS // 2) / FS
    x = np.stack(
        [0.25 * np.sin(2 * np.pi * 440 * t), 0.2 * np.sin(2 * np.pi * 880 * t)]
    ).astype(np.float32)
    p1 = str(tmp_path / "a.wav")
    write_wav(p1, x, FS)
    rc = main([p1, "--meters", "all", "--json", "--chunk-seconds", "0.25"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    want = set(applicable_meters(2))
    assert {"goniometer", "phasewheel", "stereoscope", "cor"} <= want
    assert "surround" not in want  # stereo file
    assert want <= set(rows[0].keys())


def test_cli_surround_multichannel(tmp_path, capsys):
    """A 5-channel file through --meters all engages surround5 (per-channel
    K RMS/peak + routable correlation pairs, src/surmeter.c)."""
    import json

    from meters_lv2_tpu.__main__ import applicable_meters, main
    from meters_lv2_tpu.io import write_wav

    t = np.arange(FS // 2) / FS
    x = np.stack(
        [0.1 * (c + 1) * np.sin(2 * np.pi * (220 * (c + 1)) * t)
         for c in range(5)]
    ).astype(np.float32)
    p1 = str(tmp_path / "surr.wav")
    write_wav(p1, x, FS)
    rc = main([p1, "--meters", "all", "--json", "--chunk-seconds", "0.25"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    want = set(applicable_meters(5))
    assert "surround" in want and "goniometer" not in want
    assert want <= set(rows[0].keys())
    lv = rows[0]["surround"]["level"]
    assert len(lv) == 5 and lv == sorted(lv)  # rising per-channel levels


def test_ragged_batch_matches_per_file_serial():
    """Length-aware readout: a ragged (right-padded) batch through
    run_stream_ragged reports, for every file, exactly what a serial
    per-file run reports — trailing padding is never measured
    (reference: one run() stream per track, src/meters.cc:298-331)."""
    from meters_lv2_tpu.models.cor import CorrelationMeter
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.models.kmeter import K20Meter
    from meters_lv2_tpu.parallel.pipeline import MeterPipeline

    rng = np.random.default_rng(11)
    lens = [4 * 48000 + 2400, 2 * 48000 + 96, 5 * 48000]  # ragged, %4 == 0
    files = []
    for i, L in enumerate(lens):
        t = np.arange(L) / FS
        amp = 0.2 + 0.15 * i
        l = amp * np.sin(2 * np.pi * (300 + 200 * i) * t)
        r = amp * 0.7 * np.sin(2 * np.pi * (500 + 100 * i) * t + 0.3)
        files.append(np.stack([l, r]).astype(np.float32))

    def mk():
        return MeterPipeline(
            {
                "r128": EbuR128Meter(FS, nchan=2),
                "k20": K20Meter(FS),
                "cor": CorrelationMeter(FS),
            },
            nchan=2,
        )

    chunk = FS  # 1 s scan steps; boundaries fall mid-chunk for files 0, 1
    T = max(lens)
    Tpad = ((T + chunk - 1) // chunk) * chunk
    x = np.zeros((len(files), 2, Tpad), np.float32)
    for i, f in enumerate(files):
        x[i, :, : f.shape[1]] = f

    pipe = mk()
    st = pipe.init((len(files),))
    st = pipe.run_stream_ragged(st, jnp.asarray(x), np.asarray(lens), chunk)
    outs, _ = pipe.read(st)

    for i, f in enumerate(files):
        ref_pipe = mk()
        rst = ref_pipe.init(())
        rst = jax.jit(ref_pipe.update)(rst, jnp.asarray(f))
        refs, _ = ref_pipe.read(rst)

        np.testing.assert_array_equal(
            np.asarray(st["r128"].hist_m)[i],
            np.asarray(rst["r128"].hist_m),
            err_msg=f"file {i} hist_m",
        )
        for key in ("loudness_M", "loudness_S", "max_M", "integrated", "dbtp"):
            g = float(np.asarray(outs["r128"][key])[i])
            w = float(np.asarray(refs["r128"][key]))
            assert abs(g - w) < 1e-4, (i, key, g, w)
        np.testing.assert_allclose(
            np.asarray(outs["k20"]["rms"])[i],
            np.asarray(refs["k20"]["rms"]),
            rtol=1e-5, err_msg=f"file {i} k20 rms",
        )
        np.testing.assert_allclose(
            np.asarray(outs["cor"])[i] if not isinstance(outs["cor"], dict)
            else np.asarray(outs["cor"]["correlation"])[i],
            np.asarray(refs["cor"]) if not isinstance(refs["cor"], dict)
            else np.asarray(refs["cor"]["correlation"]),
            atol=1e-6, err_msg=f"file {i} correlation",
        )


@pytest.mark.slow
def test_ragged_50_random_lengths_two_programs():
    """A 50-file batch of arbitrary (4-aligned) lengths compiles exactly
    TWO programs — the chunk scan and the one traced tail program (binary
    tail decomposition) — and every file's readout equals a single
    whole-file update (VERDICT: production ingest must not compile per
    distinct tail length)."""
    from meters_lv2_tpu.models.kmeter import K20Meter
    from meters_lv2_tpu.models.needle import VUMeter
    from meters_lv2_tpu.parallel.pipeline import MeterPipeline

    chunk = 4800
    rng = np.random.default_rng(7)
    lens = (rng.integers(chunk // 2, 3 * chunk, size=50) // 4) * 4
    assert len(set(int(v % chunk) for v in lens)) > 20  # heterogeneous
    T = ((int(lens.max()) + chunk - 1) // chunk) * chunk
    x = np.zeros((50, 2, T), np.float32)
    for i, L in enumerate(lens):
        x[i, :, :L] = 0.2 * rng.standard_normal((2, L))

    pipe = MeterPipeline({"vu": VUMeter(FS), "k20": K20Meter(FS)}, nchan=2)
    st = pipe.init((50,))
    st = pipe.run_stream_ragged(st, jnp.asarray(x), lens, chunk)
    outs, _ = pipe.read(st)

    phase1, phase2 = pipe._ragged_fns
    assert phase1._cache_size() == 1
    assert phase2._cache_size() == 1

    # a SECOND ingest with a different length mix must reuse the same
    # jitted wrappers (cached on the pipeline keyed by geometry) — the
    # two-programs guarantee holds across calls (ADVICE round 3)
    lens2 = (rng.integers(chunk // 2, 3 * chunk, size=50) // 4) * 4
    st2 = pipe.init((50,))
    pipe.run_stream_ragged(st2, jnp.asarray(x), lens2, chunk)
    p1b, p2b = pipe._ragged_fns
    assert p1b is phase1 and p2b is phase2
    assert phase1._cache_size() == 1
    assert phase2._cache_size() == 1

    # per-file serial reference: one whole-file update each
    ref_pipe = MeterPipeline({"vu": VUMeter(FS), "k20": K20Meter(FS)}, nchan=2)
    for i, L in enumerate(lens):
        rst = ref_pipe.init(())
        rst = jax.jit(ref_pipe.update)(rst, jnp.asarray(x[i, :, :L]))
        refs, _ = ref_pipe.read(rst)
        np.testing.assert_allclose(
            np.asarray(outs["vu"])[i], np.asarray(refs["vu"]),
            rtol=1e-6, err_msg=f"file {i} vu",
        )
        np.testing.assert_allclose(
            np.asarray(outs["k20"]["rms"])[i], np.asarray(refs["k20"]["rms"]),
            rtol=1e-6, err_msg=f"file {i} k20",
        )
        np.testing.assert_array_equal(
            np.asarray(outs["k20"]["peak"])[i], np.asarray(refs["k20"]["peak"]),
            err_msg=f"file {i} k20 peak",
        )


def test_sharded_r128_fused_kernel_matches_serial():
    """The sharded analysis' fused-Pallas branch (TPU default; interpret
    mode here) == the serial meter: SP entry-state composition feeding
    the kernel, TP halo as kernel history."""
    import os

    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.parallel import make_mesh
    from meters_lv2_tpu.parallel.r128_sharded import analyze_r128

    m = EbuR128Meter(FS, nchan=2)
    mesh = make_mesh(dp=4, sp=2)
    x = make_signal("bursts", 6.0)
    xs = np.stack([x, 0.5 * x, 0.25 * x, 2.0 * x]).astype(np.float32)

    old = os.environ.get("METERS_TPU_R128_FUSED")
    os.environ["METERS_TPU_R128_FUSED"] = "interpret"
    try:
        out = analyze_r128(m, jnp.asarray(xs), mesh)
    finally:
        if old is None:
            del os.environ["METERS_TPU_R128_FUSED"]
        else:
            os.environ["METERS_TPU_R128_FUSED"] = old

    os.environ["METERS_TPU_R128_FUSED"] = "0"
    try:
        st = m.init((4,))
        st = jax.jit(m.update)(st, jnp.asarray(xs))
        ref, _ = jax.jit(m.read)(st)
    finally:
        if old is None:
            del os.environ["METERS_TPU_R128_FUSED"]
        else:
            os.environ["METERS_TPU_R128_FUSED"] = old

    np.testing.assert_array_equal(
        np.asarray(out["hist_m"]), np.asarray(st.hist_m)
    )
    np.testing.assert_allclose(
        np.asarray(out["max_M"]), np.asarray(ref["max_M"]), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["integrated"]), np.asarray(ref["integrated"]),
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["dbtp"]), np.asarray(st.dbtp), rtol=1e-4
    )


@pytest.mark.slow
def test_sharded_r128_fused_misaligned_shard():
    """Fused branch on shards whose length is NOT a multiple of 128 —
    e.g. any 44.1 kHz run (fragm=2205, odd): the kernel covers the
    128-aligned bulk and the remainder chains through the XLA tail, as
    EbuR128Meter.update does.  Regression for the trace-time
    AssertionError the unconditional fused call used to hit."""
    import os

    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.parallel import make_mesh
    from meters_lv2_tpu.parallel.r128_sharded import analyze_r128

    fs = 44100
    m = EbuR128Meter(fs, nchan=2)
    mesh = make_mesh(dp=4, sp=2)
    x = make_signal("bursts", 6.0, fs=fs)  # Tl = 132300 = 60 frags, %128 != 0
    xs = np.stack([x, 0.5 * x, 0.25 * x, 2.0 * x]).astype(np.float32)
    assert (xs.shape[-1] // 2) % 128 != 0

    old = os.environ.get("METERS_TPU_R128_FUSED")
    os.environ["METERS_TPU_R128_FUSED"] = "interpret"
    try:
        out = analyze_r128(m, jnp.asarray(xs), mesh)
    finally:
        if old is None:
            del os.environ["METERS_TPU_R128_FUSED"]
        else:
            os.environ["METERS_TPU_R128_FUSED"] = old

    st = m.init((4,))
    st = jax.jit(m.update)(st, jnp.asarray(xs))
    ref, _ = jax.jit(m.read)(st)

    np.testing.assert_array_equal(
        np.asarray(out["hist_m"]), np.asarray(st.hist_m)
    )
    np.testing.assert_allclose(
        np.asarray(out["max_M"]), np.asarray(ref["max_M"]), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["dbtp"]), np.asarray(st.dbtp), rtol=1e-4
    )


def test_sharded_checkpoint_roundtrip(tmp_path):
    """orbax checkpoint of a mesh-sharded meter state: no host gather,
    restore lands on the same shardings, measurement resumes exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from meters_lv2_tpu.models.ebur128 import EbuR128Meter
    from meters_lv2_tpu.parallel import make_mesh
    from meters_lv2_tpu.utils.state import load_state_sharded, save_state_sharded

    m = EbuR128Meter(FS, nchan=2)
    mesh = make_mesh(dp=8, sp=1)
    shard = NamedSharding(mesh, P("dp"))
    x = jnp.asarray(
        np.stack([make_signal("mix", 2.0) for _ in range(8)]), jnp.float32
    )
    st = jax.device_put(m.init((8,)), shard)
    x = jax.device_put(x, shard)
    st = jax.jit(m.update)(st, x)

    path = str(tmp_path / "ckpt")
    save_state_sharded(st, path)
    st2 = load_state_sharded(jax.tree.map(lambda a: a, st), path)

    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert b.sharding == a.sharding, (a.sharding, b.sharding)

    # resume: one more update on the restored state == on the original
    s_a = jax.jit(m.update)(st, x)
    s_b = jax.jit(m.update)(st2, x)
    np.testing.assert_array_equal(np.asarray(s_a.hist_m), np.asarray(s_b.hist_m))


def test_cli_surround_pairs(tmp_path, capsys):
    """--surround-pairs routes the correlators (surc_a/b ports,
    src/surmeter.c:119-128): correlating a channel with itself reads +1."""
    import json

    from meters_lv2_tpu.__main__ import main
    from meters_lv2_tpu.io import write_wav

    t = np.arange(FS // 2) / FS
    x = np.stack(
        [0.1 * (c + 1) * np.sin(2 * np.pi * 220 * (c + 1) * t)
         for c in range(4)]
    ).astype(np.float32)
    p1 = str(tmp_path / "q.wav")
    write_wav(p1, x, FS)
    rc = main([p1, "--meters", "surround", "--json",
               "--surround-pairs", "0:0,1:1,0:1,2:3",
               "--chunk-seconds", "0.25"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    corr = rows[0]["surround"]["correlation"]
    assert corr[0] > 0.99 and corr[1] > 0.99  # self-correlation
    assert abs(corr[2]) < 0.5  # different tones


@pytest.mark.slow
def test_cli_render_dir(tmp_path, capsys):
    """--render-dir saves inline-view PNGs per file and meter."""
    from meters_lv2_tpu.__main__ import main
    from meters_lv2_tpu.io import write_wav

    t = np.arange(FS) / FS
    x = np.stack(
        [0.25 * np.sin(2 * np.pi * 440 * t),
         0.2 * np.sin(2 * np.pi * 880 * t)]
    ).astype(np.float32)
    p = str(tmp_path / "song.wav")
    write_wav(p, x, FS)
    rd = tmp_path / "views"
    rc = main([p, "--meters", "r128,vu,k20,spectrum", "--json",
               "--render-dir", str(rd)])
    capsys.readouterr()
    assert rc == 0
    got = sorted(f.name for f in rd.iterdir())
    assert got == ["song_k20.png", "song_r128.png", "song_spectrum.png",
                   "song_vu.png"]
    magic = (rd / "song_r128.png").read_bytes()[:8]
    assert magic == b"\x89PNG\r\n\x1a\n"


@pytest.mark.slow
def test_cli_render_dir_full_collection(tmp_path, capsys):
    """--meters all --render-dir emits a PNG view for EVERY applicable
    meter — incl. the GUI-analyzer views (goniometer/phasewheel/
    stereoscope) and the dr14/cor/bbcms panels."""
    from meters_lv2_tpu.__main__ import applicable_meters, main
    from meters_lv2_tpu.io import write_wav

    t = np.arange(FS) / FS
    x = np.stack(
        [0.25 * np.sin(2 * np.pi * 440 * t),
         0.2 * np.sin(2 * np.pi * 880 * t)]
    ).astype(np.float32)
    p = str(tmp_path / "song.wav")
    write_wav(p, x, FS)
    rd = tmp_path / "views"
    rc = main([p, "--meters", "all", "--json", "--render-dir", str(rd)])
    capsys.readouterr()
    assert rc == 0
    got = sorted(f.name for f in rd.iterdir())
    assert got == sorted(f"song_{n}.png" for n in applicable_meters(2))
    for f in rd.iterdir():
        assert f.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_ref_level_scales_needles(tmp_path, capsys):
    """--ref-level must actually reach the needle meters' read(): +6 dB
    of reference level halves the needle deflection pre-gain x2."""
    import json

    from meters_lv2_tpu.__main__ import main
    from meters_lv2_tpu.io import write_wav

    t = np.arange(FS) / FS
    x = np.stack([0.1 * np.sin(2 * np.pi * 1000 * t)] * 2).astype(np.float32)
    p = str(tmp_path / "r.wav")
    write_wav(p, x, FS)

    def run(extra):
        rc = main([p, "--meters", "vu", "--json"] + extra)
        assert rc == 0
        return json.loads(capsys.readouterr().out)[0]["vu"][0]

    v_def = run([])                      # meter default (-22)
    v_same = run(["--ref-level", "-22"])
    v_up = run(["--ref-level", "-16"])   # +6 dB ref -> x2 rlgain
    np.testing.assert_allclose(v_def, v_same, rtol=1e-6)
    np.testing.assert_allclose(v_up / v_def, 10 ** (0.05 * 6), rtol=1e-4)


def test_cli_json_is_rfc_compliant(tmp_path, capsys):
    """A file shorter than one radar interval leaves -inf radar slots;
    the --json output must still be standard JSON (null, never
    -Infinity/NaN)."""
    import json

    from meters_lv2_tpu.__main__ import main
    from meters_lv2_tpu.io import write_wav

    t = np.arange(FS // 4) / FS  # 0.25 s << radar interval
    x = np.stack([0.1 * np.sin(2 * np.pi * 440 * t)] * 2).astype(np.float32)
    p = str(tmp_path / "s.wav")
    write_wav(p, x, FS)
    rc = main([p, "--meters", "r128", "--json"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Infinity" not in out and "NaN" not in out
    row = json.loads(out)[0]  # parses strictly
    assert row["r128"]["radar_m"]["max"] is None  # empty ring -> null


def test_cli_chunk_seconds_aligns_to_grain(tmp_path, capsys):
    """A 44.1 kHz-style non-4-aligned chunk request must not crash the
    needle meters' trace-time grain assert (chunk rounds down)."""
    import json

    from meters_lv2_tpu.__main__ import main
    from meters_lv2_tpu.io import write_wav

    fs = 44100
    t = np.arange(fs) / fs
    x = np.stack([0.2 * np.sin(2 * np.pi * 997 * t)] * 2).astype(np.float32)
    p = str(tmp_path / "c.wav")
    write_wav(p, x, fs)
    rc = main([p, "--meters", "vu,k20", "--json",
               "--chunk-seconds", "0.5"])  # 22050 % 4 == 2 pre-fix
    assert rc == 0
    assert json.loads(capsys.readouterr().out)[0]["vu"][0] > 0


def test_cli_surround_pairs_validation(tmp_path, capsys):
    """Malformed or out-of-range --surround-pairs die as argparse errors,
    not tracebacks."""
    import pytest

    from meters_lv2_tpu.__main__ import main
    from meters_lv2_tpu.io import write_wav

    x = (0.1 * np.random.default_rng(0).standard_normal((5, FS // 2))).astype(
        np.float32
    )
    p = str(tmp_path / "s5.wav")
    write_wav(p, x, FS)
    for bad in ("0:1:2,2:3,0:4,1:4", "0:1,2:3,0:9,1:4", "0:1"):
        with pytest.raises(SystemExit):
            main([p, "--meters", "surround", "--surround-pairs", bad])
        capsys.readouterr()
