"""CLI metadata switches — the x42-meter standalone's -l/-P/-V/-p analogs
(doc/x42-meter.1): --list, --portlist, --version on the batch CLI and
--set initial port values on the live shell."""

import pytest

from meters_lv2_tpu.__main__ import main


def test_list_prints_all_38_descriptors(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    # 1:1 with the reference's exported descriptors (src/meters.cc:745-792)
    assert len(out) == 38
    names = [ln.split()[1] for ln in out]
    for expected in ("EBUr128", "dBTPmono", "goniometer", "surround8",
                     "VUstereo", "bitmeter"):
        assert expected in names
    # mono/stereo variants carry their own channel count
    assert any("VUmono  (1 ch)" in ln for ln in out)
    assert any("VUstereo  (2 ch)" in ln for ln in out)


def test_portlist_prints_schema(capsys):
    assert main(["--portlist"]) == 0
    out = capsys.readouterr().out
    assert "EBUr128" in out
    assert "ref_level_db" in out          # needle control input
    assert "control inputs:" in out
    assert "readouts:" in out
    assert "None" not in out              # open-ended ranges render clean


def test_version_exits(capsys):
    with pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0
    assert "meters_lv2_tpu" in capsys.readouterr().out


def test_no_files_is_an_argparse_error():
    with pytest.raises(SystemExit) as e:
        main([])
    assert e.value.code == 2


@pytest.mark.slow
def test_release_gate_cpu_steps(tmp_path):
    """The documented one-command gate (tools/release_check.py) runs its
    CPU steps (entry compile-check + 8-device dryrun) and summarizes."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/release_check.py", "--skip-suite",
         "--skip-tpu", "--logdir", str(tmp_path)],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "RELEASE GATE: PASS" in r.stdout
    assert "entry_compile" in r.stdout and "dryrun_multichip" in r.stdout


def test_live_apply_port_sets():
    from meters_lv2_tpu.live import LiveEngine, apply_port_sets

    eng = LiveEngine(["spectrum", "vu"], 48000, 2)
    errs = []
    apply_port_sets(
        eng, ["spectrum.speed=2.0", "vu.ref_level_db=-18"], errs.append
    )
    assert errs == []
    ports = eng.port_values()
    assert ports["spectrum.speed"] == 2.0
    assert ports["vu.ref_level_db"] == -18.0

    apply_port_sets(eng, ["nosuch.port=1"], errs.append)
    apply_port_sets(eng, ["malformed"], errs.append)
    apply_port_sets(eng, ["vu.ref_level_db=abc"], errs.append)
    # NaN parses as a float but slips through the setters' jnp.clip range
    # clamps — set_port must reject it before it poisons traced state
    apply_port_sets(eng, ["spectrum.speed=nan"], errs.append)
    assert len(errs) == 4
    assert "unknown port" in errs[0]
    assert "METER.PARAM=VALUE" in errs[1]
    assert "non-finite" in errs[3]
    assert eng.port_values()["spectrum.speed"] == 2.0  # unchanged
