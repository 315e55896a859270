"""Long-stream boundary behavior at the int32 edges the counters are
designed for — simulated by initializing counters near the boundary
(streaming the real hours would take days of CPU):

  * bitmeter / sigdist acquisition stalls exactly at the 2^31-point cap
    (the reference stops acquiring at INT_MAX, src/sigdistlv2.c:288-295);
    a stalled meter is a no-op, not a wraparound.
  * R128's integration sample counter carries exactly across the 2^30
    low-word radix (multi-day streams stay exact without x64).
  * the radar ring wraps past position 360 (later events overwrite,
    ring position = event % 360, src/ebulv2.cc:160-176).
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from signals import make_signal

FS = 48000
_CAP = 2147483647
_NRADIX = 1 << 30


def _assert_state_equal(a, b, msg=""):
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb), err_msg=msg)


def test_bitmeter_cap_stall():
    from meters_lv2_tpu.models.bitmeter import BitMeter

    m = BitMeter(FS)
    T = 4800
    x = jnp.asarray(make_signal("mix", 0.1)[0])  # [T]
    st = m.init(())
    st = dataclasses.replace(st, time=jnp.asarray(_CAP - T - 1, jnp.int32))

    upd = jax.jit(m.update)
    st1 = upd(st, x)  # still under the cap: this block IS counted
    assert int(st1.time) == _CAP - 1
    assert int(st1.hit.sum()) > 0

    st2 = upd(st1, x)  # at the cap: acquisition stalls, state is frozen
    _assert_state_equal(st1, st2, "bitmeter must stall at the 2^31 cap")


def test_sigdist_cap_stall():
    from meters_lv2_tpu.models.sigdist import SigDistMeter

    m = SigDistMeter(FS)
    T = 4800
    x = jnp.asarray(make_signal("mix", 0.1)[0])
    st = m.init(())
    st = dataclasses.replace(st, time=jnp.asarray(_CAP - T - 1, jnp.int32))

    upd = jax.jit(m.update)
    st1 = upd(st, x)
    assert int(st1.time) == _CAP - 1
    assert int(st1.hist.sum()) == T  # all of "mix" lands in range

    st2 = upd(st1, x)
    _assert_state_equal(st1, st2, "sigdist must stall at the 2^31 cap")


def test_r128_sample_counter_carry():
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter

    m = EbuR128Meter(FS, nchan=2)
    T = 4800
    x = jnp.asarray(make_signal("mix", 0.1))
    st = m.init(())
    # low word one block short of the radix: the next update must carry
    st = dataclasses.replace(st, n_lo=jnp.asarray(_NRADIX - T // 2, jnp.int32))

    upd = jax.jit(m.update)
    st = upd(st, x)
    assert int(st.n_lo) == T // 2
    assert int(st.n_hi) == 1
    # exact integer view survives further updates (monotone carry)
    st = upd(st, x)
    assert int(st.n_lo) == T // 2 + T and int(st.n_hi) == 1
    # ~3.4 hours in; the f32 seconds view is within rounding of exact
    want = (_NRADIX + 1.5 * T) / FS
    got = float(m.total_samples(st)) / FS
    assert abs(got - want) / want < 1e-6
    # while paused the counter must NOT advance past the carry
    stp = m.integr_pause(st)
    stp2 = upd(stp, x)
    assert int(stp2.n_lo) == int(st.n_lo) and int(stp2.n_hi) == int(st.n_hi)


def test_radar_ring_wraps_past_360():
    from meters_lv2_tpu.models.ebur128 import EbuR128Meter

    # tiny radar interval (clamps to the 4096-sample floor,
    # src/ebulv2.cc:75-78) so a 1.5 s stream fires 17 events
    m = EbuR128Meter(FS, nchan=2, radar_seconds=0.1)
    assert m.radar_spd == 4096
    T = 30 * m.fragm  # 72000 samples -> (T-1)//4096 = 17 events
    x = jnp.asarray(make_signal("mix", T / FS))
    st = m.init(())
    st = dataclasses.replace(st, radar_pos=jnp.asarray(355, jnp.int32))

    st = jax.jit(m.update)(st, x)
    n_ev = (T - 1) // 4096
    assert n_ev == 17
    assert int(st.radar_pos) == (355 + n_ev) % 360 == 12
    rm = np.asarray(st.radar_m)
    # events wrote 355..359 then wrapped to 0..11; untouched slots stay -inf
    written = list(range(355, 360)) + list(range(0, 12))
    assert np.all(np.isfinite(rm[written]))
    assert np.isneginf(rm[50])

    # chunked == one-shot across the wrap (state handoff exactness)
    st2 = m.init(())
    st2 = dataclasses.replace(st2, radar_pos=jnp.asarray(355, jnp.int32))
    upd = jax.jit(m.update)
    half = 15 * m.fragm
    st2 = upd(st2, x[:, :half])
    st2 = upd(st2, x[:, half:])
    np.testing.assert_array_equal(np.asarray(st2.radar_m), rm)
    assert int(st2.radar_pos) == int(st.radar_pos)
