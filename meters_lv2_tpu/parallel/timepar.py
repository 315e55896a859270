"""Sequence parallelism for linear recurrences.

Splitting an IIR across devices looks impossible (per-sample dependence),
but the blocked state-space form (ops.lti) makes the cross-device
dependency a d-dimensional affine map: device k's incoming state is

    s_in[k] = (A^L)^k s0 + Σ_{i<k} (A^L)^{k-1-i} b[i]

where b[i] is device i's zero-state response (computed locally in one
pass).  An all_gather of the tiny b vectors plus a host-side-free local
compose gives every device its true incoming state; a second local pass
produces exact outputs.  Total comms: one all_gather of [n_sp, ..., d]
floats over ICI — microscopic next to the audio itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lti import BankedLTISystem, LTISystem


def lti_apply_sp(
    sys: LTISystem,
    u: jax.Array,
    s0: jax.Array,
    axis_name: str,
    prefer_block: int = 128,
):
    """Run sys over a time-sharded input inside shard_map.

    Args:
      sys: the LTI system.
      u:  local time segment [..., L(, m)] (device k holds samples
          [k*L, (k+1)*L)).
      s0: stream-start state [..., d] (replicated; only device 0 uses it).
      axis_name: the sequence-parallel mesh axis.

    Returns (y_local, s_final) — y_local are this device's exact outputs;
    s_final (the stream-end state) is returned on every device.
    """
    s_in = lti_entry_state_sp(sys, u, s0, axis_name, prefer_block)

    # pass 2: exact local outputs from the true incoming state
    y, s_out = sys.apply(u, s_in, prefer_block)
    # stream-end state = device nsp-1's s_out; broadcast it
    nsp = jax.lax.axis_size(axis_name)
    s_fin = jax.lax.all_gather(s_out, axis_name)[nsp - 1]
    return y, s_fin


def lti_entry_state_sp(
    sys: LTISystem,
    u: jax.Array,
    s0: jax.Array,
    axis_name: str,
    prefer_block: int = 128,
):
    """This device's exact incoming state for its time shard (pass 1 of
    lti_apply_sp).  Exposed so shard bodies that evaluate the local
    recurrence by other means (e.g. the fused Pallas R128 kernel) can
    still compose cross-device state exactly."""
    k = jax.lax.axis_index(axis_name)
    nsp = jax.lax.axis_size(axis_name)

    # pass 1: zero-state response of the local segment
    zero = jnp.zeros_like(s0)
    _, b_local = sys.apply(u, zero, prefer_block)

    # gather [nsp, ..., d] zero-state responses
    b_all = jax.lax.all_gather(b_local, axis_name)  # [nsp, ..., d]

    # A^L for the local segment length
    T = u.shape[-2] if u.ndim > s0.ndim else u.shape[-1]
    aL = np.linalg.matrix_power(sys.A, T).T.astype(np.float32)  # right-mult form

    # s_in[k] = s0 @ aL^k + Σ_{i<k} b[i] @ aL^{k-1-i}, built by iterating
    # s := s @ aL + b[i] for i < k (nsp is tiny, the loop is d x d work)
    def step(i, s):
        # state-chain precision law (CLAUDE.md / ops/lti.py _STATE):
        # state-propagation matmuls are always HIGHEST — cross-shard
        # entry-state errors would compound nsp x resonance otherwise
        s_next = jnp.matmul(
            s, jnp.asarray(aL), precision=jax.lax.Precision.HIGHEST
        ) + b_all[i]
        return jnp.where(i < k, s_next, s)

    # join shard_map varying-axes metadata with the gathered responses
    s0 = s0 + jnp.zeros_like(b_all[0])
    return jax.lax.fori_loop(0, nsp, step, s0)


def banked_lti_apply_sp(
    bank: BankedLTISystem,
    u: jax.Array,
    s0: jax.Array,
    axis_name: str,
    prefer_block: int = 128,
):
    """lti_apply_sp for a bank of NB independent systems (e.g. the 30-band
    IEC 61260 filter bank): the cross-device handoff is one all_gather of
    [nsp, ..., NB, d] floats; per-band A^L matrices compose the entry
    states with a banked einsum.

    u: local time segment [..., L] (shared across banks, as
    BankedLTISystem.apply); s0: [..., NB, d].
    Returns (y_local [..., NB, L], s_final [..., NB, d]).
    """
    k = jax.lax.axis_index(axis_name)
    nsp = jax.lax.axis_size(axis_name)

    _, b_local = bank.apply(u, jnp.zeros_like(s0), prefer_block)
    b_all = jax.lax.all_gather(b_local, axis_name)  # [nsp, ..., NB, d]

    T = u.shape[-1]
    aL = np.stack([
        np.linalg.matrix_power(m[0], T).T for m in bank.mats
    ]).astype(np.float32)  # [NB, d, d], right-mult form

    def step(i, s):
        s_next = jnp.einsum(
            "...bi,bij->...bj", s, jnp.asarray(aL),
            precision=jax.lax.Precision.HIGHEST,
        ) + b_all[i]
        return jnp.where(i < k, s_next, s)

    s0 = s0 + jnp.zeros_like(b_all[0])
    s_in = jax.lax.fori_loop(0, nsp, step, s0)

    y, s_out = bank.apply(u, s_in, prefer_block)
    s_fin = jax.lax.all_gather(s_out, axis_name)[nsp - 1]
    return y, s_fin
