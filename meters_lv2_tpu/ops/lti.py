"""Blocked linear-time-invariant (LTI) recurrence evaluation for TPU.

Every *linear* recurrence in the meter suite — the BS.1770 K-weighting
filter (ebu_r128_proc.cc:319-328), the VU ballistics (vumeterdsp.cc:45-87),
the K-meter RMS smoothers (kmeterdsp.cc:77-107), the correlation one-poles
(stcorrdsp.cc:56-69) and the 30-band IEC 61260 biquad cascades
(spectr.c:68-87) — is an instance of

    s[t+1] = A s[t] + B u[t]        (state s: R^d, input u: R^m)
    y[t]   = C s[t] + D u[t]

Instead of translating the reference's per-sample loops, we evaluate the
recurrence in blocks of T samples: within a block the output is an exact
affine function of the incoming state and the block's inputs,

    y_blk = U_blk @ K^T + s_in @ Sy^T
    s_out = s_in @ (A^T)^T + vec(U_blk) @ G

where K is the lower-triangular block Toeplitz matrix of the truncated
impulse response. These are dense matmuls over the (large) batch axis, so
the sequential chain is only n_blocks long and all per-sample work runs on
the MXU. Block matrices are precomputed on the host in float64 and shipped
as float32 constants.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import os as _os

# Matmul precision for the recurrence GEMMs.  HIGH (3-pass bf16) is the
# default: tools/tpu_parity_check.py measures worst-case 0.0043 dB vs the
# C reference with bin-exact gating histograms (budget 0.01 dB), at ~2x the
# MXU throughput of HIGHEST (6-pass).  Override with
# METERS_TPU_PRECISION=highest for the conservative mode.
_HIGH = (
    jax.lax.Precision.HIGHEST
    if _os.environ.get("METERS_TPU_PRECISION", "high") == "highest"
    else jax.lax.Precision.HIGH
)

# STATE-CHAIN precision is always HIGHEST: errors in the state propagation
# (s @ A^T and the associative-scan composition) COMPOUND across blocks,
# amplified by resonant poles — measured 0.25 dB on the 25 Hz 1/3-octave
# band (pole radius 1-1e-5) at HIGH vs 0.0006 dB at HIGHEST, while the
# feed-forward conv/injection GEMMs are insensitive (docs/BENCHMARKS.md
# round 4 precision table).  These matmuls are d x d (d <= 12) — the cost
# is negligible next to the block-Toeplitz conv.
_STATE = jax.lax.Precision.HIGHEST


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LTIBlockOp:
    """Precomputed block-recurrence operator.

    Attributes (all jnp.float32 unless noted):
      kmat:  [T*m, T*p]  lower block-triangular input->output map
      sy:    [d, T*p]    state->output map (rows of C A^j)
      at:    [d, d]      A^T_block (state propagation over one block)
      g:     [T*m, d]    input->state map (A^{T-1-j} B columns)
      block: static python int, samples (input steps) per block
      d, m, p: state/input/output dims
    """

    kmat: jax.Array
    sy: jax.Array
    at: jax.Array
    g: jax.Array
    block: int
    d: int
    m: int
    p: int

    def tree_flatten(self):
        return (self.kmat, self.sy, self.at, self.g), (self.block, self.d, self.m, self.p)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kmat, sy, at, g = children
        block, d, m, p = aux
        return cls(kmat=kmat, sy=sy, at=at, g=g, block=block, d=d, m=m, p=p)


def build_lti_block_op(
    A: np.ndarray,
    B: np.ndarray,
    C: np.ndarray,
    D: np.ndarray,
    block: int,
    dtype=jnp.float32,
) -> LTIBlockOp:
    """Precompute block matrices in float64 on the host."""
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    C = np.asarray(C, np.float64)
    D = np.asarray(D, np.float64)
    d = A.shape[0]
    m = B.shape[1]
    p = C.shape[0]
    T = int(block)

    # powers of A: apow[j] = A^j, j = 0..T
    apow = np.empty((T + 1, d, d))
    apow[0] = np.eye(d)
    for j in range(1, T + 1):
        apow[j] = A @ apow[j - 1]

    # impulse response h[0] = D, h[i] = C A^{i-1} B  (shape [T, p, m])
    h = np.empty((T, p, m))
    h[0] = D
    for i in range(1, T):
        h[i] = C @ apow[i - 1] @ B

    # K[(i,p),(j,m)] = h[i-j] for i >= j  → y_i = sum_j h[i-j] u_j
    kmat = np.zeros((T * p, T * m))
    for i in range(T):
        for j in range(i + 1):
            kmat[i * p : (i + 1) * p, j * m : (j + 1) * m] = h[i - j]

    # Sy[(i,p), d] = C A^i
    sy = np.empty((T * p, d))
    for i in range(T):
        sy[i * p : (i + 1) * p] = C @ apow[i]

    # G[(j,m), d]: s_out = A^T s_in + sum_j A^{T-1-j} B u_j  → columns
    g = np.empty((T * m, d))
    for j in range(T):
        g[j * m : (j + 1) * m] = (apow[T - 1 - j] @ B).T

    # NB: leaves are host numpy arrays, NOT jnp arrays — ops are built
    # lazily (possibly inside a jit trace) and cached on the system object;
    # numpy constants embed cleanly into any later trace, whereas device
    # arrays created mid-trace would leak tracers.
    npdt = np.dtype(dtype)
    return LTIBlockOp(
        kmat=np.asarray(kmat.T, npdt),  # stored transposed: u @ kmat.T
        sy=np.asarray(sy.T, npdt),
        at=np.asarray(apow[T].T, npdt),
        g=np.asarray(g, npdt),
        block=T,
        d=d,
        m=m,
        p=p,
    )


def _mm_blocks(a: jax.Array, w: jax.Array) -> jax.Array:
    """Per-block inputs a [..., (NB,) nblk, i] @ w [(NB,) i, j]."""
    if w.ndim == 2:
        return jnp.matmul(a, w, precision=_HIGH)
    return jnp.einsum("...bni,bij->...bnj", a, w, precision=_HIGH)


def _mm_state(a: jax.Array, w: jax.Array) -> jax.Array:
    """State a [..., (NB,) i] @ w [(NB,) i, j] — always HIGHEST (compounds)."""
    if w.ndim == 2:
        return jnp.matmul(a, w, precision=_STATE)
    return jnp.einsum("...bi,bij->...bj", a, w, precision=_STATE)


def lti_scan(op: LTIBlockOp, u: jax.Array, s0: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Run the blocked recurrence.

    The input→output convolution within each block is state-independent, so
    it runs for ALL blocks as one large batched GEMM (great MXU utilization);
    only the tiny d-dimensional state recurrence is sequential:

        conv_y[k] = u[k] @ K            (parallel over blocks)
        gin[k]    = u[k] @ G            (parallel over blocks)
        s[k+1]    = s[k] @ A^T + gin[k] (scan, d-dim)
        y[k]      = conv_y[k] + s[k] @ Sy

    Args:
      op: precomputed block operator (leaves may carry a leading bank dim).
      u:  inputs, shape [..., T_total, m] (T_total divisible by op.block)
          or [..., T_total] when m == 1.
      s0: initial state, shape [..., d].

    Returns:
      (y, s_final): y has shape [..., T_total, p] (or [..., T_total] if the
      input was rank-reduced and p == 1); s_final [..., d].
    """
    squeeze = False
    if u.ndim == s0.ndim:  # missing input-channel dim
        u = u[..., None]
        squeeze = op.p == 1
    *batch, T_total, m = u.shape
    assert m == op.m, (m, op.m)
    assert T_total % op.block == 0, (T_total, op.block)
    nblk = T_total // op.block

    uf = u.reshape(*batch, nblk, op.block * op.m)
    conv_y = _mm_blocks(uf, op.kmat)  # [..., nblk, T*p]
    gin = _mm_blocks(uf, op.g)  # [..., nblk, d]
    gin_t = jnp.moveaxis(gin, -2, 0)  # [nblk, ..., d]

    # join varying-axes metadata with the inputs' (relevant under
    # jax.shard_map, where a locally-created zero state is "unvarying" but
    # the scanned inputs vary over the mesh axes)
    s0 = s0 + jnp.zeros_like(gin_t[0])

    if nblk >= 16 and op.kmat.ndim == 2:
        # log-depth block-state propagation: the per-block affine maps
        # s -> s @ At + g compose associatively ((A1@A2, b1@A2 + b2)), so
        # prefix states come from one associative_scan instead of an
        # nblk-step sequential loop (the loop's per-step overhead, not its
        # FLOPs, dominates on TPU).
        d = op.d
        A_el = jnp.broadcast_to(jnp.asarray(op.at), (nblk, d, d))
        b_el = gin_t.reshape(nblk, -1, d)  # [nblk, B*, d]

        def compose(l, r):
            Al, bl = l
            Ar, br = r
            A2 = jnp.matmul(Al, Ar, precision=_STATE)
            b2 = jnp.einsum("k...i,kij->k...j", bl, Ar, precision=_STATE) + br
            return A2, b2

        A_pre, b_pre = jax.lax.associative_scan(compose, (A_el, b_el))
        # entry state of block i: s0 @ A_pre[i-1] + b_pre[i-1]; block 0 = s0
        s0f = s0.reshape(-1, d)
        s_entry = (
            jnp.einsum("bi,kij->kbj", s0f, A_pre, precision=_STATE) + b_pre
        )  # [nblk, B*, d] = states entering blocks 1..nblk (index i -> block i+1)
        s_all = jnp.concatenate([s0f[None], s_entry[:-1]], axis=0)
        s_fin = s_entry[-1].reshape(s0.shape)
        s_all = jnp.moveaxis(
            s_all.reshape(nblk, *s0.shape), 0, -2
        )  # [..., nblk, d]
    else:
        def step(s, gk):
            return _mm_state(s, op.at) + gk, s

        s_fin, s_all = jax.lax.scan(step, s0, gin_t)
        s_all = jnp.moveaxis(s_all, 0, -2)  # [..., nblk, d] (entry states)

    y = conv_y + _mm_blocks(s_all, op.sy)
    y = y.reshape(*batch, T_total, op.p)
    if squeeze:
        y = y[..., 0]
    return y, s_fin


class LTISystem:
    """An (A, B, C, D) system plus a cache of block operators.

    ``apply`` handles arbitrary step counts by splitting into a main run of
    ``prefer_block``-sized blocks plus one remainder block, so callers can
    feed any block length without rebuilding constants per call.
    """

    def __init__(self, A, B, C, D, dtype=jnp.float32):
        self.A = np.asarray(A, np.float64)
        self.B = np.asarray(B, np.float64)
        self.C = np.asarray(C, np.float64)
        self.D = np.asarray(D, np.float64)
        self.d = self.A.shape[0]
        self.m = self.B.shape[1]
        self.p = self.C.shape[0]
        self.dtype = dtype
        self._ops: dict[int, LTIBlockOp] = {}

    def op(self, block: int) -> LTIBlockOp:
        if block not in self._ops:
            self._ops[block] = build_lti_block_op(
                self.A, self.B, self.C, self.D, block, self.dtype
            )
        return self._ops[block]

    def init(self, batch_shape=()) -> jax.Array:
        return jnp.zeros((*batch_shape, self.d), self.dtype)

    def apply(
        self, u: jax.Array, s0: jax.Array, prefer_block: int = 128
    ) -> tuple[jax.Array, jax.Array]:
        """Run the recurrence over u [..., T(, m)] from state s0 [..., d]."""
        squeeze = u.ndim == s0.ndim
        if squeeze:
            u = u[..., None]
        T = u.shape[-2]
        main = (T // prefer_block) * prefer_block
        ys = []
        s = s0
        if main:
            y, s = lti_scan(self.op(prefer_block), u[..., :main, :], s)
            ys.append(y)
        if T - main:
            y, s = lti_scan(self.op(T - main), u[..., main:, :], s)
            ys.append(y)
        y = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=-2)
        if squeeze and self.p == 1:
            y = y[..., 0]
        return y, s


class BankedLTISystem:
    """A bank of NB independent same-dimension LTI systems (e.g. the 30
    IEC 61260 band filters) evaluated together: block operators are stacked
    along a leading bank axis and the per-block GEMMs batch over it.

    apply() semantics match LTISystem.apply with an extra bank axis: input
    u [..., T] is broadcast to every bank; output y is [..., NB, T];
    state s is [..., NB, d].
    """

    def __init__(self, systems: list[tuple], dtype=jnp.float32):
        self.mats = [
            tuple(np.asarray(m, np.float64) for m in s) for s in systems
        ]
        d0 = self.mats[0][0].shape[0]
        assert all(m[0].shape[0] == d0 for m in self.mats)
        self.nb = len(systems)
        self.d = d0
        self.m = self.mats[0][1].shape[1]
        self.p = self.mats[0][2].shape[0]
        self.dtype = dtype
        self._ops: dict[int, LTIBlockOp] = {}

    def op(self, block: int) -> LTIBlockOp:
        if block not in self._ops:
            ops = [
                build_lti_block_op(*m, block, self.dtype) for m in self.mats
            ]
            self._ops[block] = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *ops
            )
        return self._ops[block]

    def init(self, batch_shape=()) -> jax.Array:
        return jnp.zeros((*batch_shape, self.nb, self.d), self.dtype)

    def apply(
        self, u: jax.Array, s0: jax.Array, prefer_block: int = 128
    ) -> tuple[jax.Array, jax.Array]:
        """u: [..., T] (shared across banks); s0: [..., NB, d].
        Returns (y [..., NB, T], s [..., NB, d])."""
        ub = jnp.broadcast_to(
            u[..., None, :], (*u.shape[:-1], self.nb, u.shape[-1])
        )[..., None]  # [..., NB, T, 1]
        T = u.shape[-1]
        main = (T // prefer_block) * prefer_block
        ys = []
        s = s0
        if main:
            y, s = lti_scan(self.op(prefer_block), ub[..., :main, :], s)
            ys.append(y)
        if T - main:
            y, s = lti_scan(self.op(T - main), ub[..., main:, :], s)
            ys.append(y)
        y = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=-2)
        return y[..., 0], s


def one_pole_block_op_traced(omega, block: int, dtype=jnp.float32) -> LTIBlockOp:
    """Block operator for z' = (1-w) z + w x, y = z', with a TRACED omega.

    Enables runtime-mutable smoothing speeds (the reference changes its
    display speed via a control port without rebuilding anything,
    src/spectrumlv2.c:161-177) inside one compiled program: the Toeplitz /
    state maps are computed in-graph from omega.  Powers go through
    exp(k*log1p(-w)) so tiny omegas (slow speeds) don't lose precision to
    the f32 representation of 1-w.
    """
    om = jnp.asarray(omega, dtype)
    l1 = jnp.log1p(-om)  # log(1 - w)
    kk = jnp.arange(block + 1, dtype=dtype)
    pw = jnp.exp(kk * l1)  # (1-w)^k, k = 0..block
    idx = jnp.arange(block)[:, None] - jnp.arange(block)[None, :]
    kmat = jnp.where(
        idx >= 0, om * jnp.exp(idx.astype(dtype) * l1), jnp.zeros((), dtype)
    )  # K[i, j] = w (1-w)^{i-j}
    return LTIBlockOp(
        kmat=kmat.T,  # stored transposed, as build_lti_block_op does
        sy=pw[1 : block + 1][None, :],  # C A^i = (1-w)^{i+1}
        at=pw[block : block + 1][None, :],  # A^block
        g=(om * pw[:block][::-1])[:, None],  # A^{c-1-j} B
        block=block,
        d=1,
        m=1,
        p=1,
    )


def one_pole_apply_traced(
    omega, u: jax.Array, s0: jax.Array, prefer_block: int = 128
):
    """LTISystem.apply equivalent for the traced-omega one-pole.

    u: [..., T]; s0: [..., 1]; omega: scalar (traced OK).
    Returns (y [..., T], s [..., 1])."""
    T = u.shape[-1]
    main = (T // prefer_block) * prefer_block
    ys = []
    s = s0
    if main:
        y, s = lti_scan(
            one_pole_block_op_traced(omega, prefer_block, u.dtype),
            u[..., :main, None], s,
        )
        ys.append(y[..., 0])
    if T - main:
        y, s = lti_scan(
            one_pole_block_op_traced(omega, T - main, u.dtype),
            u[..., main:, None], s,
        )
        ys.append(y[..., 0])
    y = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=-1)
    return y, s


def one_pole_system(w: float, dtype=jnp.float32) -> LTISystem:
    """z' = (1-w) z + w x ; y = z' (post-update value, as the meters read)."""
    A = np.array([[1.0 - w]])
    B = np.array([[w]])
    # y[t] must be the *updated* state: y = (1-w) z + w x
    C = np.array([[1.0 - w]])
    D = np.array([[w]])
    return LTISystem(A, B, C, D, dtype)


def grouped4_smoother_system(w: float, dtype=jnp.float32) -> LTISystem:
    """The shared VU/K-meter two-stage smoother at 4-sample cadence.

    Semantics (vumeterdsp.cc:56-68 / kmeterdsp.cc:77-107): per group of 4
    inputs u0..u3 (|x| - z2/2 for VU via vu_grouped4_op; x^2 for K-meter)::

        z1 += w*(u_i - z1)      (4x; K-meter: u_i = x_i^2)
        z2 += 4w*(z1 - z2)      (once per group)

    For the K-meter the group input enters plainly: u_i = x_i^2, i.e. the
    recurrence is LTI with 4 inputs per step. Output = z2 after update.
    State order: (z1, z2).
    """
    wq = float(w)
    # one group: z1 path
    # z1_out = (1-w)^4 z1 + sum_i w (1-w)^{3-i} u_i
    a = 1.0 - wq
    A1 = a**4
    Bu = np.array([wq * a**3, wq * a**2, wq * a, wq])
    # z2_out = (1-4w) z2 + 4w z1_out
    A = np.array([[A1, 0.0], [4 * wq * A1, 1.0 - 4 * wq]])
    B = np.vstack([Bu, 4 * wq * Bu])  # [2, 4]
    C = np.array([[4 * wq * A1, 1.0 - 4 * wq]])  # z2 after update
    D = (4 * wq * Bu)[None, :]
    return LTISystem(A, B, C, D, dtype)


def vu_grouped4_system(w: float, dtype=jnp.float32) -> LTISystem:
    """VU meter exact 4-sample-cadence recurrence (vumeterdsp.cc:56-68).

    Per group with t2 = z2/2 frozen at group start::

        z1 += w*(|x_i| - z2/2 - z1)   (4x)
        z2 += 4w*(z1 - z2)

    Inputs are |x_i| (4 per group); output = z2 after the group update.
    The -z2/2 feed makes z2 enter the z1 path: fold into A.
    """
    wq = float(w)
    a = 1.0 - wq
    # z1_out = a^4 z1 + (sum_i w a^{3-i}) * (-z2/2) + sum_i w a^{3-i} |x_i|
    Bu = np.array([wq * a**3, wq * a**2, wq * a, wq])
    s_b = Bu.sum()
    A = np.array(
        [
            [a**4, -0.5 * s_b],
            [4 * wq * a**4, 1.0 - 4 * wq - 4 * wq * 0.5 * s_b],
        ]
    )
    B = np.vstack([Bu, 4 * wq * Bu])
    C = A[1:2, :]
    D = B[1:2, :]
    return LTISystem(A, B, C, D, dtype)
