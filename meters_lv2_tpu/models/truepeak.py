"""Digital true-peak meter (dBTP): 4x polyphase oversampling + Type-II-style
ballistics and raw oversampled peak.

Reference: jmeters/truepeakdsp.cc (DSP), src/meters.cc:438-508 (wrapper:
peak_max accumulation across reads).

TPU design: oversampling is a batched causal conv on the MXU
(ops.resample); ballistics ride the batched scan (ops.ballistics).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import ballistics as bal
from ..ops import design, resample
from .base import register


@dataclasses.dataclass(frozen=True)
class TruePeakMeterState:
    hist: jax.Array  # [..., 47] resampler history
    bal: bal.TruePeakState


jax.tree_util.register_dataclass(
    TruePeakMeterState, data_fields=["hist", "bal"], meta_fields=[]
)


@register("dBTPmono")
@register("dBTPstereo")
class TruePeakMeter:
    """read() returns (level, peak) = ballistic max and raw oversampled max."""

    def __init__(self, fs: float, dtype=jnp.float32):
        self.fs = float(fs)
        self.coeffs = design.true_peak_ballistics(fs)
        self.dtype = dtype

    def init(self, batch_shape=()) -> TruePeakMeterState:
        return TruePeakMeterState(
            hist=resample.upsample4_init(batch_shape, self.dtype),
            bal=bal.true_peak_init(batch_shape, self.dtype),
        )

    def update(self, state: TruePeakMeterState, x: jax.Array) -> TruePeakMeterState:
        mode = self._fused_mode()
        if mode != "0" and (mode != "auto" or self._fused_available()):
            # fused oversample+ballistics kernel: the 4x stream is born
            # and consumed in VMEM (ops/pallas_truepeak; round-5
            # roofline: the materialized 4x stream was the binder)
            b, hist = bal.true_peak_update_fused(
                self.coeffs, state.bal, x, state.hist,
                interpret=mode == "interpret",
            )
            return TruePeakMeterState(hist=hist, bal=b)
        up, hist = resample.upsample4(x, state.hist)
        b = bal.true_peak_update(self.coeffs, state.bal, jnp.abs(up))
        return TruePeakMeterState(hist=hist, bal=b)

    @staticmethod
    def _fused_mode() -> str:
        import os

        return os.environ.get("METERS_TPU_TP_FUSED", "auto")

    @staticmethod
    def _fused_available() -> bool:
        from ..ops import pallas_truepeak

        return pallas_truepeak.available()

    def process_max(self, state: TruePeakMeterState, x: jax.Array):
        """Oversampled |max| only (truepeakdsp.cc:109-131), used by R128 dBTP.

        Returns (block_max, new_state) where new_state tracks only hist.
        """
        up, hist = resample.upsample4(x, state.hist)
        m = jnp.max(jnp.abs(up), axis=-1)
        return m, dataclasses.replace(state, hist=hist)

    def read(self, state: TruePeakMeterState):
        m, p, b = bal.true_peak_read(state.bal)
        return {"level": m, "peak": p}, dataclasses.replace(state, bal=b)

    def reset(self, state: TruePeakMeterState) -> TruePeakMeterState:
        return dataclasses.replace(
            state, bal=bal.true_peak_init(state.bal.m.shape, self.dtype)
        )
