"""Roofline accounting for the hot meter families (VERDICT round-4 #2).

For each family at its docs/BENCHMARKS.md "CURRENT per-meter table"
operating point this script computes:

  * modeled HBM bytes/update — the MINIMUM traffic of the shipped
    formulation (each term cited to the op that causes it), not a
    profiler counter;
  * modeled MXU pass-MACs/update — MACs x the bf16 pass multiple the
    formulation actually runs (3-pass HIGH feed-forward GEMMs, 6-pass
    splits where display precision demands, 1-pass where a single bf16
    pass is exact);
  * the measured fetch-synchronized device time (ms) from
    docs/BENCHMARKS.md (all round-4/5 numbers, single-element fetch
    barrier — see the round-4 measurement-integrity note);

and reports achieved % of the v5e HBM and MXU peaks, so every "floor"
claim in BENCHMARKS is falsifiable: a family far under BOTH roofs is
bound by something else (serial chains, relayouts, grid sequencing) and
says so in its note — or is headroom and says that.

v5e (TPU v5 lite) peaks used:
  HBM   819 GB/s
  MXU   197 TFLOP/s bf16 (f32 work runs as bf16 passes; pass-MACs
        below are already multiplied by the pass count, so the roof for
        every row is the bf16 number)
  VPU   ~3.9 Top/s f32 (8x128 lanes x 4 ALUs x ~940 MHz) — quoted in
        notes for VPU-bound families, not a table column.

Run `python tools/roofline.py` (pure host arithmetic, no jax).
`--markdown` emits the BENCHMARKS table body.
"""

from __future__ import annotations

import argparse

HBM_PEAK = 819e9  # bytes/s
MXU_PEAK = 197e12  # bf16 FLOP/s
FS = 48000
T = FS  # every row is a 1 s update at 48 kHz
BLK = 128  # kernel/filter block size (ops/pallas_r128._BLK)


def mb(x):
    return x / 1e6


class Fam:
    def __init__(self, name, ms, B, C, bytes_terms, pass_mac_terms, note):
        self.name = name
        self.ms = ms
        self.B, self.C = B, C
        self.bytes_terms = bytes_terms  # list of (label, bytes)
        self.mac_terms = pass_mac_terms  # list of (label, pass-MACs)
        self.note = note

    @property
    def bytes(self):
        return sum(v for _, v in self.bytes_terms)

    @property
    def pmacs(self):
        return sum(v for _, v in self.mac_terms)

    @property
    def hbm_pct(self):
        return 100.0 * (self.bytes / (self.ms * 1e-3)) / HBM_PEAK

    @property
    def mxu_pct(self):
        # pass-MACs already carry the pass multiple; x2 FLOPs per MAC
        return 100.0 * (2.0 * self.pmacs / (self.ms * 1e-3)) / MXU_PEAK


def families():
    fams = []

    # ---- EBU R128 fused headline (ops/pallas_r128.py) ------------------
    B, C = 256, 2
    nblk = T // BLK
    kw = B * C * nblk * BLK * BLK * 3          # block-Toeplitz K-weight conv, 3-pass
    tp = B * C * nblk * 2 * BLK * 256 * 3      # two stride-64 TP frame GEMMs
    #    [128-lane contraction -> 256 lanes] per 128-block (_tp_frame_mats)
    fams.append(Fam(
        "R128+dBTP fused (headline)", 1.06, B, C,
        [("input read (once, fused)", B * C * T * 4),
         ("combined power write", B * T * 4),
         ("power re-read (fragment epilogue)", B * T * 4)],
        [("K-weight conv 3-pass", kw), ("TP frame GEMMs 3-pass", tp)],
        "45% MXU / 23% HBM: the highest MXU fraction in the repo — "
        "the other half of the time is the mandatory exact-f32 VPU "
        "state/max chain interleaved between every block's dots plus "
        "the fragment epilogue (r3 kernel probe). Round-2's '~5x off "
        "pure-HBM roofline' described the UNFUSED path; the fused "
        "kernel supersedes it. The tile space is already swept flat — "
        "r_tile x k in {64,128,256} x {5,15,25} spans 1.573-1.646 ms "
        "(r4 flat-ingest sweep) — and r5's software-pipelining A/B on "
        "the TP kernel measured 7% WORSE with the note that this "
        "kernel's unrolled block loop has no barrier to remove: the "
        "VPU/MXU split is the formulation floor, not a tuning gap.",
    ))

    # ---- Spectrum 30-band fused v4 (ops/pallas_spectrum.py) ------------
    B, C = 256, 2
    conv = B * nblk * BLK * (30 * BLK) * 3      # [r,128]@[128,30*128] streamed dot
    smooth = B * 30 * nblk * BLK * BLK * 3      # per-band one-pole Toeplitz dots
    inject = B * nblk * BLK * 512 * 3           # x @ G into the packed [.,512] state
    fams.append(Fam(
        "Spectrum 30-band fused v4", 7.82, B, C,
        [("downmix read 2T", B * 2 * T * 4),
         ("downmix write T", B * T * 4),
         ("kernel input read", B * T * 4)],
        [("band conv 3-pass", conv), ("smoother dots 3-pass", smooth),
         ("state injection 3-pass", inject)],
        "~45% MXU with the modal At chain on the VPU: consistent with "
        "BENCHMARKS' 'the floor is the conv + smoother passes' — the "
        "remaining gap is the <=6 lane-shifted VPU FMA chain between "
        "every 128-sample block's dots (sequential with them).",
    ))

    # ---- Surround 5.0 fused (ops/pallas_surround.py) --------------------
    B, C = 204, 5
    corr = B * C * nblk * BLK * BLK * 3         # correlator one-pole Toeplitz GEMM
    fams.append(Fam(
        "Surround 5.0 fused", 4.63, B, C,
        [("input read (once, fused)", B * C * T * 4)],
        [("correlator conv 3-pass", corr)],
        "<6% of both roofs: the K-meter smoothers/pair products are "
        "VPU lane-reduces (~0.3 ms of ALU at peak) — the binder is the "
        "sequential channel-program grid + per-block VPU epilogues. "
        "Honest headroom hypothesis (~2-3x via one wider-lane program) "
        "was built and REFUTED later in round 5: wide measured 1.74x "
        "WORSE at 5.0 and a wash at 8.0 — grid sequencing is not a "
        "material cost; the residual is the per-block VPU epilogue "
        "itself (section below). Family is 4.4x over the 10k bar.",
    ))

    # ---- TruePeak dBTP (XLA conv + Pallas ballistics) --------------------
    B, C = 1024, 1
    tp = B * C * nblk * 2 * BLK * 256 * 3
    fams.append(Fam(
        "TruePeak dBTP", 7.74, B, C,
        [("input read", B * C * T * 4),
         ("4x stream write", B * C * 4 * T * 4),
         ("4x stream read (ballistics kernel)", B * C * 4 * T * 4)],
        [("TP frame GEMMs 3-pass", tp)],
        "28% HBM / 10% MXU: the 4x oversampled stream round-trips HBM "
        "between the conv and the ballistics kernel (1.57 GB of the "
        "1.77 GB model). Follow-up: fusing oversample+ballistics would "
        "cut bytes ~5x — DONE later in round 5 (ops/pallas_truepeak, "
        "1.82x measured; section below); this row documents the "
        "unfused path the model describes.",
    ))

    # ---- TruePeak dBTP FUSED (ops/pallas_truepeak.py) --------------------
    # Shipped path after the round-5 fusion: the 4x stream is born and
    # consumed in VMEM; the only large intermediate is the time-major
    # [T, nb, 8, 128] transpose of the RAW stream (4x smaller than the
    # old [B, 4T] one).  MACs are unchanged — fusion cut bytes, not MACs.
    B, C = 1024, 1
    tp = B * C * nblk * 2 * BLK * 256 * 3
    fams.append(Fam(
        "TruePeak dBTP FUSED", 4.23, B, C,
        [("input read", B * C * T * 4),
         ("time-major transpose write+read (raw rate)", 2 * B * C * T * 4)],
        [("TP frame GEMMs 3-pass (unchanged)", tp)],
        "The shipped post-fusion row: bytes cut 3.0x (1769 -> 590 MB), "
        "now ~17% HBM / ~18% MXU.  Far under both roofs by design: the "
        "binder is the serial per-frame attack/release recurrence "
        "between the frame GEMMs — round 5's envelope-composition A/B "
        "measured replacing it a WASH (4.23 vs 4.52 ms), i.e. the "
        "chain is not latency-bound, it is simply the work.  242k x rt "
        "= 24x over the bar; no follow-up.",
    ))

    # ---- DR-14 (kmeter + truepeak per channel + 3 s windows) ------------
    B, C = 512, 2
    tp = B * C * nblk * 2 * BLK * 256 * 3
    fams.append(Fam(
        "DR-14 / TPnRMS", 15.1, B, C,
        [("input read", B * C * T * 4),
         ("4x stream write+read (display TP)", 2 * B * C * 4 * T * 4),
         ("x^2 window series write+read (segment sums)",
          2 * B * C * T * 4)],
        [("TP frame GEMMs 3-pass", tp)],
        "18% HBM, traffic-shaped like the dBTP row (the display "
        "TruePeak's oversampled round-trip is 1.6 GB of the 2.2 GB "
        "model; same fusion follow-up applies — DONE in round 5, 1.79x "
        "measured, section below); the DR windows/8000-bin histogram "
        "update at 1/3 Hz and cost nothing at this cadence.",
    ))

    # ---- DR-14 FUSED (display TP through ops/pallas_truepeak.py) ---------
    B, C = 512, 2
    tp = B * C * nblk * 2 * BLK * 256 * 3
    fams.append(Fam(
        "DR-14 / TPnRMS FUSED", 8.31, B, C,
        [("input read", B * C * T * 4),
         ("time-major transpose write+read (raw rate)", 2 * B * C * T * 4),
         ("x^2 window series write+read (segment sums)",
          2 * B * C * T * 4)],
        [("TP frame GEMMs 3-pass (unchanged)", tp)],
        "Shipped post-fusion row: bytes 2163 -> 983 MB (2.2x), ~14% HBM "
        "/ ~9% MXU.  The remaining non-input traffic splits evenly "
        "between the TP kernel's transpose and the x^2 series the 3 s "
        "RMS segment sums read — fusing the latter into the kernel "
        "epilogue is possible but the family is already 6.2x over the "
        "bar at 61.6k x; not worth another kernel variant.",
    ))

    # ---- BitMeter fused (ops/pallas_bitmeter.py) -------------------------
    B, C = 1024, 1
    fams.append(Fam(
        "BitMeter fused", 35.3, B, C,
        [("input read", B * T * 4),
         ("transpose write+read ([T,B] sublane-major)", 2 * B * T * 4)],
        [],
        "No MXU work. ~2% HBM and ~5% of VPU ALU peak (18 SWAR trees "
        "x ~100 int ops/sample ~ 5e9 ops => ~1.3 ms at ALU peak): the "
        "measured binder is Mosaic sublane-reshape RELAYOUTS between "
        "SWAR stages, not ALU — consistent with r4's in-kernel A/B "
        "(2.9x over XLA but far from ALU peak). Refutation of further "
        "fusing: relayout throughput is a hardware property of the "
        "transposed group-sum layout; the alternative (lane-major) "
        "measured 20x worse in r2 (docs/BENCHMARKS.md).",
    ))

    # ---- SigDist (one-hot bincount, 361 bins) ----------------------------
    B, C = 1024, 1
    onehot = B * T * 361 * 6  # HIGHEST einsum (ops/hist.py:67) -> 6-pass
    fams.append(Fam(
        "SigDist 361-bin", 30.8, B, C,
        [("input read", B * T * 4)],
        [("one-hot bincount einsum (HIGHEST)", onehot)],
        "3.5% MXU — but the MXU is not the binder: the one-hot "
        "CONSTRUCTION (compare+select+convert over T x 361 = 1.8e10 "
        "elements, fused into the dot's operand) is VPU work, plus an "
        "8-sublane-padded HIGHEST matvec combine. Follow-up DONE later "
        "in round 5: the factored radix-64 bincount cut both (6+64 "
        "compares/sample, filled single-pass dot) — measured 3.94x, "
        "30.8 -> 7.81 ms (section below); this row documents the "
        "single-level path the model describes. r3's SWAR alternative "
        "measured WORSE at 361 bins (docs/BENCHMARKS.md).",
    ))

    # ---- SigDist radix-64 factored bincount (ops/hist.py bincount) ------
    # Shipped path: bin = hi*64 + lo; two narrow one-hots (6 + 64
    # compares/sample on the VPU) combined by one [6, chunk] @
    # [chunk, 64] dot per chunk.  Unit-weight one-hots are bf16-exact,
    # so the dot runs SINGLE-pass.
    B, C = 1024, 1
    combine = B * T * 6 * 64  # [R1,chunk]@[chunk,64] summed over chunks
    fams.append(Fam(
        "SigDist radix-64 FUSED", 7.81, B, C,
        [("input read", B * T * 4)],
        [("radix combine dot 1-pass (bf16-exact)", combine)],
        "Shipped factored-bincount row: pass-MACs 106.5 -> 18.9 G (and "
        "the dot's output tiles are filled instead of an 8-sublane-"
        "padded matvec).  3% of both roofs: the binder is the one-hot "
        "CONSTRUCTION — 70 compares/sample = 3.4e9 VPU element-ops "
        "(~0.9 ms at ALU peak => ~11% ALU) plus the bf16 operand "
        "conversion relayouts.  131k x rt = 13x over the bar.",
    ))

    # ---- Phasewheel / stereoscope fused STFT (ops/pallas_stft.py) -------
    B, C = 256, 2
    hop = 1920  # ceil(48000/25 fps) (ops/fft.py:197), % 128 == 0
    F = T // hop
    # per frame per channel: stage1 [128,64]@[64,128] re|im-concat cos|sin,
    # stage2 [64,128]@[128,128] for re and im inputs; 6-pass splits
    stage1 = B * C * F * 128 * 64 * 128 * 6
    stage2 = B * C * F * 2 * 64 * 128 * 128 * 6
    fams.append(Fam(
        "Phasewheel 8k-FFT fused", 10.02, B, C,
        [("ring read (pre-transposed)", B * C * T * 4),
         ("transpose write+read", 2 * B * C * T * 4)],
        [("DFT stage 1 (6-pass)", stage1), ("DFT stage 2 (6-pass)", stage2)],
        "~25% MXU at the mandatory 6-pass display precision (3-pass "
        "measured failing -60 dB bins, r4). Remaining time is the "
        "twiddle/reblock VPU stages and the in-kernel band analysis "
        "(21% win over the XLA epilogue, r4 A/B). Stereoscope is the "
        "same kernel at B=64: measured 2.78 ms ~= the 10.02 ms row "
        "scaled by batch (2.5 ms) — grid underfill, not a new binder.",
    ))

    # ---- Goniometer 4x (XLA path) ----------------------------------------
    B, C = 128, 2
    tp = B * C * nblk * 2 * BLK * 256 * 3  # same zita 4x upsample GEMM form
    fams.append(Fam(
        "Goniometer 4x", 5.3, B, C,
        [("input read", B * C * T * 4),
         ("4x stream write+read", 2 * B * C * 4 * T * 4)],
        [("oversample frame GEMMs 3-pass", tp)],
        "10% HBM / 4% MXU: the materialized 4x stream is 89% of the "
        "traffic model but the measured binder is the per-frame VPU "
        "epilogue (HP filter, rotate, asymmetric autogain min/max "
        "scans). Follow-up DONE later in round 5 WITHOUT a kernel: the "
        "near-memoryless smoother folds into the polyphase taps "
        "(composed FIR, ops/resample.composed_smooth_taps) — 5.51 -> "
        "3.20 ms measured (1.72x, 40.0k x); this row documents the "
        "unfused path the model describes.",
    ))

    # ---- Goniometer composed FIR (ops/resample.composed_smooth_taps) ----
    # Shipped path: the trace smoother's 4-tap FIR equivalent convolves
    # into the upsampling taps, so oversample+smooth is ONE overlapping-
    # block GEMM [128+48, 4*128] per block — the 4x stream is never
    # materialized as an INTERMEDIATE; the os-rate x/y trace remains as
    # the OUTPUT (it is the product) and is re-read once by the
    # rotate/autogain pass.
    B, C = 128, 2
    comb = B * C * nblk * (BLK + 48) * (4 * BLK) * 3
    fams.append(Fam(
        "Goniometer composed FIR", 3.20, B, C,
        [("input read", B * C * T * 4),
         ("os-rate trace write+read (the output)", 2 * B * C * 4 * T * 4)],
        [("composed frame GEMM 3-pass", comb)],
        "Shipped composed-FIR row: the blocked one-pole smoother stage "
        "— its 2nd GEMM pass, d=1 scan, AND the extra os-rate round-"
        "trip the unfused row's 442 MB model charitably omitted (~393 "
        "MB) — is gone algebraically (no kernel needed).  The 442 MB "
        "model is now TIGHT: the remaining traffic IS the product (the "
        "display trace) plus its one re-read by the per-block autogain "
        "min/max scans — the same VPU epilogue the unfused row named.  "
        "~17% HBM / ~8% MXU; 40.0k x rt = 4x over the bar.",
    ))

    return fams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    fams = families()
    if args.markdown:
        print("| family (op point) | ms | model MB | GB/s (%HBM) | "
              "pass-GMACs | TFLOP/s (%MXU) | binder / note |")
        print("|---|---|---|---|---|---|---|")
    for f in fams:
        gbs = f.bytes / (f.ms * 1e-3) / 1e9
        tf = 2.0 * f.pmacs / (f.ms * 1e-3) / 1e12
        if args.markdown:
            print(f"| {f.name} ({f.B}x{f.C}ch) | {f.ms} | "
                  f"{mb(f.bytes):.0f} | {gbs:.0f} ({f.hbm_pct:.0f}%) | "
                  f"{f.pmacs / 1e9:.1f} | {tf:.1f} ({f.mxu_pct:.0f}%) | "
                  f"{f.note} |")
        else:
            print(f"== {f.name}  ({f.B} x {f.C}ch x 1 s, {f.ms} ms)")
            for lbl, v in f.bytes_terms:
                print(f"   bytes  {mb(v):9.1f} MB  {lbl}")
            for lbl, v in f.mac_terms:
                print(f"   pMACs  {v / 1e9:9.2f} G   {lbl}")
            print(f"   -> {gbs:6.1f} GB/s ({f.hbm_pct:4.1f}% HBM)   "
                  f"{tf:6.1f} TFLOP/s ({f.mxu_pct:4.1f}% MXU)")
            print(f"   note: {f.note}\n")


if __name__ == "__main__":
    main()
