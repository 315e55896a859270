/* meters.lv2-tpu native runtime — C API.
 *
 * Native components mirroring the reference's C/C++ runtime role:
 *  - WAV decode/encode (PCM16/24/32, float32) to planar float32
 *  - a streaming scalar CPU metering engine with the same constants as
 *    the TPU path (independent implementation, used as an on-host
 *    reference/fallback and for test fixtures without the upstream repo)
 *
 * All functions return 0 on success, negative on error unless noted.
 */

#ifndef METERS_NATIVE_H
#define METERS_NATIVE_H

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- WAV IO ---- */

/* Reads a RIFF/WAVE file into planar float32 (channel-major).
 * On success *data is malloc'd (nchan*nframes floats) — free with
 * mt_free. Supports PCM 16/24/32-bit and IEEE float32/float64. */
int mt_wav_read(const char* path, float** data, int32_t* nchan,
                int64_t* nframes, int32_t* rate);

/* Writes planar float32 as WAV. format: 16 = PCM16, 32 = float32. */
int mt_wav_write(const char* path, const float* data, int32_t nchan,
                 int64_t nframes, int32_t rate, int32_t format);

void mt_free(void* p);

/* Parallel batch decode (thread pool; n_threads <= 0 = hardware
 * concurrency).  Per file i: rc[i] = mt_wav_read status; on success
 * data[i] is malloc'd planar f32 (free each with mt_free).  Returns the
 * number of failed files. */
int mt_wav_read_batch(const char** paths, int32_t n, int32_t n_threads,
                      float** data, int32_t* nchan, int64_t* nframes,
                      int32_t* rate, int32_t* rc);

/* ---- streaming metering engine ---- */

typedef enum {
  MT_VU = 0,
  MT_IEC1 = 1,        /* DIN / Nordic PPM */
  MT_IEC2 = 2,        /* BBC / EBU PPM */
  MT_KMETER = 3,      /* RMS + digital peak */
  MT_TRUEPEAK = 4,    /* 4x oversampled */
  MT_STCORR = 5,      /* stereo phase correlation */
  MT_R128 = 6,        /* EBU R128 loudness */
  MT_SPECTRUM = 7,    /* 30-band 1/3-octave analyzer */
  MT_MSPPM = 8,       /* BBC mid/side M-6 */
  MT_SIGDIST = 9,     /* signal-distribution histogram (summary) */
  MT_BITMETER = 10,   /* IEEE-754 stats (summary) */
  MT_DR14 = 11,       /* DR-14 crest-factor meter (3 s windows) */
  MT_TPNRMS = 12,     /* dBTP + RMS display (dr14.c dr_mode=false) */
  MT_GONIO = 13,      /* goniometer trace (nchan arg = oversample 1/2/4/8) */
  MT_PHASEWHEEL = 14, /* 8192-pt STFT per-bin phase difference (stereo) */
  MT_STEREOSCOPE = 15,/* 8192-pt STFT per-bin L/R position (stereo) */
  MT_SURROUND = 16,   /* N-channel K-meters + 4 correlation pairs */
} mt_meter_kind;

typedef struct mt_engine mt_engine;

/* nchan: independent channels (STCORR/R128 interpret them jointly;
 * GONIO repurposes it as the oversample factor and is always stereo).
 * Bounds enforced (NULL on violation): nchan >= 1; R128 <= 5 (mono..5.0
 * gain table); PHASEWHEEL/STEREOSCOPE == 2; SURROUND 3..8. */
mt_engine* mt_engine_create(int kind, float fs, int nchan);
void mt_engine_destroy(mt_engine* e);

/* Feed one block of planar float32 (ch-major: data[c*nframes + t]).
 * VU/IEC1/IEC2/KMETER/MSPPM/DR14/TPNRMS run 4-sample ballistics grains
 * (jmeters unrolled loops): nframes must be a multiple of 4 (-3
 * otherwise, matching the JAX path's block-granularity assert). */
int mt_engine_process(mt_engine* e, const float* data, int64_t nframes);

/* Read current values. Layout depends on kind:
 *  VU/IEC1/IEC2: nchan values (read-and-reset max, pre-gain applied)
 *  KMETER:       2*nchan (rms, peak per channel)
 *  TRUEPEAK:     2*nchan (ballistic level, raw oversampled peak)
 *  STCORR:       1 (correlation)
 *  R128:         8 (M, S, maxM, maxS, I, LRAmin, LRAmax, dBTP)
 *  SPECTRUM:     60 (30 band dB + 30 peak-hold dB)
 *  MSPPM:        2 (mid, side)
 *  SIGDIST:      5 (peak bin, peak count, sum, variance M2, count)
 *  BITMETER:     7 (zero, pos, nan, inf, den, min, max)
 *  DR14:         5*nchan (v_rms, v_peak, m_peak coeffs; m_rms dB; DR
 *                per channel) + (dr_total, block_count)
 *  TPNRMS:       4*nchan (v_rms, v_peak, m_peak, m_rms coeffs)
 *  GONIO:        7 (gain, xmin, xmax, ymin, ymax, last_x, last_y;
 *                extrema are read-and-reset)
 *  PHASEWHEEL:   1 + 2*4096 (peak; last frame dphi[4096], level[4096])
 *  STEREOSCOPE:  2*4096 (last frame lr[4096], level[4096])
 *  SURROUND:     2*nchan (rms, peak per channel) + npairs correlations
 *                (npairs = 4, or 3 when nchan <= 3)
 * Returns the number of values written, or negative on error. */
int mt_engine_read(mt_engine* e, double* out, int maxn);

#ifdef __cplusplus
}
#endif

#endif /* METERS_NATIVE_H */
