#!/bin/sh
# Build the golden-reference CLI from the unmodified reference sources.
# Requires the read-only reference checkout (default /root/reference).
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/meters_golden}
mkdir -p "$OUT"
g++ -O2 -std=c++17 -I"$REF" -o "$OUT/golden" \
  "$(dirname "$0")/golden_main.cc" \
  "$REF/jmeters/vumeterdsp.cc" \
  "$REF/jmeters/iec1ppmdsp.cc" \
  "$REF/jmeters/iec2ppmdsp.cc" \
  "$REF/jmeters/msppmdsp.cc" \
  "$REF/jmeters/kmeterdsp.cc" \
  "$REF/jmeters/truepeakdsp.cc" \
  "$REF/jmeters/stcorrdsp.cc" \
  "$REF/ebumeter/ebu_r128_proc.cc" \
  "$REF/zita-resampler/resampler.cc" \
  "$REF/zita-resampler/resampler-table.cc" \
  -lpthread -lm
echo "$OUT/golden"
