#!/bin/bash
# Round-4 metal batch 2: re-measure with the flipped defaults (plain
# gathers, SoA vertex, packed-trilinear + trilinear filter, reshape HZB).
# PROF_PACKED_TRI/PROF_FILTER pin the profiler to the NEW production
# defaults (its own env defaults predate the flip).
set -u
mkdir -p /tmp/metal4b
cd /root/repo
export PROF_PACKED_TRI=1
export PROF_FILTER=trilinear

echo "== probe ==" | tee /tmp/metal4b/log
rm -f /tmp/libtpu_lockfile
timeout 180 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal4b/log || exit 1

echo "== in-frame attribution (trace of the fused frame) ==" | tee -a /tmp/metal4b/log
timeout 2400 python tools/prof_frame.py traceattr 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal4b/traceattr.txt | tail -25

echo "== full stage profile (new defaults) ==" | tee -a /tmp/metal4b/log
timeout 5400 python tools/prof_frame.py 2>&1 | grep -vE "WARNING|INFO" | tee /tmp/metal4b/prof.txt | tail -50

echo "== gather prober (new rows: row-split, coef, pcf shapes) ==" | tee -a /tmp/metal4b/log
timeout 2400 python tools/prof_gather.py 2>&1 | grep -vE "WARNING|INFO" | tee /tmp/metal4b/gather.txt | tail -14

echo "== camera 16x128 re-check (plain coef gather) ==" | tee -a /tmp/metal4b/log
PROF_TILE_H=16 PROF_TILE_W=128 timeout 900 python tools/prof_frame.py rasterparts 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal4b/sweep.txt | tail -5

echo "== shadow span-1 with mid capacity (validity check) ==" | tee -a /tmp/metal4b/log
PROF_SPAN=1 PROF_MID_DIV=4 timeout 900 python tools/prof_frame.py shadowparts 2>&1 \
  | grep -vE "WARNING|INFO" | tee -a /tmp/metal4b/sweep.txt | tail -7

echo "== done batch 2 ==" | tee -a /tmp/metal4b/log
