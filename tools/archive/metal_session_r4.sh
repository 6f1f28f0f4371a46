#!/bin/bash
# Round-4 metal session, part 1: DECISION ROWS FIRST (VERDICT r3 #1 -- the
# staged queue must fire).  bench.py runs separately AFTER the winning
# defaults are flipped, so the judged number carries the wins.
# Produces /tmp/metal4/{prof.txt,binparts.txt,gather.txt,sweep.txt}.
set -u
mkdir -p /tmp/metal4
cd /root/repo

echo "== probe ==" | tee /tmp/metal4/log
rm -f /tmp/libtpu_lockfile
timeout 180 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal4/log || exit 1

echo "== stage profile (all stages incl sub-parts) ==" | tee -a /tmp/metal4/log
timeout 5400 python tools/prof_frame.py 2>&1 | grep -vE "WARNING|INFO" | tee /tmp/metal4/prof.txt | tail -45

echo "== binning sub-parts (sort vs pair gather vs scatter vs coef) ==" | tee -a /tmp/metal4/log
timeout 1800 python tools/prof_frame.py binparts 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal4/binparts.txt | tail -14

echo "== gather law: lanes vs bytes ==" | tee -a /tmp/metal4/log
timeout 2400 python tools/prof_gather.py 2>&1 | grep -vE "WARNING|INFO" | tee /tmp/metal4/gather.txt | tail -36

# tile-shape sweep on the two dominant kernels; each row independent
echo "== raster tile sweep ==" | tee -a /tmp/metal4/log
for cfg in "8 128 64" "16 128 64" "16 64 128" "32 128 64" "32 256 64"; do
  set -- $cfg
  echo "-- tile_h=$1 tile_w=$2 chunk=$3 --" | tee -a /tmp/metal4/sweep.txt
  PROF_TILE_H=$1 PROF_TILE_W=$2 PROF_CHUNK=$3 timeout 900 \
    python tools/prof_frame.py rasterparts 2>&1 \
    | grep -vE "WARNING|INFO" | tee -a /tmp/metal4/sweep.txt | tail -5
done
for cfg in "16 256 64" "32 256 64" "64 128 64" "32 128 128"; do
  set -- $cfg
  echo "-- shadow_tile_h=$1 shadow_tile_w=$2 shadow_chunk=$3 --" | tee -a /tmp/metal4/sweep.txt
  PROF_SHADOW_TILE_H=$1 PROF_SHADOW_TILE_W=$2 PROF_SHADOW_CHUNK=$3 timeout 900 \
    python tools/prof_frame.py shadowparts 2>&1 \
    | grep -vE "WARNING|INFO" | tee -a /tmp/metal4/sweep.txt | tail -6
done

echo "== span-1 binning (pairs = T, crossers to mid level) ==" | tee -a /tmp/metal4/log
echo "-- span=1 mid_div=4 camera --" | tee -a /tmp/metal4/sweep.txt
PROF_SPAN=1 PROF_MID_DIV=4 timeout 900 python tools/prof_frame.py rasterparts 2>&1 \
  | grep -vE "WARNING|INFO" | tee -a /tmp/metal4/sweep.txt | tail -5
echo "-- span=1 shadow --" | tee -a /tmp/metal4/sweep.txt
PROF_SPAN=1 timeout 900 python tools/prof_frame.py shadowparts 2>&1 \
  | grep -vE "WARNING|INFO" | tee -a /tmp/metal4/sweep.txt | tail -6

echo "== trilinear resolve: packed vs two-gather ==" | tee -a /tmp/metal4/log
for cfg in "0 trilinear" "1 trilinear" "1 bilinear"; do
  set -- $cfg
  echo "-- packed_tri=$1 filter=$2 --" | tee -a /tmp/metal4/sweep.txt
  PROF_PACKED_TRI=$1 PROF_FILTER=$2 timeout 900 \
    python tools/prof_frame.py resolve 2>&1 \
    | grep -vE "WARNING|INFO" | tee -a /tmp/metal4/sweep.txt | tail -3
done

echo "== soa vertex: full-frame check ==" | tee -a /tmp/metal4/log
timeout 1500 python tools/prof_frame.py soaframe 2>&1 \
  | grep -vE "WARNING|INFO" | tee -a /tmp/metal4/sweep.txt | tail -2

echo "== done part 1 ==" | tee -a /tmp/metal4/log
