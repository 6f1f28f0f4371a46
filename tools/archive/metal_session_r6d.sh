#!/bin/bash
# Round-6 session D:
#   1. FULL frame at the NEW defaults (align_scatter + compact scatter) --
#      validates the prof_fuse flips in-frame, procedural tier
#   2. FULL frame with the sponza-DDS tier -- bisects the bench's +44 ms
#   3. traceattr at new defaults (Untile/LevelMerge now attributed)
#   4. aniso visual delta (pica + Compare scenes)
set -u
mkdir -p /tmp/metal6
cd /root/repo

echo "== D probe $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal6/log || exit 1

echo "== D frame (new defaults, procedural) ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 timeout 2400 python tools/prof_frame.py frame traceattr 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameD.txt | tail -32

echo "== D frame (sponza tier) ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 PROF_TEX_SOURCE=sponza timeout 2400 python tools/prof_frame.py frame traceattr 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameD_sponza.txt | tail -32

echo "== D aniso delta ==" | tee -a /tmp/metal6/log
timeout 2400 python tools/aniso_delta.py 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/aniso.txt | tail -6

echo "== D done at $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
