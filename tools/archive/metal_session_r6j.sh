#!/bin/bash
# Round-6 session J: shadow-big-tile validation + pica attribution + bench.
set -u
mkdir -p /tmp/metal6
cd /root/repo
echo "== J probe $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a /tmp/metal6/log || exit 1
echo "== J1 frame (shadow big tiles) ==" | tee -a /tmp/metal6/log
PROF_ITERS=6 timeout 2400 python tools/prof_frame.py frame traceattr 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/frameJ1.txt | tail -44
echo "== J2 pica attribution ==" | tee -a /tmp/metal6/log
timeout 2400 python tools/prof_pica.py 2>&1 \
  | grep -vE "WARNING|INFO" | tee /tmp/metal6/pica.txt | tail -40
echo "== J bench ==" | tee -a /tmp/metal6/log
timeout 7200 python bench.py > /tmp/metal6/bench_full6.log 2>&1
tail -2 /tmp/metal6/bench_full6.log | tee /tmp/metal6/benchJ.json
echo "== J done at $(date -u +%H:%M:%S) ==" | tee -a /tmp/metal6/log
